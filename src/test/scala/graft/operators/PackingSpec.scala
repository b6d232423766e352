package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class PackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("contiguous pack matches the scalar running-start model; offsets stay in-bin") {
    val rnd = new scala.util.Random(11)
    val rows = for (g <- Seq("a", "b"); i <- 0 until 200)
      yield (g.hashCode.toLong * 1000 + i, g, 1L + rnd.nextInt(120))
    val got = Packing.contiguousPack(
        rows.toDF("id", "grp", "toks"), "grp", "id", "toks", capacity = 64L)
      .select("id", "grp", "seq_tokens", "bin_id", "bin_offset")
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // scalar model: per group in id order, start = running total before row
    rows.groupBy(_._2).foreach { case (_, grp) =>
      var start = 0L
      grp.sortBy(_._1).foreach { case (id, _, toks) =>
        val (t, bin, off) = got(id)
        assert(t == toks)
        assert(bin == start / 64 && off == start % 64, s"id=$id start=$start")
        assert(off >= 0 && off < 64)
        start += toks
      }
    }
  }
}
