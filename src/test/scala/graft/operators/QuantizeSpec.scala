package graft.operators

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Ground truth for [[Quantize.int8]]: codes bounded to int8 range, the
  * scale is the exact max |floor(v*2^30)|, the reconstruction residue is
  * below scale, degenerate vectors are handled, and the pass is narrow
  * (zero exchange).
  */
class QuantizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(0.5f, -0.25f, 0.125f, 0.0f)),
    (2L, Array(-1.0f, 1.0f, 0.0003f, -0.0003f)),
    (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)),     // all-zero: scale 0, codes 0
    (4L, Array(0.7071f)),
    (5L, Array.empty[Float])                 // empty: scale 0, no codes
  )

  private def scalarModel(v: Array[Float]): (Long, Seq[Long], Long) = {
    val iv = v.map(x => math.floor(x.toDouble * 1073741824.0).toLong)
    val s = if (iv.isEmpty) 0L else iv.map(math.abs).max
    val q = iv.map { x =>
      if (s == 0L) 0L
      else if (x >= 0L) x * 127 / s
      else -((-x * 127) / s)
    }
    val err = if (iv.isEmpty) 0L
      else iv.zip(q).map { case (x, c) => math.abs(x * 127 - c * s) }.max
    (s, q.toSeq, err)
  }

  test("int8 equals the scalar integer model on hand vectors") {
    val got = Quantize.int8(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding")
      .as[(Long, Long, Seq[Long], Long)].collect().sortBy(_._1).toSeq
    val want = vecs.sortBy(_._1).map { case (id, v) =>
      val (s, q, e) = scalarModel(v)
      (id, s, q, e)
    }
    assert(got == want)
  }

  test("randomized: codes in [-127,127], residue < scale, max|code| = 127") {
    val rnd = new scala.util.Random(19)
    val data = (1L to 200L).map(i =>
      (i, Array.fill(16)((rnd.nextFloat() - 0.5f) * 2f)))
    val got = Quantize.int8(data.toDF("vec_id", "embedding"), "vec_id", "embedding")
      .as[(Long, Long, Seq[Long], Long)].collect()
    assert(got.length == 200)
    got.foreach { case (id, s, q, e) =>
      assert(q.forall(c => c >= -127L && c <= 127L), s"vec $id codes out of range: $q")
      assert(s > 0L, s"vec $id degenerate scale")
      assert(e < s, s"vec $id residue $e not below scale $s")
      // the max-|element| position always quantizes to exactly +-127
      assert(q.map(math.abs).max == 127L, s"vec $id never saturates: $q")
      val (ws, wq, we) = scalarModel(data((id - 1).toInt)._2)
      assert((s, q, e) == ((ws, wq, we)), s"vec $id diverges from model")
    }
  }

  test("cosineTopKInt8 equals a scalar integer-code model") {
    val rnd = new scala.util.Random(7)
    val data = (1L to 40L).map(i => (i, Array.fill(8)((rnd.nextFloat() - 0.5f) * 2f)))
    val df = data.toDF("vec_id", "embedding")
    val got = Quantize.cosineTopKInt8(df, df.filter(col("vec_id") < 4), "vec_id", "embedding", 4)
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
    val codes = data.map { case (id, v) => id -> scalarModel(v)._2 }.toMap
    def dot(a: Seq[Long], b: Seq[Long]): Long = a.zip(b).map { case (x, y) => x * y }.sum
    val want = (1L to 3L).flatMap { qid =>
      val scored = data.map(_._1).filter(_ != qid).map { cid =>
        val s = dot(codes(cid), codes(qid)).toDouble /
          (math.sqrt(dot(codes(cid), codes(cid)).toDouble) *
            math.sqrt(dot(codes(qid), codes(qid)).toDouble))
        (cid, s)
      }
      scored.sortBy { case (id, s) => (-s, id) }.take(4).zipWithIndex
        .map { case ((id, s), i) => (qid, id, s, i + 1L) }
    }.sortBy(r => (r._1, r._4))
    assert(got == want)
  }

  test("plan: zero exchange — quantization is a pure narrow map") {
    val p = Quantize.int8(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding")
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("Exchange"), p)
  }

  test("topKRecall: exact vs itself is 1.0; a half-overlapping approx scores 0.5") {
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L))
      .toDF("q_id", "neighbor_id")
    val self = Similarity.topKRecall(exact, exact)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(self == Seq((1L, 2L, 2L, 1.0), (2L, 2L, 2L, 1.0)))
    val approx = Seq((1L, 11L), (1L, 99L), (2L, 12L), (2L, 98L))
      .toDF("q_id", "neighbor_id")
    val half = Similarity.topKRecall(exact, approx)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(half == Seq((1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5)))
  }

  test("topKRecall: LSH recall on the fixture corpus is in (0,1] and counts add up") {
    val e = (1L to 120L).map { i =>
      val rnd = new scala.util.Random(i)
      (i, Array.fill(8)((rnd.nextFloat() - 0.5f) * 2f))
    }.toDF("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 4)
    val r = Similarity.topKRecall(
        Similarity.cosineTopK(e, q, "vec_id", "embedding", 5),
        Similarity.cosineTopKLsh(e, q, "vec_id", "embedding", 5, numPlanes = 4, dim = 8))
      .as[(Long, Long, Long, Double)].collect()
    assert(r.length == 3)
    r.foreach { case (_, nExact, nHit, recall) =>
      assert(nExact == 5L)
      assert(nHit >= 0L && nHit <= nExact)
      assert(recall == nHit.toDouble / nExact)
    }
  }

  test("nnReciprocalRank: found-at-rank, missed, and self cases") {
    // exact carries rank (cosineTopK's shape); q1's NN sits at rank 3
    // in the approx list, q2's NN is absent, q3's approx == exact
    val exact = Seq((1L, 10L, 1), (2L, 20L, 1), (3L, 30L, 1))
      .toDF("q_id", "neighbor_id", "rank")
    val approx = Seq(
      (1L, 99L, 1), (1L, 98L, 2), (1L, 10L, 3),
      (2L, 97L, 1), (2L, 96L, 2),
      (3L, 30L, 1))
      .toDF("q_id", "neighbor_id", "rank")
    val got = Similarity.nnReciprocalRank(exact, approx)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 10L, 3L, 1.0 / 3.0), (2L, 20L, 0L, 0.0), (3L, 30L, 1L, 1.0)))
  }

  test("nnReciprocalRank: every exact query gets a verdict on the LSH fixture; rr consistent with rank") {
    val e = (1L to 120L).map { i =>
      val rnd = new scala.util.Random(i)
      (i, Array.fill(8)((rnd.nextFloat() - 0.5f) * 2f))
    }.toDF("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 4)
    val r = Similarity.nnReciprocalRank(
        Similarity.cosineTopK(e, q, "vec_id", "embedding", 1),
        Similarity.cosineTopKLsh(e, q, "vec_id", "embedding", 5, numPlanes = 4, dim = 8))
      .as[(Long, Long, Long, Double)].collect()
    assert(r.length == 3)
    r.foreach { case (_, _, rank, rr) =>
      assert(rank >= 0L && rank <= 5L)
      assert(if (rank == 0L) rr == 0.0 else rr == 1.0 / rank)
    }
  }
}
