package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The count-min contract: the matrix matches a scalar md5 model
  * bit-for-bit, estimates never under-count, error is bounded by the
  * colliding mass, and sketches merge by cell-wise addition.
  */
class CountMinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val depth = 4
  private val width = 64

  private def scalarCell(r: Int, item: String): Long =
    (graft.functions.PortableHash32.hash32(
      (s"cm$r:" + item).getBytes("UTF-8")) % width + width) % width

  // planted heavy hitter + light tail
  private val stream: Seq[String] =
    Seq.fill(500)("hot") ++ (1 to 20).flatMap(i => Seq.fill(i % 10 + 1)(s"tok$i"))

  private def exact: Map[String, Long] =
    stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("sketch matrix equals the scalar model") {
    val got = CountMin.sketch(stream.toDF("item"), "item", depth, width)
      .as[(Int, Long, Long)].collect().map { case (r, c, n) => (r, c) -> n }.toMap
    val want = stream
      .flatMap(it => (0 until depth).map(r => (r, scalarCell(r, it))))
      .groupBy(identity).map { case (cell, xs) => cell -> xs.size.toLong }
    assert(got == want)
  }

  test("estimate never under-counts; heavy-hitter error bounded by colliding mass") {
    val sk = CountMin.sketch(stream.toDF("item"), "item", depth, width)
    val est = CountMin.estimate(
        sk, exact.keys.toSeq.toDF("item"), "item", depth, width)
      .as[(String, Long)].collect().toMap
    exact.foreach { case (item, n) =>
      assert(est(item) >= n, s"$item under-counted: ${est(item)} < $n")
    }
    val tailMass = stream.length - exact("hot")
    assert(est("hot") <= exact("hot") + tailMass)
    // an item never streamed estimates from its own (possibly colliding)
    // cells — still an upper bound of its true count 0, and bounded
    assert(est.get("never-seen").isEmpty)
    val unseen = CountMin.estimate(
        sk, Seq("never-seen-token-xyz").toDF("item"), "item", depth, width)
      .as[(String, Long)].collect().head._2
    assert(unseen >= 0 && unseen <= stream.length.toLong)
  }

  test("sketches merge by cell-wise addition") {
    val (a, b) = stream.splitAt(stream.length / 2)
    def cells(s: Seq[String]): Map[(Int, Long), Long] =
      CountMin.sketch(s.toDF("item"), "item", depth, width)
        .as[(Int, Long, Long)].collect().map { case (r, c, n) => (r, c) -> n }.toMap
    val merged = (cells(a).toSeq ++ cells(b).toSeq)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    assert(merged == cells(stream))
  }

  test("heavyHitters equals the direct group-count — the screen is lossless") {
    val df = stream.toDF("item")
    val direct = exact.filter(_._2 >= 5L)
    // normal shape: collisions may over-admit, the exact pass prunes
    val got = CountMin.heavyHitters(df, "item", depth, width, minCount = 5L)
      .as[(String, Long)].collect().toMap
    assert(got == direct)
    // degenerate width 1: EVERY row passes the screen (est = stream
    // size for all) and the result is still exact — the no-miss
    // theorem holds at maximal collision
    val crowded = CountMin.heavyHitters(df, "item", 2, 1, minCount = 5L)
      .as[(String, Long)].collect().toMap
    assert(crowded == direct)
    // a floor above the max count returns empty, not an error
    assert(CountMin.heavyHitters(df, "item", depth, width, 10000L).count() == 0L)
  }

  test("heavyHitters plan: the screen is a narrow filter — no join, exactly one exchange") {
    val p = CountMin.heavyHitters(stream.toDF("item"), "item", depth, width, 5L)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Join"), p.linesIterator.take(25).mkString("\n"))
    val exchanges = p.sliding("Exchange (".length).count(_ == "Exchange (")
    assert(exchanges == 1, p.linesIterator.take(25).mkString("\n"))
  }
}
