package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The HDR-histogram contract (the QuantileSpec the operator scaladoc
  * promises): cells match a scalar bit model, histograms merge by count
  * addition, quantile estimates respect the relative-error bound against
  * exact order statistics on randomized data, and the non-negative
  * contract fails fast.
  */
class HdrSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val subBits = 4

  private def scalarCell(v: Long): (Int, Long) = {
    require(v >= 0)
    val e = if (v == 0) -1 else 63 - java.lang.Long.numberOfLeadingZeros(v)
    val sub = if (e <= subBits) v else v >> (e - subBits)
    (e, sub)
  }

  private def scalarLowerBound(e: Int, sub: Long): Long =
    if (e <= subBits) sub else sub << (e - subBits)

  private val values: Seq[Long] =
    Seq(0L, 1L, 2L, 15L, 16L, 17L, 31L, 32L, 100L, 1000L, 65535L, 65536L, 123456789L)

  test("cells equal the scalar bit model; exact below 2^(subBits+1), 1/16-wide above") {
    val got = HdrSketch.sketch(
        values.toDF("v").withColumn("g", org.apache.spark.sql.functions.lit("all")),
        "v", Seq("g"), subBits)
      .select("e", "sub", "cnt").as[(Int, Long, Long)].collect()
      .map { case (e, s, c) => (e, s) -> c }.toMap
    val want = values.map(scalarCell).groupBy(identity)
      .map { case (cell, xs) => cell -> xs.size.toLong }
    assert(got == want)
    // small values resolve exactly: the lower bound IS the value
    values.filter(v => v < (1L << (subBits + 1))).foreach { v =>
      val (e, s) = scalarCell(v)
      assert(scalarLowerBound(e, s) == v)
    }
  }

  test("merge is cell-wise count addition and equals the sketch of the concatenation") {
    val (a, b) = values.splitAt(6)
    def sk(vs: Seq[Long]) = HdrSketch.sketch(
      vs.toDF("v").withColumn("g", org.apache.spark.sql.functions.lit("all")),
      "v", Seq("g"), subBits)
    val merged = HdrSketch.merge(sk(a ++ b.take(2)), sk(b.drop(2) ++ a.take(3)), Seq("g"))
      .select("e", "sub", "cnt").as[(Int, Long, Long)].collect().toSet
    val whole = sk(a ++ b.take(2) ++ b.drop(2) ++ a.take(3))
      .select("e", "sub", "cnt").as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("REPLAY CAVEAT pinned: folding the same shard twice doubles every cell count") {
    // sum-merge is NOT idempotent (unlike HLL's max): a replayed batch
    // double-counts. This test pins the documented contract so the
    // caveat on HdrSketch.merge stays measured, not just stated.
    def sk(vs: Seq[Long]) = HdrSketch.sketch(
      vs.toDF("v").withColumn("g", org.apache.spark.sql.functions.lit("all")),
      "v", Seq("g"), subBits)
    val once = sk(values).select("e", "sub", "cnt").as[(Int, Long, Long)].collect().toSet
    val replayed = HdrSketch.merge(sk(values), sk(values), Seq("g"))
      .select("e", "sub", "cnt").as[(Int, Long, Long)].collect().toSet
    assert(replayed == once.map { case (e, s, c) => (e, s, 2 * c) })
    assert(replayed != once) // the inflation is real, not vacuous
  }

  test("randomized: estimates bracket exact order statistics within one bucket width") {
    val rnd = new scala.util.Random(42)
    // mixed regimes: small exact values, mid-range, heavy tail
    val data = Seq.fill(2000)(rnd.nextInt(30).toLong) ++
      Seq.fill(2000)((100 + rnd.nextInt(10000)).toLong) ++
      Seq.fill(500)((1000000 + rnd.nextInt(100000000)).toLong)
    val sk = HdrSketch.sketch(
      data.toDF("v").withColumn("g", org.apache.spark.sql.functions.lit("all")),
      "v", Seq("g"), subBits)
    val qs = Seq("p10" -> 0.10, "p50" -> 0.50, "p90" -> 0.90, "p99" -> 0.99)
    val est = HdrSketch.quantiles(sk, Seq("g"), qs, subBits)
      .select("pq", "est").as[(String, Long)].collect().toMap
    val sorted = data.sorted
    qs.foreach { case (name, q) =>
      val rank = math.ceil(q * data.size).toLong
      val exact = sorted((rank - 1).toInt)
      val lb = est(name)
      // est is the lower bound of the bucket holding the rank-th value
      assert(lb <= exact, s"$name: est $lb > exact $exact")
      assert(exact <= lb + (lb >> subBits) + 1,
        s"$name: exact $exact outside bucket of est $lb")
    }
  }

  test("per-group histograms are independent; zero values get their own exact cell") {
    val df = Seq(("a", 0L), ("a", 0L), ("a", 5L), ("b", 1L)).toDF("g", "v")
    val got = HdrSketch.sketch(df, "v", Seq("g"), subBits)
      .select("g", "e", "sub", "cnt").as[(String, Int, Long, Long)].collect().toSet
    assert(got == Set(("a", -1, 0L, 2L), ("a", 2, 5L, 1L), ("b", 0, 1L, 1L)))
  }

  test("negative values fail fast instead of poisoning the tail") {
    val ex = intercept[Exception] {
      HdrSketch.sketch(
        Seq(-1L).toDF("v").withColumn("g", org.apache.spark.sql.functions.lit("all")),
        "v", Seq("g"), subBits).collect()
    }
    val chain = Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(chain.contains("HDR_SKETCH_NEGATIVE_VALUE"), s"unexpected: $ex")
  }
}
