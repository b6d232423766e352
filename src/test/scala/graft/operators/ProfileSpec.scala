package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Per-column table profiling: exact ground truth on a frame with known
  * nulls/duplicates, schema-dynamism (the operator follows the frame it
  * is handed), the approx face's rsd-bounded ndv, and the one-scan plan
  * shape the scaladoc promises.
  */
class ProfileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("exact profile matches hand-computed stats on a frame with nulls and duplicates") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (1L, "a"), (2L, null), (null, "b"), (3L, "b"))
      .toDF("k", "s")
    val p = Profile.tableProfile(df)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(p("k") == ((5L, 1L, 3L))) // 5 rows, one null, ndv {1,2,3}
    assert(p("s") == ((5L, 1L, 2L))) // 5 rows, one null, ndv {a,b}
  }

  test("the operator follows the handed frame's schema") {
    import spark.implicits._
    val df = Seq((1, "x")).toDF("a", "b").withColumn("c", lit(null).cast("int"))
    val cols = Profile.tableProfile(df).select("column")
      .collect().map(_.getString(0)).toSeq
    assert(cols == Seq("a", "b", "c"))
  }

  test("approx ndv lands within the configured rsd of exact, per column") {
    val li = Tables.lineitem(spark, SparkTestSession.sf0001)
    val exact = Profile.tableProfile(li)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = Profile.tableProfileApprox(li, rsd = 0.05)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (c, ndv) =>
      // 5 sigma of headroom on the 5% rsd — deterministic for a fixed
      // fixture, far outside plausible HLL error
      assert(math.abs(approx(c) - ndv) <= math.max(2L, (ndv * 0.25).toLong),
        s"$c: approx ${approx(c)} vs exact $ndv")
    }
  }

  test("equi-width histogram: hand-computed buckets, top clamp, null exclusion") {
    import spark.implicits._
    // range [0, 8], 4 buckets of width 2: [0,2) [2,4) [4,6) [6,8]
    val df = Seq[java.lang.Double](0.0, 1.0, 2.0, 3.0, 3.5, 6.0, 8.0, 8.0, null)
      .toDF("v")
    val h = Profile.equiWidthHistogram(df, "v", 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(h(0L) == ((0.0, 2.0, 2L)))
    assert(h(1L) == ((2.0, 4.0, 3L)))
    assert(h.get(2L).isEmpty) // empty buckets are absent rows
    assert(h(3L) == ((6.0, 8.0, 3L))) // max values clamp into the top bucket
  }

  test("degenerate single-value column lands wholly in bucket 0") {
    import spark.implicits._
    val df = Seq(5.0, 5.0, 5.0).toDF("v")
    val rows = Profile.equiWidthHistogram(df, "v", 4).collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 0L &&
      rows(0).getLong(3) == 3L)
  }

  test("range selectivity: exact on bucket boundaries, interpolated inside") {
    import spark.implicits._
    // 8 values uniform over [0,8): buckets [0,2)[2,4)[4,6)[6,8] hold 2 each
    val df = Seq(0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 8.0).toDF("v")
    val hist = Profile.equiWidthHistogram(df, "v", 4)
    val p = Profile.rangeSelectivity(hist, Seq(4.0, 5.0, 9.0))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(p(4.0) == 4.0) // boundary cutoff: the two upper buckets whole
    assert(p(5.0) == 3.0) // half of [4,6)'s 2 rows + all of [6,8]'s 2
    assert(p(9.0) == 0.0) // past the top
  }

  test("equi-depth histogram: equal cells under skew where equi-width piles up") {
    import spark.implicits._
    // heavy skew: 12 ones, then 2, 3, 4 — 4 buckets of depth 4
    val df = (Seq.fill(12)(1.0) ++ Seq(2.0, 3.0, 4.0)).zipWithIndex
      .map { case (v, i) => (v, v.toLong * 1000 + i) }.toDF("v", "okey")
    val d = Profile.equiDepthHistogram(df, "v", "okey", 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(d(0L) == ((1.0, 1.0, 4L)) && d(1L) == ((1.0, 1.0, 4L)))
    assert(d(2L) == ((1.0, 1.0, 4L)))
    assert(d(3L) == ((2.0, 4.0, 3L))) // the tail cell holds the remainder
    // equi-width over the same rows: 12/15 of the mass in one cell
    val w = Profile.equiWidthHistogram(df, "v", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(w(0L) == 12L)
  }

  test("mcv list: exact top-k by count with the deterministic (count desc, value asc) tie-break") {
    import spark.implicits._
    // counts: 9 x3, 5 x2, 7 x2, 2 x1, 4 x1 — the k=3 cut falls inside
    // the count-2 tie; value asc must pick 5 over 7
    val df = (Seq.fill(3)(9L) ++ Seq.fill(2)(5L) ++ Seq.fill(2)(7L) ++
      Seq(2L, 4L)).toDF("x")
    val m = Profile.mcvList(df, "x", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(m == Seq((9L, 3L), (5L, 2L), (7L, 2L)))
  }

  test("sampled histogram: full-bounds bucketing, scale-up arithmetic, zero-sample cells coalesce") {
    import spark.implicits._
    val df = (1 to 8).map(_.toDouble).toDF("v")
    val r = Profile.sampledHistogram(df, "v", 4, col("v") === 2.0, rate = 8L)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r == Map(0L -> ((2L, 8L)), 1L -> ((2L, 0L)),
      2L -> ((2L, 0L)), 3L -> ((2L, 0L))))
  }

  test("incremental profile fold equals the from-scratch profile stat for stat") {
    val docs = Tables.documents(spark, SparkTestSession.sf0001)
    val cols = Seq("doc_id", "lang", "source", "n_chars")
    val folded = Profile.foldProfiles(
      Seq(docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1))
        .map(Profile.countStats(_, cols)),
      Seq(docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1))
        .map(Profile.profileSketch(_, cols, p = 6)),
      p = 6)
    val scratch = Profile.foldProfiles(
      Seq(Profile.countStats(docs, cols)),
      Seq(Profile.profileSketch(docs, cols, p = 6)), p = 6)
    val f = folded.collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val s = scratch.collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(f == s)
  }

  test("exact face: no Expand, column-pruned ndv branches; approx face: one scan, no Expand") {
    // r22 plan contract: the exact face's ndv branches each scan ONLY
    // their own column (columnar pruning — the union's total bytes are
    // the one-scan bytes) and the multi-distinct Expand (every row
    // replicated once per profiled column through a wide partial-agg
    // key, measured 3.3x slower on the bench table) is gone.
    val li = Tables.lineitem(spark, SparkTestSession.sf0001)
    val exactPlan = Profile.tableProfile(li)
      .queryExecution.executedPlan.toString
    assert(!exactPlan.contains("Expand"), exactPlan.take(800))
    // one counts scan + one pruned scan per column
    assert("Scan parquet".r.findAllIn(exactPlan).size == li.columns.length + 1,
      exactPlan.take(800))
    // every ndv branch's scan reads a single column: no multi-column
    // ReadSchema appears outside the counts pass (which needs them all)
    // (>= length - 1: plan toString may truncate one long schema string)
    val readSchemas = "ReadSchema: struct<[^>]*>".r.findAllIn(exactPlan).toSeq
    assert(readSchemas.count(_.count(_ == ',') == 0) >= li.columns.length - 1,
      readSchemas.mkString("\n"))
    val approxPlan = Profile.tableProfileApprox(li)
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(approxPlan).size == 1, approxPlan.take(800))
    assert(!approxPlan.contains("Expand"), approxPlan.take(800))
  }
}
