package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.Triangles

/** Ground truth for the incremental triangle-refresh path (q178) and
  * its folded-fingerprint state: the persisted fold equals re-hashing
  * the merged graph from scratch, and every product the refresh writes
  * equals the from-scratch rebuild of the same merged graph — so the
  * delta-cost path can serve in place of the rebuild with no semantic
  * drift.
  */
class TriangleRefreshSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  test("mergedPairs == every mined pair with both endpoints in the merged corpus") {
    // The identity the q178 oracle's WHERE clause stands on: even ∪
    // delta covers exactly the membership-restricted pair set (even-even
    // via the stored graph, anything touching an arrival via the delta).
    val member = (c: org.apache.spark.sql.Column) => (c % 2 === 0) || (c % 50 === 1)
    val want = canon(DupGraphPhases.pairs(spark, dir)
      .filter(member(org.apache.spark.sql.functions.col("doc_a")) &&
        member(org.apache.spark.sql.functions.col("doc_b")))
      .select("doc_a", "doc_b"))
    val got = canon(TwinFoldPhases.mergedPairs(spark, dir))
    assert(got.nonEmpty && got == want)
  }

  test("folded fingerprint table == from-scratch fingerprints of the merged graph") {
    TwinFoldPhases.ensureFolded(spark, dir)
    val got = canon(spark.table(TwinFoldPhases.foldedTable(dir)))
    val want = canon(Triangles.adjacencyFingerprints(
      TwinFoldPhases.mergedPairs(spark, dir), "doc_a", "doc_b"))
    assert(got.nonEmpty && got == want)
  }

  test("bounded fold == from-scratch fingerprints of the bounded merged graph") {
    // The q173_bounded_fold / q173_bounded_rebuild bench pair computes
    // the SAME fingerprint table — pin it so the bench comparison is a
    // comparison of equals.
    val got = canon(TwinFoldPhases.boundedFold(spark, dir))
    val want = canon(TwinFoldPhases.boundedRebuild(spark, dir))
    assert(got.nonEmpty && got == want)
  }

  test("scaled fold == from-scratch fingerprints of the scaled merged graph") {
    // The q173_scaled4_* crossover pair must also compare equals: the
    // fold over the 4x id-shifted stored graph produces exactly the
    // rebuild's fingerprint table.
    val got = canon(TwinFoldPhases.scaledFold(spark, dir))
    val want = canon(TwinFoldPhases.scaledRebuild(spark, dir))
    assert(got.nonEmpty && got == want)
    // The id-shift keeps copies disjoint: every copy contributes the
    // single-copy vertex count.
    val base = TwinFoldPhases.evenPairs(spark, dir)
    val baseV = base.select("doc_a").union(base.select("doc_b")).distinct().count()
    val scaledV = spark.table(TwinFoldPhases.scaledEvenTable(dir))
      .select("doc_a").union(
        spark.table(TwinFoldPhases.scaledEvenTable(dir)).select("doc_b"))
      .distinct().count()
    assert(scaledV == TwinFoldPhases.ScaleCopies * baseV)
  }

  test("peeled canonicals (decomposition shortcut) == general peel path") {
    // r16's buildPeeled derives the q176 table straight from the
    // persisted base decomposition (single cut == fixed point at
    // minSupport = 1, the TrianglesSpec theorem); this pins it against
    // the pre-r16 ground truth — run the general peel loop, then
    // collapse the returned fixed graph from scratch.
    TrianglePhases.ensurePeeled(spark, dir)
    val got = canon(spark.table(TrianglePhases.peeledTable(dir)))
    val e = DupGraphPhases.pairs(spark, dir).select("doc_a", "doc_b")
    val (fixed, fixedVcls) = Triangles.trussPeelCollapsedWithDecomp(
      e, "doc_a", "doc_b", minSupport = 1L,
      maxIters = TrianglePhases.PeelMaxIters)
    val want = canon(Triangles.trussCanonicalsCollapsed(
      fixed, "doc_a", "doc_b", minSupport = 1L, vclsOpt = fixedVcls))
    graft.operators.Checkpoints.release(fixed)
    fixedVcls.foreach(graft.operators.Checkpoints.release)
    assert(got.nonEmpty && got == want)
  }

  test("scaled refresh products == scaled rebuild products (counts, truss, stats)") {
    // The q178_scaled16_refresh / q178_scaled16_rebuild bench pair must
    // compare equals, like its fixture-scale sibling below.
    TrianglePhases.ensureScaledRefreshed(spark, dir)
    TrianglePhases.scaledRebuildMerged(spark, dir)
    val tag = Q.scratchTag(dir)
    val pairs = Seq(
      TrianglePhases.scRefCntTable(dir) -> s"graft_tricntsx_$tag",
      TrianglePhases.scRefTrussTable(dir) -> s"graft_trusssx_$tag",
      TrianglePhases.scRefStatsTable(dir) -> s"graft_twinstsx_$tag")
    pairs.foreach { case (ref, rebuilt) =>
      val got = canon(spark.table(ref))
      val want = canon(spark.table(rebuilt))
      assert(got.nonEmpty && got == want, s"$ref diverges from $rebuilt")
    }
  }

  test("refresh products == rebuildMerged products (counts, truss, stats)") {
    TrianglePhases.ensureRefreshed(spark, dir)
    TrianglePhases.rebuildMerged(spark, dir)
    val tag = Q.scratchTag(dir)
    val pairs = Seq(
      TrianglePhases.refCntTable(dir) -> s"graft_tricntx_$tag",
      TrianglePhases.refTrussTable(dir) -> s"graft_trussx_$tag",
      TrianglePhases.refStatsTable(dir) -> s"graft_twinstx_$tag")
    pairs.foreach { case (ref, rebuilt) =>
      val got = canon(spark.table(ref))
      val want = canon(spark.table(rebuilt))
      assert(got.nonEmpty && got == want, s"$ref diverges from $rebuilt")
    }
  }
}
