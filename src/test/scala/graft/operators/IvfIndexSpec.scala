package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Persisted IVF index: build-once/probe-many must be semantically
  * identical to the inline IVF, and the probe must exploit the bucketed
  * corpus layout instead of reshuffling it.
  */
class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("probe over the persisted index equals the inline IVF exactly") {
    val e = Tables.embeddings(spark, SparkTestSession.sf0001)
    IvfIndex.build(e, "vec_id", "embedding", nlist = 16, prefix = "graft_ivf_spec")
    val probed = IvfIndex.probe(
      spark, e.filter(col("vec_id") < 8), "vec_id", "embedding",
      k = 5, nprobe = 2, prefix = "graft_ivf_spec")
      .orderBy("q_id", "rank").collect()
    val inline = Similarity.cosineTopKIvf(
      e, e.filter(col("vec_id") < 8), "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 2)
      .orderBy("q_id", "rank").collect()
    assert(probed.length > 0 && probed.sameElements(inline))
  }

  test("the probe joins the bucketed corpus layout without exchanging it") {
    val e = Tables.embeddings(spark, SparkTestSession.sf0001)
    IvfIndex.build(e, "vec_id", "embedding", nlist = 16, prefix = "graft_ivf_spec2")
    val plan = IvfIndex.probe(
      spark, e.filter(col("vec_id") < 8), "vec_id", "embedding",
      k = 5, nprobe = 2, prefix = "graft_ivf_spec2")
      .queryExecution.executedPlan.toString
    // The corpus side scans the bucketed table; its bucket layout feeds the
    // join directly (bucketed scan markers present in the scan node).
    assert(plan.contains("Bucketed: true"), plan.linesIterator.take(50).mkString("\n"))
  }

  test("delta segment: probe(base ∪ delta) equals a merged-corpus rebuild with the same centroids") {
    val e = Tables.embeddings(spark, SparkTestSession.sf0001)
    val base = e.filter(col("vec_id") % 5 =!= 4)
    val arrivals = e.filter(col("vec_id") % 5 === 4)
    val q = e.filter(col("vec_id") < 8)
    // segment path: base index built once, arrivals folded against the
    // FROZEN base centroids at delta cost
    IvfIndex.build(base, "vec_id", "embedding", nlist = 16, prefix = "graft_ivf_seg_spec")
    IvfIndex.appendDelta(arrivals, "vec_id", "embedding", prefix = "graft_ivf_seg_spec")
    val seg = IvfIndex.probeSegments(
      spark, q, "vec_id", "embedding", k = 5, nprobe = 2, prefix = "graft_ivf_seg_spec")
      .orderBy("q_id", "rank").collect()
    // comparator: from-scratch rebuild over the merged corpus, SAME
    // centroids (the base slice's first-16 quantizer)
    val baseCents = Similarity.centroids(base, "vec_id", "embedding", nlist = 16)
    val rebuilt = Similarity.cosineTopKIvf(
      e, q, "vec_id", "embedding", k = 5, nlist = 16, nprobe = 2,
      centroidsOpt = Some(baseCents))
      .orderBy("q_id", "rank").collect()
    assert(seg.length > 0 && seg.sameElements(rebuilt))
    // the delta segment holds exactly the arrival batch — the fold paid
    // delta cost, not a corpus rebuild
    assert(spark.table(IvfIndex.deltaTable("graft_ivf_seg_spec")).count() == arrivals.count())
    assert(spark.table(IvfIndex.corpusTable("graft_ivf_seg_spec")).count() == base.count())
  }

  test("compact folds the delta into the base and changes nothing a probe can see") {
    val e = Tables.embeddings(spark, SparkTestSession.sf0001)
    val base = e.filter(col("vec_id") % 5 =!= 4)
    val arrivals = e.filter(col("vec_id") % 5 === 4)
    val q = e.filter(col("vec_id") < 8)
    val p = "graft_ivf_cmp_spec"
    IvfIndex.build(base, "vec_id", "embedding", nlist = 16, prefix = p)
    IvfIndex.appendDelta(arrivals, "vec_id", "embedding", prefix = p)
    val before = IvfIndex.probeSegments(
      spark, q, "vec_id", "embedding", k = 5, nprobe = 2, prefix = p)
      .orderBy("q_id", "rank").collect()
    val centsBefore = spark.table(IvfIndex.centroidTable(p))
      .orderBy("cell").collect()
    IvfIndex.compact(spark, prefix = p)
    // the live base is now the merged corpus; the delta reset to empty
    assert(spark.table(IvfIndex.corpusTable(p)).count() ==
      base.count() + arrivals.count())
    assert(spark.table(IvfIndex.deltaTable(p)).count() == 0)
    // centroids untouched — compaction is a layout rewrite, not a re-train
    assert(spark.table(IvfIndex.centroidTable(p)).orderBy("cell").collect()
      .sameElements(centsBefore))
    // single-segment probe == pre-compaction base ∪ delta probe, row for row
    val after = IvfIndex.probe(
      spark, q, "vec_id", "embedding", k = 5, nprobe = 2, prefix = p)
      .orderBy("q_id", "rank").collect()
    assert(after.length > 0 && after.sameElements(before))
    // probeSegments still works over the reset (empty) delta — the
    // lifecycle continues with the next appendDeltaBatch
    val afterSeg = IvfIndex.probeSegments(
      spark, q, "vec_id", "embedding", k = 5, nprobe = 2, prefix = p)
      .orderBy("q_id", "rank").collect()
    assert(afterSeg.sameElements(before))
    // and the compacted base kept its bucketed layout (the probe's
    // zero-exchange premise)
    val plan = IvfIndex.probe(
      spark, q, "vec_id", "embedding", k = 5, nprobe = 2, prefix = p)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), plan.linesIterator.take(50).mkString("\n"))
  }
}
