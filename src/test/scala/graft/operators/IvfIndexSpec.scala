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
}
