package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Trained-quantizer IVF properties. Correctness of the plumbing is pinned
  * by q85's exact oracle (exhaustive probe == brute force); this spec pins
  * what the oracle can't: seed-determinism of training and that the
  * learned cells actually buy recall at nprobe < nlist.
  */
class IvfKmeansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val emb =
    graft.Tables.embeddings(spark, SparkTestSession.sf0001)

  test("trained centroids are deterministic under a fixed seed") {
    def centers() =
      Similarity.trainedCentroids(emb, "vec_id", "embedding", nlist = 8, seed = 42L)
        .orderBy("cell").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toVector))
    assert(centers().toSeq == centers().toSeq)
  }

  test("exhaustive probe over trained cells equals brute force exactly") {
    val cents = Similarity.trainedCentroids(emb, "vec_id", "embedding", nlist = 8, seed = 42L)
    val queries = emb.filter(col("vec_id") < 8)
    def resultSet(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val ivf = Similarity.cosineTopKIvf(emb, queries, "vec_id", "embedding",
      k = 5, nlist = 8, nprobe = 8, centroidsOpt = Some(cents))
    val brute = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", k = 5)
    assert(resultSet(ivf) == resultSet(brute))
  }

  test("trained cells give useful recall at nprobe < nlist (the approximate path)") {
    val cents = Similarity.trainedCentroids(emb, "vec_id", "embedding", nlist = 8, seed = 42L)
    val queries = emb.filter(col("vec_id") < 8)
    def neighbors(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = neighbors(
      Similarity.cosineTopK(emb, queries, "vec_id", "embedding", k = 5))
    val approx = neighbors(
      Similarity.cosineTopKIvf(emb, queries, "vec_id", "embedding",
        k = 5, nlist = 8, nprobe = 4, centroidsOpt = Some(cents)))
    val recall = (brute & approx).size.toDouble / brute.size
    assert(recall >= 0.5, f"recall $recall%.2f at nprobe=4/nlist=8 too low")
  }

  test("persisted IVF index accepts trained centroids end-to-end") {
    val cents = Similarity.trainedCentroids(emb, "vec_id", "embedding", nlist = 8, seed = 42L)
    val prefix = "graft_ivf_km_test"
    IvfIndex.build(emb, "vec_id", "embedding", nlist = 8, buckets = 4,
      prefix = prefix, centroidsOpt = Some(cents))
    val got = IvfIndex.probe(spark, emb.filter(col("vec_id") < 8),
      "vec_id", "embedding", k = 5, nprobe = 8, prefix = prefix)
      .select("q_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = Similarity.cosineTopK(emb, emb.filter(col("vec_id") < 8),
      "vec_id", "embedding", k = 5)
      .select("q_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute)
  }
}
