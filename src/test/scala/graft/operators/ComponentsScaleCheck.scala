package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** The shuffle (large-graph) path must agree with the broadcast path on a
  * REAL LSH pair graph, not just hand-built toys — this is the 100 TB
  * code path, runnable locally by forcing broadcastNodeLimit = 0.
  */
class ComponentsScaleCheck extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("shuffle path == broadcast path on the sf0.001 LSH candidate graph") {
    val docs = Tables.documents(spark, SparkTestSession.sf0001)
    val sig = Dedup.minhashSignatures(docs, "text", "doc_id", 16)
    val pairs = Dedup.lshCandidatePairs(sig, "doc_id", 16, bands = 2)
    // driverEdgeLimit = 0: this check exists to exercise the DISTRIBUTED
    // paths against each other on a real LSH graph.
    def run(limit: Long) =
      Components.connectedComponents(
          pairs, broadcastNodeLimit = limit, driverEdgeLimit = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaBroadcast = run(Long.MaxValue)
    val viaShuffle = run(0L)
    assert(viaBroadcast.nonEmpty)
    assert(viaShuffle == viaBroadcast)
  }
}
