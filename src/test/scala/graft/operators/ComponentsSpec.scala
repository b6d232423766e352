package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Connected components + canonical-representative dedup. */
class ComponentsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("min-label propagation finds components across chained pairs") {
    // chain 1-2-3-4 (transitive near-dups), pair 10-11, triangle 20-21-22
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)
    ).toDF("doc_a", "doc_b")
    val comps = Components.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("keepCanonical drops all but the min-id doc per cluster; singletons survive") {
    val docs = (1L to 12L).map(i => (i, s"text$i")).toDF("doc_id", "text")
    val pairs = Seq((2L, 5L), (5L, 9L), (3L, 4L)).toDF("doc_a", "doc_b")
    val kept = Components.keepCanonical(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().sorted
    // clusters {2,5,9} -> keep 2; {3,4} -> keep 3; others untouched
    assert(kept.sameElements(Array(1L, 2L, 3L, 6L, 7L, 8L, 10L, 11L, 12L)))
  }

  test("deep chain converges within the iteration bound") {
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val comps = Components.connectedComponents(chain, maxIter = 20).collect()
    assert(comps.forall(_.getLong(1) == 0L)) // all flood to min label 0
  }

  test("shuffle path (broadcastNodeLimit = 0) agrees with the broadcast path") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L), (7L, 8L)
    ).toDF("doc_a", "doc_b")
    val viaBroadcast = Components.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaShuffle = Components.connectedComponents(pairs, broadcastNodeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaShuffle == viaBroadcast)
    assert(viaShuffle(4L) == 1L && viaShuffle(8L) == 7L)
  }
}
