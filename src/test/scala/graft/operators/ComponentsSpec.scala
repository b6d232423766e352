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

  test("incremental equals full recompute: bridge-merge, attach, new-new, singletons") {
    // Existing corpus: clusters {1,2} and {3,4}, singleton 5, singleton 6.
    val oldPairs = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    // TOTAL base map (the incremental contract): singletons comp = id.
    val baseComp = Seq(
      (1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L), (5L, 5L), (6L, 6L)
    ).toDF("id", "comp")
    val newIds = Seq(10L, 11L, 12L, 13L, 14L).toDF("id")
    // 10 BRIDGES the two existing clusters (the hard case: a merge of
    // two old labels); 11 attaches to singleton 5; 13-14 form a purely
    // new cluster; 12 arrives with no pairs at all.
    val delta = Seq(
      (2L, 10L), (3L, 10L), (5L, 11L), (13L, 14L)
    ).toDF("doc_a", "doc_b")
    val got = Components.incremental(baseComp, newIds, delta)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Full recompute over the merged corpus, singletons coalesced.
    val full = Components
      .connectedComponents(oldPairs.unionByName(delta))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (Seq(1L, 2L, 3L, 4L, 5L, 6L) ++ Seq(10L, 11L, 12L, 13L, 14L))
      .map(i => i -> full.getOrElse(i, i)).toMap
    assert(got == want)
    // the merge actually happened: {1,2,3,4,10} all label 1
    assert(Seq(3L, 4L, 10L).forall(got(_) == 1L))
    assert(got(11L) == 5L && got(12L) == 12L && got(14L) == 13L)
  }

  test("incremental relabel keeps the base map exchange-free (broadcast joins only)") {
    val baseComp = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("id", "comp")
    val newIds = Seq(10L).toDF("id")
    val delta = Seq((2L, 10L)).toDF("doc_a", "doc_b")
    val out = Components.incremental(baseComp, newIds, delta)
    val plan = out.queryExecution.executedPlan.toString
    // every join in the delta-lift and relabel stages broadcasts the
    // delta-sized side; a SortMergeJoin would mean the corpus map shuffled
    assert(!plan.contains("SortMergeJoin"), s"base map shuffled:\n$plan")
  }

  test("shuffle path (broadcastNodeLimit = 0) agrees with the broadcast path") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L), (7L, 8L)
    ).toDF("doc_a", "doc_b")
    // driverEdgeLimit = 0 disables the r21 driver shortcut so this test
    // keeps exercising the two DISTRIBUTED strategies against each other.
    val viaBroadcast = Components.connectedComponents(pairs, driverEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaShuffle = Components.connectedComponents(
        pairs, broadcastNodeLimit = 0L, driverEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaShuffle == viaBroadcast)
    assert(viaShuffle(4L) == 1L && viaShuffle(8L) == 7L)
  }

  test("driver union-find shortcut == distributed loop, incl. self-loops and chains") {
    val rnd = new scala.util.Random(23)
    (0 until 6).foreach { trial =>
      val n = 10 + rnd.nextInt(25)
      val edges = (for {
        a <- 0L until n
        b <- a until n // a == b allowed: label-merge graphs carry self-loops
        if rnd.nextDouble() < 0.12
      } yield (a, b)) ++ (0L until 6L).map(i => (100L + i, 101L + i)) // a chain
      val df = edges.toDF("doc_a", "doc_b")
      val viaDriver = Components.connectedComponents(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaLoop = Components.connectedComponents(df, driverEdgeLimit = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaDriver == viaLoop, s"trial $trial: driver UF diverges")
    }
  }
}
