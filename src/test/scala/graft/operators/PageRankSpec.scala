package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Ground truth for [[PageRank]]: the integer fixed-point iterate equals
  * a scalar model exactly, hubs outrank satellites, mass stays bounded
  * by Scale, and iteration count matters.
  */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Scalar model of the exact integer update in [[PageRank.ranks]]. */
  private def model(edges: Seq[(Long, Long)], iterations: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val inEdges = edges.groupBy(_._2)
    var r = nodes.map(v => v -> PageRank.Scale / n).toMap
    val t = (15L * (PageRank.Scale / n)) / 100L
    for (_ <- 1 to iterations) {
      val c = nodes.map(v => v -> (r(v) / deg.getOrElse(v, 1L))).toMap
      r = nodes.map { v =>
        val s = inEdges.getOrElse(v, Nil).map { case (u, _) => c(u) }.sum
        v -> (t + (85L * s) / 100L)
      }.toMap
    }
    r
  }

  // star: 1 is the hub, 2..5 satellites; symmetric edges
  private val star = (2L to 5L).flatMap(v => Seq((1L, v), (v, 1L)))

  test("ranks equal the scalar integer model on a star graph; the hub wins") {
    val got = PageRank.ranks(star.toDF("src", "dst"), iterations = 5,
        numPartitions = Some(2))
      .as[(Long, Long)].collect().toMap
    assert(got == model(star, 5))
    assert((2L to 5L).forall(v => got(1L) > got(v)), s"hub does not dominate: $got")
    // satellites are symmetric: identical ranks
    assert((2L to 5L).map(got).distinct.size == 1)
  }

  test("randomized graph equals the model; total mass bounded by Scale") {
    val rnd = new scala.util.Random(13)
    val pairs = (1 to 60).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter { case (a, b) => a != b }.distinct
    val sym = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val got = PageRank.ranks(sym.toDF("src", "dst"), iterations = 5,
        numPartitions = Some(3))
      .as[(Long, Long)].collect().toMap
    assert(got == model(sym, 5))
    // truncating divisions only LOSE mass: the total never exceeds Scale
    assert(got.values.sum <= PageRank.Scale)
    assert(got.values.forall(_ > 0))
  }

  test("plan size is iteration-count-invariant (localCheckpoint prunes lineage)") {
    // The scaladoc claim the round-9 VERDICT asked to pin: each round
    // ends in a localCheckpoint, so the FINAL plan is a fixed shape over
    // a checkpointed RDD — 10 iterations must not produce a deeper tree
    // than 5 (without the checkpoints the tree would double).
    // driverEdgeLimit = 0: this test pins the DISTRIBUTED loop's
    // lineage discipline, so the r21 driver shortcut must not fire.
    def planNodes(iterations: Int): Int =
      PageRank.ranks(star.toDF("src", "dst"), iterations,
          numPartitions = Some(2), driverEdgeLimit = 0L)
        .queryExecution.optimizedPlan.collect { case p => p }.size
    val n5 = planNodes(5)
    val n10 = planNodes(10)
    assert(n5 == n10, s"plan grew with iterations: 5 -> $n5 nodes, 10 -> $n10")
    // The lineage claim itself is pinned DETERMINISTICALLY by the
    // plan-node-count equality above. The wall-clock check below is only
    // a smoke test against exponential re-evaluation, so it compares
    // min-of-3 runs (this host's intermittent CPU steal inflates single
    // runs 3-10x — a single inflated t10 flaked the old single-run form)
    // at a deliberately loose bound.
    def timeIt(iterations: Int): Double = {
      val t0 = System.nanoTime()
      PageRank.ranks(star.toDF("src", "dst"), iterations,
          numPartitions = Some(2), driverEdgeLimit = 0L)
        .collect()
      (System.nanoTime() - t0) / 1e9
    }
    timeIt(2) // warm the path so JIT lands outside the compared runs
    val t5 = (1 to 3).map(_ => timeIt(5)).min
    val t10 = (1 to 3).map(_ => timeIt(10)).min
    assert(t10 <= 8.0 * math.max(t5, 0.3),
      s"10 iterations took ${t10}s vs ${t5}s for 5 — superlinear growth")
  }

  test("driver fixed-point shortcut == distributed loop, ranks and localRanks") {
    val rnd = new scala.util.Random(29)
    val pairs = (1 to 80).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a != b }.distinct
    val sym = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val df = sym.toDF("src", "dst")
    def cmp(f: (org.apache.spark.sql.DataFrame, Long) => org.apache.spark.sql.DataFrame): Unit = {
      val viaDriver = f(df, 1000000L).as[(Long, Long)].collect().toMap
      val viaLoop = f(df, 0L).as[(Long, Long)].collect().toMap
      assert(viaDriver == viaLoop, "driver fixed point diverges from the loop")
    }
    cmp((d, lim) => PageRank.ranks(d, iterations = 4, numPartitions = Some(2),
      driverEdgeLimit = lim))
    cmp((d, lim) => PageRank.localRanks(d, iterations = 4, numPartitions = Some(2),
      driverEdgeLimit = lim))
  }

  test("iteration count matters: one round differs from five on an asymmetric graph") {
    val chain = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 3L))
    val r1 = PageRank.ranks(chain.toDF("src", "dst"), iterations = 1)
      .as[(Long, Long)].collect().toMap
    val r5 = PageRank.ranks(chain.toDF("src", "dst"), iterations = 5)
      .as[(Long, Long)].collect().toMap
    assert(r1 == model(chain, 1))
    assert(r5 == model(chain, 5))
    assert(r1 != r5)
  }
}
