package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Triangle counting vs an exhaustive triple-loop model on random
  * graphs, plus the structural cases where wedge logic typically breaks
  * (hubs, cliques, chains).
  */
class TrianglesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def model(edges: Set[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.flatMap(e => Seq(e, e.swap)).groupMap(_._1)(_._2)
    val nodes = adj.keys.toSeq.sorted
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      u <- nodes
      v <- adj(u).toSeq.sorted if v > u
      w <- adj(v).toSeq.sorted if w > v && adj(u).contains(w)
    } { counts(u) += 1; counts(v) += 1; counts(w) += 1 }
    counts.toMap
  }

  private def run(edges: Set[(Long, Long)]): Map[Long, Long] =
    Triangles.vertexTriangleCounts(
        edges.toSeq.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap

  test("random graphs match the exhaustive model") {
    val rnd = new scala.util.Random(42)
    (0 until 8).foreach { trial =>
      val n = 12 + rnd.nextInt(20)
      val edges = (for {
        a <- 0L until n
        b <- (a + 1) until n if rnd.nextDouble() < 0.25
      } yield (a, b)).toSet
      if (edges.nonEmpty)
        assert(run(edges) == model(edges), s"trial $trial, n=$n")
    }
  }

  test("clique K5: every vertex in C(4,2)=6 triangles; chain has none; hub star has none") {
    val k5 = (for { a <- 0L until 5; b <- (a + 1) until 5 } yield (a, b)).toSet
    assert(run(k5) == (0L until 5L).map(_ -> 6L).toMap)
    val chain = (0L until 6L).sliding(2).map(s => (s(0), s(1))).toSet
    assert(run(chain).isEmpty)
    // the hub shape the degree orientation exists for: star has no
    // triangles and must produce ZERO wedge explosion at the hub
    val star = (1L to 40L).map(i => (0L, i)).toSet
    assert(run(star).isEmpty)
    // star plus one rim edge: exactly one triangle
    assert(run(star + ((1L, 2L))) == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }
}
