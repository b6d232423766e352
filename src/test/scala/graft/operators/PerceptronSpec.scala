package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.PortableHash32

/** Ground truth for [[Perceptron]]: a scalar re-implementation of the
  * batch-perceptron recurrence (same portable hash, same
  * boundary-counts-as-wrong rule) run on a tiny corpus must reproduce
  * the distributed margins, predictions, and per-round error trace
  * exactly — every quantity is an integer, so equality is strict.
  */
class PerceptronSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val B = Perceptron.Buckets

  private def bucketOf(s: String): Int =
    (PortableHash32.hash32(s.getBytes("UTF-8")) % B).toInt

  /** Scalar batch perceptron over (doc -> (bucket -> cnt), y). */
  private def scalarTrain(
      feats: Map[Long, (Map[Int, Long], Long)],
      rounds: Int): (Array[Long], Long, Seq[(Int, Long, Long)]) = {
    val w = Array.fill(B)(0L)
    var bias = 0L
    val trace = Seq.newBuilder[(Int, Long, Long)]
    for (r <- 1 to rounds) {
      val mis = feats.filter { case (_, (x, y)) =>
        val margin = x.map { case (b, c) => w(b) * c }.sum + bias
        y * margin <= 0
      }
      trace += ((r, mis.size.toLong, feats.size.toLong))
      for ((_, (x, y)) <- mis) {
        for ((b, c) <- x) w(b) += y * c
        bias += y
      }
    }
    (w, bias, trace.result())
  }

  private val docs = Seq(
    (1L, "the cat sat on the mat", "en"),
    (2L, "der hund lief durch den wald", "de"),
    (3L, "the dog ran through the park", "en"),
    (4L, "le chat dort sur le lit", "fr"),
    (5L, "cats and dogs and cats", "en"),
    (6L, "hund und katze und hund", "de")
  ).toDF("doc_id", "text", "lang")

  private def scalarFeats: Map[Long, (Map[Int, Long], Long)] = Map(
    1L -> "the cat sat on the mat", 2L -> "der hund lief durch den wald",
    3L -> "the dog ran through the park", 4L -> "le chat dort sur le lit",
    5L -> "cats and dogs and cats", 6L -> "hund und katze und hund"
  ).map { case (id, text) =>
    val x = text.split("\\s+").toSeq
      .groupBy(bucketOf).view.mapValues(_.size.toLong).toMap
    val y = if (id == 1L || id == 3L || id == 5L) 1L else -1L
    id -> ((x, y))
  }

  test("trainScore margins/preds equal the scalar recurrence") {
    val (w, bias, _) = scalarTrain(scalarFeats, Perceptron.Rounds)
    val expected = scalarFeats.map { case (id, (x, y)) =>
      val margin = x.map { case (b, c) => w(b) * c }.sum + bias
      (id, y, margin, if (margin > 0) 1L else -1L)
    }.toSet
    val got = Perceptron
      .trainScore(docs, "text", "doc_id", col("lang") === "en")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("errorTrace equals the scalar per-round error counts; round 1 is all-wrong") {
    val (_, _, trace) = scalarTrain(scalarFeats, Perceptron.Rounds)
    val got = Perceptron
      .errorTrace(docs, "text", "doc_id", col("lang") === "en")
      .as[(Int, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == trace)
    assert(got.head == ((1, 6L, 6L))) // w=0 puts every doc on the boundary
  }

  test("a linearly separable corpus converges to zero training error") {
    // Disjoint vocabularies: the perceptron must fit them perfectly
    // within the default rounds, and the final margins must classify
    // every doc correctly.
    val sep = Seq(
      (1L, "aa aa bb", "en"), (2L, "cc dd", "fr"),
      (3L, "bb aa", "en"), (4L, "dd cc cc", "fr")
    ).toDF("doc_id", "text", "lang")
    val scored = Perceptron
      .trainScore(sep, "text", "doc_id", col("lang") === "en")
      .as[(Long, Long, Long, Long)].collect()
    assert(scored.forall { case (_, y, _, pred) => y == pred })
  }

  test("plan shape: no cartesian product; margin pass is one doc-keyed aggregate") {
    val df = Perceptron.trainScore(docs, "text", "doc_id", col("lang") === "en")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }
}
