package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The exact-join guarantee: output equals an exhaustive all-pairs
  * Jaccard scan — no false negatives (the prefix filter loses nothing)
  * and no false positives (exact verification) — on random small-vocab
  * corpora where token overlap is common, across thresholds.
  */
class SetSimilarityJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(23)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")

  private def randomDocs(n: Int): Seq[(Long, String)] =
    (0 until n).map { i =>
      val len = 2 + rnd.nextInt(8)
      (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }

  private def model(docs: Seq[(Long, String)], num: Int, den: Int) = {
    val sets = docs.map { case (id, t) => id -> t.split("\\s+").toSet }.toMap
    (for {
      a <- sets.keys.toSeq.sorted
      b <- sets.keys.toSeq.sorted if b > a
      inter = (sets(a) & sets(b)).size.toLong
      uni = (sets(a) | sets(b)).size.toLong
      if inter * den >= uni * num
    } yield (a, b, inter, uni)).toSet
  }

  test("prefix-filtered join == exhaustive all-pairs scan at t = 1/2, 1/3, 3/4") {
    (0 until 4).foreach { trial =>
      val docs = randomDocs(15 + rnd.nextInt(15))
      Seq((1, 2), (1, 3), (3, 4)).foreach { case (num, den) =>
        val got = SetSimilarityJoin.selfJoin(
            docs.toDF("doc_id", "text"), "doc_id", "text", num, den)
          .select("doc_a", "doc_b", "inter", "uni")
          .as[(Long, Long, Long, Long)].collect().toSet
        assert(got == model(docs, num, den), s"trial $trial, t=$num/$den")
      }
    }
  }

  private def containModel(docs: Seq[(Long, String)], num: Int, den: Int) = {
    val sets = docs.map { case (id, t) => id -> t.split("\\s+").toSet }.toMap
    (for {
      a <- sets.keys.toSeq
      b <- sets.keys.toSeq if b != a
      inter = (sets(a) & sets(b)).size.toLong
      if inter * den >= sets(a).size.toLong * num
    } yield (a, b, inter, sets(a).size.toLong)).toSet
  }

  test("containment join == exhaustive directed scan at t = 3/4, 1/2") {
    (0 until 4).foreach { trial =>
      val docs = randomDocs(15 + rnd.nextInt(15))
      Seq((3, 4), (1, 2)).foreach { case (num, den) =>
        val got = SetSimilarityJoin.containmentJoin(
            docs.toDF("doc_id", "text"), "doc_id", "text", num, den)
          .select("doc_a", "doc_b", "inter", "na")
          .as[(Long, Long, Long, Long)].collect().toSet
        assert(got == containModel(docs, num, den), s"trial $trial, t=$num/$den")
      }
    }
  }

  test("an excerpt is contained in its superset but not Jaccard-similar") {
    val docs = Seq(
      (1L, "alpha beta"),                                        // excerpt
      (2L, "alpha beta gamma delta eps zeta eta theta iota"))    // page
    val cont = SetSimilarityJoin.containmentJoin(
        docs.toDF("doc_id", "text"), "doc_id", "text", num = 1, den = 1)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(cont == Set((1L, 2L)), "excerpt must be detected, directionally")
    val jac = SetSimilarityJoin.selfJoin(
        docs.toDF("doc_id", "text"), "doc_id", "text", num = 1, den = 2)
      .count()
    assert(jac == 0, "Jaccard at 1/2 must NOT pair an excerpt with its page")
  }

  test("exact duplicates always qualify at t = 1; disjoint docs never pair") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "gamma alpha beta"),
      (3L, "mu lambda kappa"))
    val got = SetSimilarityJoin.selfJoin(
        docs.toDF("doc_id", "text"), "doc_id", "text", num = 1, den = 1)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }
}
