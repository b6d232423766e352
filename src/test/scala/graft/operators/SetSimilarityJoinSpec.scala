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

  private def containModelCapped(
      docs: Seq[(Long, String)], num: Int, den: Int, cap: Int) = {
    val raw = docs.map { case (id, t) => id -> t.split("\\s+").toSet }.toMap
    val df = raw.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val sets = raw.view.mapValues(_.filter(tok => df(tok) <= cap))
      .filter(_._2.nonEmpty).toMap
    (for {
      a <- sets.keys.toSeq
      b <- sets.keys.toSeq if b != a
      inter = (sets(a) & sets(b)).size.toLong
      if inter * den >= sets(a).size.toLong * num
    } yield (a, b, inter, sets(a).size.toLong)).toSet
  }

  test("maxDocFreq cap: identical output on a corpus where no token exceeds it") {
    // cap = corpus size: document frequency can never exceed the number
    // of documents, so the cap must be a no-op — engaged-vs-off paths
    // must agree row for row.
    (0 until 3).foreach { trial =>
      val docs = randomDocs(12 + rnd.nextInt(8))
      val run = (cap: Option[Int]) => SetSimilarityJoin.containmentJoin(
          docs.toDF("doc_id", "text"), "doc_id", "text", num = 3, den = 4,
          maxDocFreq = cap)
        .select("doc_a", "doc_b", "inter", "na")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(run(Some(docs.size)) == run(None), s"trial $trial: cap must be inert")
    }
  }

  test("maxDocFreq cap: boilerplate corpus — capped matches the filtered model, uncapped degenerates") {
    val boiler = "b0 b1 b2 b3 b4 b5 b6 b7"
    val docs = Seq(
      (1L, s"$boiler alpha beta gamma delta"),
      (2L, s"$boiler alpha beta gamma delta eps"), // true near-dup of 1
      (3L, s"$boiler kappa lambda mu"),
      (4L, s"$boiler iota theta"),
      (5L, boiler),                                // boilerplate-only
      (6L, boiler))                                // boilerplate-only
    val capped = SetSimilarityJoin.containmentJoin(
        docs.toDF("doc_id", "text"), "doc_id", "text", num = 3, den = 4,
        maxDocFreq = Some(4))
      .select("doc_a", "doc_b", "inter", "na")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(capped == containModelCapped(docs, 3, 4, 4),
      "capped join must equal exact containment over the filtered sets")
    // boilerplate-only docs drop out entirely (empty filtered set)
    assert(!capped.exists(r => Set(r._1, r._2).exists(Set(5L, 6L))),
      "boilerplate-only docs must vanish from both sides")
    // the genuine excerpt relation survives on its distinctive tokens
    assert(capped.exists(r => r._1 == 1L && r._2 == 2L),
      "the distinctive-token excerpt pair must survive the cap")
    // and WITHOUT the cap, boilerplate coincidence pairs the empty docs —
    // the degeneracy (and quality hole) the cap exists to close
    val uncapped = SetSimilarityJoin.containmentJoin(
        docs.toDF("doc_id", "text"), "doc_id", "text", num = 3, den = 4)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((5L, 6L)),
      "uncapped join must show the boilerplate degeneracy the cap removes")
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
