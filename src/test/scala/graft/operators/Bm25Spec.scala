package graft.operators

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Ground truth and plan shape for [[Bm25]]: the integer-scaled Okapi
  * score matches a scalar model exactly, ranking and tiebreaks are
  * deterministic, non-matching docs are absent, and the plan is
  * broadcast-only on the term side with a WindowGroupLimit top-k.
  */
class Bm25Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Scalar model of the exact integer BM25 in [[Bm25.topK]]. */
  private def model(
      corpus: Seq[(Long, String)],
      queries: Seq[String],
      k: Int): Seq[(String, Long, Long, Long)] = {
    val toks = corpus.map { case (id, t) => id -> t.trim.split("\\s+").toVector }
    val n = toks.size.toLong
    val t = toks.map(_._2.size.toLong).sum
    val dfm = toks.flatMap { case (_, tk) => tk.distinct }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    queries.flatMap { q =>
      val terms = q.trim.split("\\s+").distinct.toSeq
      val scored = toks.flatMap { case (id, tk) =>
        val dl = tk.size.toLong
        val contribs = terms.flatMap { term =>
          val tf = tk.count(_ == term).toLong
          if (tf == 0L) None
          else {
            val df = dfm(term)
            val idfS = ((2 * n - 2 * df + 1) * Bm25.Scale) / (2 * df + 1)
            Some(idfS * 22 * tf * t / (10 * tf * t + 3 * t + 9 * dl * n))
          }
        }
        if (contribs.isEmpty) None else Some((id, contribs.sum))
      }
      scored.sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex
        .map { case ((id, s), i) => (q, id, s, i + 1L) }
    }
  }

  private val corpus = Seq(
    (1L, "hash join hash join scan"),
    (2L, "hash merge sort sort sort sort"),
    (3L, "scan filter vector scan"),
    (4L, "the a of and"),
    (5L, "join")
  )
  private val queries = Seq("hash join", "vector scan")

  test("topK equals the scalar integer model, including rank tiebreaks") {
    val got = Bm25.topK(corpus.toDF("doc_id", "text"), "doc_id", "text", queries, k = 3)
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(got == model(corpus, queries, 3).sortBy(r => (r._1, r._4)))
  }

  test("docs sharing no term with a query are absent, k truncates") {
    val got = Bm25.topK(corpus.toDF("doc_id", "text"), "doc_id", "text", queries, k = 2)
      .as[(String, Long, Long, Long)].collect()
    assert(!got.exists(_._2 == 4L))            // stopword-only doc never scores
    assert(got.count(_._1 == "hash join") == 2)
    assert(got.forall(_._4 <= 2L))
  }

  test("term saturation: higher tf scores higher but sublinearly; length norm penalizes padding") {
    val c = Seq(
      (1L, "hash pad"),
      (2L, "hash hash pad"),
      (3L, "hash pad pad pad pad pad pad pad pad"))
    val got = Bm25.topK(c.toDF("doc_id", "text"), "doc_id", "text", Seq("hash"), 3)
      .as[(String, Long, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(got(2L) > got(1L))                  // more occurrences -> higher
    assert(got(2L) < 2 * got(1L))              // ...but saturated, not linear
    assert(got(3L) < got(1L))                  // same tf, longer doc -> lower
  }

  test("randomized: topK equals the model on small-vocab corpora") {
    val rnd = new scala.util.Random(31)
    val vocab = Vector("hash", "join", "scan", "merge", "pad", "x")
    val c = (1L to 80L).map(i =>
      (i, Seq.fill(2 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val qs = Seq("hash join scan", "merge x")
    val got = Bm25.topK(c.toDF("doc_id", "text"), "doc_id", "text", qs, 7)
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(got == model(c, qs, 7).sortBy(r => (r._1, r._4)))
  }

  test("blank queries are rejected instead of matching blank documents") {
    val ex = intercept[IllegalArgumentException] {
      Bm25.topK(corpus.toDF("doc_id", "text"), "doc_id", "text",
        Seq("hash join", "   "), 3)
    }
    assert(ex.getMessage.contains("at least one term"), ex.getMessage)
  }

  test("an empty corpus returns an empty result, not a spurious overflow raise") {
    val empty = corpus.toDF("doc_id", "text").filter("doc_id < 0")
    assert(Bm25.topK(empty, "doc_id", "text", queries, 3).collect().isEmpty)
  }

  test("past the exact-Long bound the stats row fails fast instead of wrapping") {
    // 5 docs x 200k tokens: n*T*max_dl = 5 * 1e6 * 2e5 = 1e12 > MaxStatProduct.
    val body = Array.fill(100000)("a b").mkString(" ")
    val c = (1L to 5L).map(i => (i, body))
    val ex = intercept[Exception] {
      Bm25.topK(c.toDF("doc_id", "text"), "doc_id", "text", Seq("a"), 1).collect()
    }
    val chain = Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(chain.contains("exact-Long scoring bound"), s"unexpected: $ex")
  }

  test("plan: term-side joins broadcast, top-k is WindowGroupLimit, stats is the only nested loop") {
    val plan = Bm25.topK(corpus.toDF("doc_id", "text"), "doc_id", "text", queries, 3)
      .queryExecution.explainString(FormattedMode)
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the broadcast 1-row corpus-stats frame is the single allowed
    // nested-loop join (FormattedMode prints each node twice: tree + detail)
    assert(plan.split("BroadcastNestedLoopJoin").length - 1 <= 2, plan)
  }
}
