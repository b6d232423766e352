package graft.operators

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Ground truth and plan shape for [[CorpusStats]]: pair counting matches
  * a scalar recount with a deterministic tiebreak and plans the top-k as
  * TakeOrderedAndProject; gram novelty matches first-occurrence scanning
  * and keeps the gram join equi-only.
  */
class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pairCounts equals a scalar recount; ties break lexicographically at the k boundary") {
    val docs = Seq("a b a b c", "b c d", "a b").toDF("text")
    // pairs: a b, b a, a b, b c | b c, c d | a b  -> "a b":3, "b c":2, others 1
    val got = CorpusStats.pairCounts(docs, "text", k = 3)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a b", 3L), ("b c", 2L), ("b a", 1L)))
    // k past the tie boundary keeps lexicographic order among count-1 pairs
    val all = CorpusStats.pairCounts(docs, "text", k = 10)
      .as[(String, Long)].collect().toSeq
    assert(all == Seq(("a b", 3L), ("b c", 2L), ("b a", 1L), ("c d", 1L)))
  }

  test("pairCounts plans top-k as TakeOrderedAndProject, not a global sort") {
    val q = CorpusStats.pairCounts(
      graft.Tables.documents(spark, SparkTestSession.sf0001), "text", k = 200)
    val plan = q.queryExecution.explainString(FormattedMode)
    assert(plan.contains("TakeOrderedAndProject"), plan.linesIterator.take(25).mkString("\n"))
  }

  test("gramNovelty equals first-occurrence scanning; short docs absent; ratio exact") {
    val docs = Seq(
      (10L, "a b c d"),   // grams (n=2, distinct): "a b","b c","c d" - all first here
      (20L, "b c d e"),   // "b c","c d" seen in 10; "d e" novel
      (30L, "a b a b"),   // "a b" seen; "b a" novel (distinct within doc)
      (40L, "z")          // < n tokens -> absent
    ).toDF("doc_id", "text")
    val got = CorpusStats.gramNovelty(docs, "doc_id", "text", n = 2)
      .select("doc_id", "n_grams", "n_novel", "novelty")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (10L, 3L, 3L, 1.0),
      (20L, 3L, 1L, 1.0 / 3.0),
      (30L, 2L, 1L, 0.5)))
  }

  test("gramNovelty plan: gram join is equi-only") {
    val q = CorpusStats.gramNovelty(
      graft.Tables.documents(spark, SparkTestSession.sf0001), "doc_id", "text", n = 5)
    val plan = q.queryExecution.explainString(FormattedMode)
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      plan.linesIterator.take(25).mkString("\n"))
    assert(q.limit(5).collect().nonEmpty)
  }

  test("kmvSourceResemblance: identical sources estimate 1, disjoint estimate 0") {
    val docs = Seq(
      ("a", "alpha"), ("a", "beta"), ("a", "gamma"),
      ("b", "alpha"), ("b", "beta"), ("b", "gamma"),   // b == a
      ("c", "delta"), ("c", "epsilon"))                // c disjoint
      .toDF("source", "text")
    val got = CorpusStats.kmvSourceResemblance(docs, "source", "text", k = 8)
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got(("a", "b")) == ((3L, 3L, 1.0)))
    assert(got(("a", "c")) == ((5L, 0L, 0.0)))
    assert(got(("b", "c")) == ((5L, 0L, 0.0)))
  }

  test("kmvSourceResemblance equals a scalar KMV model on random overlap") {
    val rnd = new scala.util.Random(23)
    val vocabDocs = (1 to 40).map(i => s"doc body $i")
    val rows = for {
      s <- Seq("s1", "s2", "s3")
      d <- vocabDocs if rnd.nextBoolean()
    } yield (s, d)
    val k = 4
    def h(t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(t.getBytes("UTF-8")).take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
    }
    val sketches = rows.groupBy(_._1).view
      .mapValues(_.map(r => h(r._2)).distinct.sorted.take(k)).toMap
    val want = (for {
      a <- sketches.keys; b <- sketches.keys if a < b
    } yield {
      val ka = sketches(a); val kb = sketches(b)
      val ku = (ka ++ kb).distinct.sorted.take(k)
      val both = ku.count(v => ka.contains(v) && kb.contains(v))
      (a, b, ku.size.toLong, both.toLong, both.toDouble / ku.size)
    }).toSeq.sortBy(r => (r._1, r._2))
    val got = CorpusStats.kmvSourceResemblance(
        rows.toDF("source", "text"), "source", "text", k)
      .as[(String, String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == want)
  }

  test("oovRate equals a scalar recount with the deterministic vocab tiebreak") {
    val docs = Seq(
      (1L, "a a b c"),
      (2L, "a b x"),
      (3L, "y z"))
      .toDF("doc_id", "text")
    // counts: a:3 b:2 c:1 x:1 y:1 z:1 -> top-3 by (c desc, t asc): a, b, c
    val got = CorpusStats.oovRate(docs, "doc_id", "text", vocabSize = 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 4L, 0L, 0.0),
      (2L, 3L, 1L, 1.0 / 3.0),
      (3L, 2L, 2L, 1.0)))
  }

  test("sourceDrift on an empty corpus is empty, not a spurious bound raise") {
    val empty = Seq.empty[(String, String)].toDF("source", "text")
    assert(CorpusStats.sourceDrift(empty, "source", "text").collect().isEmpty)
  }

  test("tokenRarity equals a scalar recount; rare vocabulary scores higher") {
    val docs = Seq(
      (1L, "a a a a"),       // all common
      (2L, "a z"),           // one rare token
      (3L, "q z"))           // all rare
      .toDF("doc_id", "text")
    // counts: a:5 z:2 q:1; N=8 -> inv: a=1, z=4, q=8
    val got = CorpusStats.tokenRarity(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 4L, 4L, 1.0),
      (2L, 2L, 5L, 2.5),
      (3L, 2L, 12L, 6.0)))
    assert(got.map(_._4) == got.map(_._4).sorted) // rarer vocab -> higher mean
  }

  test("vocabCoverage equals a scalar cumulative recount; curve is monotone to 1.0") {
    val docs = Seq("a a a b b c", "a b d", "e").toDF("text")
    // counts: a:4 b:3 c:1 d:1 e:1, total 10; order a,b,c,d,e (cnt desc, tok)
    val got = CorpusStats.vocabCoverage(docs, "text", vocabSize = 10)
      .as[(Long, String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "a", 4L, 4L, 0.4),
      (2L, "b", 3L, 7L, 0.7),
      (3L, "c", 1L, 8L, 0.8),
      (4L, "d", 1L, 9L, 0.9),
      (5L, "e", 1L, 10L, 1.0)))
    // truncation keeps the prefix; coverage stays < 1 when vocab is cut
    val cut = CorpusStats.vocabCoverage(docs, "text", vocabSize = 2)
      .as[(Long, String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(cut == got.take(2))
  }

  test("tokenRaritySketch is a conservative lower bound on exact rarity, tight without collisions") {
    val docs = Seq(
      (1L, "alpha alpha alpha alpha beta"),
      (2L, "beta gamma"),
      (3L, "gamma delta epsilon")
    ).toDF("doc_id", "text")
    val exact = CorpusStats.tokenRarity(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // 5 distinct tokens into 4x64 cells: the deterministic md5 hashes
    // happen to be collision-free in at least one row per token, so the
    // sketch reproduces the exact counts and the rarity is EQUAL
    val wide = CorpusStats.tokenRaritySketch(docs, "doc_id", "text",
      depth = 4, width = 64)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(wide == exact)
    // width 1 forces every token into one cell: est = N for all, so the
    // summand N div N = 1 and rarity_sum degenerates to n_tokens — the
    // extreme of the conservative bound, pinned exactly
    val tiny = CorpusStats.tokenRaritySketch(docs, "doc_id", "text",
      depth = 2, width = 1)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(tiny.map(r => (r._1, r._2, r._3)) ==
      exact.map(r => (r._1, r._2, r._2)))
    // general bound: sketch rarity never exceeds exact (est >= true count)
    tiny.zip(exact).foreach { case (s, e) =>
      assert(s._3 <= e._3 && s._2 == e._2)
    }
  }

  test("tokenRaritySketch plan: no join anywhere — the probe is a narrow literal lookup") {
    val docs = Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text")
    val p = CorpusStats.tokenRaritySketch(docs, "doc_id", "text", 4, 64)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("Join"), p.linesIterator.take(30).mkString("\n"))
    // the matrix cap is a construction-time contract
    intercept[IllegalArgumentException] {
      CorpusStats.tokenRaritySketch(docs, "doc_id", "text", 1024, 1024)
    }
  }

  test("oovRate plan: vocab joins broadcast and the top-V is TakeOrdered") {
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val p = CorpusStats.oovRate(docs, "doc_id", "text", 2)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }
}
