package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** PII redaction cascade + benchmark decontamination unit specs. */
class PiiDecontaminateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(TextAnalysis.redactPii(col("t"))).head().getString(0)

  test("redacts email, IPv4, and international phone to typed placeholders") {
    assert(redact("mail bob.smith+x@corp.example.org now")
      == "mail <EMAIL> now")
    assert(redact("host 192.168.001.254 down") == "host <IP> down")
    assert(redact("call +49 170 555-0123 today") == "call <PHONE> today")
    assert(redact("a@b.co 10.0.0.1 +1 202 555 0100")
      == "<EMAIL> <IP> <PHONE>")
  }

  test("cascade order: email digits never double-count as a phone; bare digit runs survive") {
    // The email local part carries a phone-shaped digit run — the email
    // pass must consume it before the phone pattern can see it.
    assert(redact("x+12025550100@ex.com") == "<EMAIL>")
    // No '+' prefix -> not a phone; ids/quantities pass through.
    assert(redact("order 123456789012") == "order 123456789012")
    // Dot-quad consumed as IP, not as phone fodder.
    assert(redact("+1 555-010-9999 at 8.8.8.8") == "<PHONE> at <IP>")
  }

  test("tokenNgrams builds exactly the adjacent n-grams; short docs yield none") {
    def grams(s: String, n: Int): Seq[String] =
      Seq(s).toDF("t")
        .select(TextAnalysis.tokenNgrams(TextAnalysis.wsTokens(col("t")), n))
        .head().getSeq[String](0)
    assert(grams("a b c d", 2) == Seq("a b", "b c", "c d"))
    assert(grams("a b c d", 3) == Seq("a b c", "b c d"))
    assert(grams("a b c d", 4) == Seq("a b c d"))
    assert(grams("a b c", 4) == Seq.empty)
    assert(grams("a b c", 1) == Seq("a", "b", "c"))
  }

  test("decontamination flags n-gram overlap with the benchmark, reports zero-hit docs") {
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      // shares the benchmark 3-grams "alpha beta gamma" and "beta gamma delta"
      (1L, "intro alpha beta gamma delta outro"),
      (2L, "completely unrelated words entirely")).toDF("doc_id", "text")
    val r = Decontaminate.report(corpus, bench, "text", "doc_id", n = 3)
      .orderBy("doc_id").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2))).toSeq
      == Seq((1L, 2L, true), (2L, 0L, false)))
  }

  test("benchmark-version fold equals the from-scratch union report; gram set stays exact") {
    val docs = graft.Tables.documents(spark, SparkTestSession.sf0001)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5)
    val v1 = docs.filter(col("doc_id") % 10 === 0)
    val v2 = docs.filter(col("doc_id") % 10 === 5)
    val stored = Decontaminate.report(corpus, v1, "text", "doc_id")
    val storedGrams = Decontaminate.benchGramSet(v1, "text")
    val (updated, updatedGrams) = Decontaminate.foldNewBenchmark(
      stored, storedGrams, corpus, v2, "text", "doc_id")
    def canon(df: org.apache.spark.sql.DataFrame) = df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    // the additive fold == a full re-screen against v1 ∪ v2
    val full = Decontaminate.report(
      corpus, v1.unionByName(v2), "text", "doc_id")
    assert(canon(updated) == canon(full))
    assert(canon(updated) != canon(stored)) // v2 actually added contamination
    // the updated gram set is exactly the union screen
    val fullGrams = Decontaminate.benchGramSet(
      v1.unionByName(v2), "text")
    assert(updatedGrams.collect().map(_.getString(0)).sorted.toSeq
      == fullGrams.collect().map(_.getString(0)).sorted.toSeq)
    // scale shape: both benchmark-sized frames ride broadcasts; the
    // corpus gram stream is never exchange-joined on the gram key
    val plan = updated.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.linesIterator.take(50).mkString("\n"))
  }

  test("wide simhash: identical docs collide, near-identical land within radius, distant do not") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // identical
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"), // one word off
      (4L, "completely different content about unrelated things entirely here now"))
      .toDF("doc_id", "text")
    val sims = Dedup.simhashWide(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(1L) == sims(2L))
    assert(sims.values.forall(v => v >= 0 && v < (1L << 60)))
    val pairs = Dedup.simhashWideNearDupPairs(df, "text", "doc_id", radius = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // hamming 0
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((2L, 4L)) && !pairs.contains((3L, 4L)),
      s"distant doc must stay outside radius: $pairs")
    // pigeonhole candidates == brute force at any radius: hamming(1,3) from
    // one changed word is whatever it is; just assert consistency with xor
    val h13 = java.lang.Long.bitCount(sims(1L) ^ sims(3L))
    assert(pairs.contains((1L, 3L)) == (h13 <= 16))
  }

  test("decontamination broadcasts the benchmark n-gram set (no corpus-side shuffle join)") {
    val bench = Seq((100L, "a b c d e f g h")).toDF("doc_id", "text")
    val corpus = Seq((1L, "a b c d e f g h i")).toDF("doc_id", "text")
    val plan = Decontaminate.report(corpus, bench, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("LSH semantic screen: precision 1 vs the exact screen, full audit, real recall") {
    val emb = graft.Tables.embeddings(spark, graft.SparkTestSession.sf0001)
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val bench = emb.filter(col("vec_id") % 10 === 0)
    def flags(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val exact = flags(Decontaminate.semanticReport(
      corpus, bench, "vec_id", "embedding", threshold = 0.3))
    val lsh = flags(Decontaminate.semanticReportLsh(
      corpus, bench, "vec_id", "embedding", threshold = 0.3))
    // one audit row per corpus item in both
    assert(lsh.keySet == exact.keySet)
    // precision 1: every LSH flag is an exact flag (computed sims are
    // exact on a subset of pairs, so the max is a lower bound)
    val lshFlagged = lsh.filter(_._2).keySet
    val exactFlagged = exact.filter(_._2).keySet
    assert(lshFlagged.subsetOf(exactFlagged))
    // the banding actually finds a usable fraction on the fixture
    assert(exactFlagged.nonEmpty)
    assert(lshFlagged.nonEmpty,
      s"LSH screen found none of ${exactFlagged.size} exact flags")
  }

  test("leakageReport: distinct corpus docs per benchmark item, zero-leak rows kept") {
    import spark.implicits._
    val leaked = "alpha beta gamma delta epsilon zeta eta theta"  // 8 tokens = 1 gram
    val corpus = Seq(
      (1L, s"prefix words here $leaked and a tail"),
      (2L, s"$leaked entirely different continuation of text"),
      (3L, "nothing in common with any benchmark item at all here"))
      .toDF("doc_id", "text")
    val bench = Seq(
      (100L, leaked),                                        // leaked into docs 1 and 2
      (101L, "clean benchmark question nobody has copied anywhere yet today"))
      .toDF("doc_id", "text")
    val got = Decontaminate.leakageReport(corpus, bench, "text", "doc_id", n = 8)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((100L, 2L), (101L, 0L)))
  }
}
