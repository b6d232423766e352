package graft.operators

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.PortableHash32

/** Ground truth and plan shape for [[ImportanceModels]]: the DSIR and
  * bigram-LM scores match an in-test scalar re-derivation built on the
  * same portable hash, the fusion verdict is exactly the conjunction of
  * the standalone q49/q51/q52 signals, and the plans keep the model
  * tables broadcast with no cartesian/shuffle surprises.
  */
class ImportanceModelsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def bucketOf(s: String, m: Int): Long =
    PortableHash32.hash32(s.getBytes("UTF-8")) % m

  test("dsirWeights equals a scalar re-derivation on a tiny corpus") {
    val docs = Seq(
      (1L, "a b a", "en"),
      (2L, "b c", "fr"),
      (3L, "a c c b", "en")
    ).toDF("doc_id", "text", "lang")
    val m = ImportanceModels.DsirBuckets
    val occ = Seq( // (doc, word, isTarget)
      (1L, "a", true), (1L, "b", true), (1L, "a", true),
      (2L, "b", false), (2L, "c", false),
      (3L, "a", true), (3L, "c", true), (3L, "c", true), (3L, "b", true))
    val tgt = occ.filter(_._3).groupBy(o => bucketOf(o._2, m)).view.mapValues(_.size.toLong).toMap
    val raw = occ.filterNot(_._3).groupBy(o => bucketOf(o._2, m)).view.mapValues(_.size.toLong).toMap
    val expected = occ.groupBy(_._1).map { case (doc, os) =>
      val n = os.size.toLong
      val tm = os.map(o => tgt.getOrElse(bucketOf(o._2, m), 0L)).sum
      val rm = os.map(o => raw.getOrElse(bucketOf(o._2, m), 0L)).sum
      (doc, n, tm, rm, (tm + n).toDouble / (rm + n).toDouble)
    }.toSet
    val got = ImportanceModels
      .dsirWeights(docs, "text", "doc_id", col("lang") === "en")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(got == expected)
  }

  test("bigramLmScore equals a scalar re-derivation; sub-2-token docs absent") {
    val docs = Seq(
      (1L, "a b a b", "en"),
      (2L, "b a x", "fr"),
      (3L, "q", "en") // 1 token -> no bigram -> absent from output
    ).toDF("doc_id", "text", "lang")
    val m = ImportanceModels.LmBuckets
    val grams = Seq( // (doc, gram, isTrain)
      (1L, "a b", true), (1L, "b a", true), (1L, "a b", true),
      (2L, "b a", false), (2L, "a x", false))
    val lm = grams.filter(_._3).groupBy(g => bucketOf(g._2, m)).view.mapValues(_.size.toLong).toMap
    val total = grams.count(_._3).toLong
    val expected = grams.groupBy(_._1).map { case (doc, gs) =>
      val n = gs.size.toLong
      val hits = gs.map(g => lm.getOrElse(bucketOf(g._2, m), 0L)).sum
      (doc, n, hits, (hits + n).toDouble / (n.toDouble * (total + m).toDouble))
    }.toSet
    val got = ImportanceModels
      .bigramLmScore(docs, "text", "doc_id", col("lang") === "en")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == expected)
    assert(!got.exists(_._1 == 3L))
  }

  test("filterFusion hand case: every check fails except punct") {
    // "zz zz zz": 8 chars (<50 -> length), langid 'und' vs 'en' (lang),
    // bigrams [zz zz, zz zz] -> rep 0.5 (repetition), no stopwords
    // (stopword), mean word 8/3 < 3 (word_len); punct 0/3 <= 0.3 passes.
    val docs = Seq((7L, "zz zz zz", "en")).toDF("doc_id", "text", "lang")
    val got = ImportanceModels.filterFusion(docs, "text", "doc_id", "lang")
      .as[(Long, Boolean, String)].collect().toSeq
    assert(got == Seq((7L, false, "lang,length,repetition,stopword,word_len")))
  }

  test("filterFusion is the conjunction of the standalone q49/q51/q52 signals") {
    val docs = graft.Tables.documents(spark, SparkTestSession.sf0001)
    val fusion = ImportanceModels.filterFusion(docs, "text", "doc_id", "lang")
    val parts = docs.select(
      col("doc_id"),
      (TextAnalysis.qualityScore(col("text")) === 1.0).as("q51_all"),
      (TextAnalysis.bigramRepetitionRatio(col("text")) <= 0.2).as("q49_ok"),
      (TextAnalysis.langIdHeuristic(col("text")) === col("lang")).as("q52_ok"))
    val joined = fusion.join(parts, "doc_id")
      .select(col("keep"), col("q51_all") && col("q49_ok") && col("q52_ok"),
        col("reasons") === "")
      .as[(Boolean, Boolean, Boolean)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (keep, conj, emptyReasons) =>
      assert(keep == conj)
      assert(keep == emptyReasons) // reasons empty iff kept
    }
  }

  test("plan shape: model tables broadcast, fusion shuffle-free") {
    val docs = graft.Tables.documents(spark, SparkTestSession.sf0001)
    val dsir = ImportanceModels
      .dsirWeights(docs, "text", "doc_id", col("lang") === "en")
      .queryExecution.explainString(FormattedMode)
    assert(dsir.contains("BroadcastHashJoin"), dsir.linesIterator.take(30).mkString("\n"))
    assert(!dsir.contains("CartesianProduct"))
    val lmp = ImportanceModels
      .bigramLmScore(docs, "text", "doc_id", col("lang") === "en")
      .queryExecution.explainString(FormattedMode)
    assert(lmp.contains("BroadcastHashJoin"), lmp.linesIterator.take(30).mkString("\n"))
    assert(!lmp.contains("CartesianProduct"))
    val fus = ImportanceModels.filterFusion(docs, "text", "doc_id", "lang")
      .queryExecution.explainString(FormattedMode)
    assert(!fus.contains("Exchange"), fus.linesIterator.take(30).mkString("\n"))
  }

  test("modelRankAgreement equals a scalar Spearman over the two model rankings") {
    val docs = Seq(
      (1L, "the cat sat on the mat quietly today", "en", "s1"),
      (2L, "the dog sat on the rug quietly today", "en", "s1"),
      (3L, "quantum flux capacitors hum in the lab", "en", "s1"),
      (4L, "der hund sitzt auf dem teppich heute", "de", "s1"),
      (5L, "the cat sat on the mat", "en", "s2"),
      (6L, "unrelated words entirely here now", "de", "s2"),
      (7L, "solo", "en", "s3") // 1 token: no bigram -> absent from join
    ).toDF("doc_id", "text", "lang", "source")
    val d = ImportanceModels
      .dsirWeights(docs, "text", "doc_id", col("lang") === "en")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._5).toMap
    val l = ImportanceModels
      .bigramLmScore(docs, "text", "doc_id", col("lang") === "en")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    val srcOf = Map(1L -> "s1", 2L -> "s1", 3L -> "s1", 4L -> "s1",
      5L -> "s2", 6L -> "s2", 7L -> "s3")
    val both = d.keySet intersect l.keySet
    val expect = both.groupBy(srcOf).map { case (src, ids) =>
      val byD = ids.toSeq.sortBy(id => (-d(id), id)).zipWithIndex
        .map { case (id, i) => id -> (i + 1) }.toMap
      val byL = ids.toSeq.sortBy(id => (-l(id), id)).zipWithIndex
        .map { case (id, i) => id -> (i + 1) }.toMap
      val sumD2 = ids.toSeq.map(id =>
        math.pow(byD(id).toDouble - byL(id), 2).toLong).sum
      val n = ids.size.toLong
      val rho = if (n >= 2)
        Some(1.0 - (6.0 * sumD2) / (n * (n * n - 1)).toDouble) else None
      src -> ((n, sumD2, rho))
    }
    val got = ImportanceModels.modelRankAgreement(
        docs, "text", "doc_id", "source",
        col("lang") === "en", col("lang") === "en")
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == expect)
    // doc 7 has no bigram: s3 vanishes entirely (absent from both maps)
    assert(!got.contains("s3"))
    got.values.foreach { case (_, _, rho) =>
      rho.foreach(r => assert(r >= -1.0 && r <= 1.0)) }
  }
}
