package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.PortableHash32

/** Randomized ground truth for [[ImportanceModels]]: both scores are
  * pure integer-mass arithmetic over hashed occurrences, so a scalar
  * Scala re-derivation on the same portable hash is an exact model at
  * any input — random small-vocabulary corpora exercise bucket
  * collisions, empty-token docs, all-target/all-raw splits, and
  * sub-2-token documents that the fixed fixtures cannot cover
  * exhaustively. Seeded; batch-style (few Spark jobs over many
  * generated cases, the TextPropertySpec discipline).
  */
class ImportanceModelsPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(4242)

  private def bucketOf(s: String, m: Int): Long =
    PortableHash32.hash32(s.getBytes("UTF-8")) % m

  /** Small vocabulary → frequent hash-bucket sharing between distinct
    * words at DsirBuckets=256 (the regularizing-collision regime the
    * recipe depends on). Includes occasional 1-token and empty docs.
    */
  private def randomDocs(n: Int, idBase: Long): Seq[(Long, String, String)] = {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val langs = Vector("en", "fr", "de")
    (0 until n).map { i =>
      val len = rnd.nextInt(9) // 0..8 tokens: includes empty + 1-token docs
      val text = Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (idBase + i, text, langs(rnd.nextInt(langs.size)))
    }
  }

  private def words(text: String): Seq[String] =
    text.trim.split("\\s+").toSeq // "" -> Seq("") like both engines

  test("dsirWeights == scalar model on 15 random corpora") {
    val m = ImportanceModels.DsirBuckets
    (0 until 15).foreach { trial =>
      val docs = randomDocs(4 + rnd.nextInt(8), 100L * trial)
      val occ = docs.flatMap { case (id, text, lang) =>
        words(text).map(w => (id, bucketOf(w, m), lang == "en"))
      }
      val tgt = occ.filter(_._3).groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val raw = occ.filterNot(_._3).groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val expected = occ.groupBy(_._1).map { case (id, os) =>
        val n = os.size.toLong
        val tm = os.map(o => tgt.getOrElse(o._2, 0L)).sum
        val rm = os.map(o => raw.getOrElse(o._2, 0L)).sum
        (id, n, tm, rm, (tm + n).toDouble / (rm + n).toDouble)
      }.toSet
      val got = ImportanceModels.dsirWeights(
          docs.toDF("doc_id", "text", "lang"), "text", "doc_id",
          targetPred = col("lang") === "en")
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      assert(got == expected, s"trial $trial diverges from the scalar model")
    }
  }

  test("bigramLmScore == scalar model on 15 random corpora (short docs absent)") {
    val m = ImportanceModels.LmBuckets
    (0 until 15).foreach { trial =>
      val docs = randomDocs(4 + rnd.nextInt(8), 10000L + 100L * trial)
      val grams = docs.flatMap { case (id, text, lang) =>
        val ws = words(text)
        ws.zip(ws.drop(1)).map { case (a, b) =>
          (id, bucketOf(s"$a $b", m), lang == "en")
        }
      }
      val lm = grams.filter(_._3).groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val total = grams.count(_._3).toLong
      val expected = grams.groupBy(_._1).map { case (id, gs) =>
        val n = gs.size.toLong
        val hits = gs.map(g => lm.getOrElse(g._2, 0L)).sum
        (id, n, hits, (hits + n).toDouble / (n.toDouble * (total + m).toDouble))
      }.toSet
      val got = ImportanceModels.bigramLmScore(
          docs.toDF("doc_id", "text", "lang"), "text", "doc_id",
          trainPred = col("lang") === "en")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(got == expected, s"trial $trial diverges from the scalar model")
    }
  }

  test("fold additivity: DSIR stats from any random batch split == one-shot stats") {
    (0 until 5).foreach { trial =>
      val docs = randomDocs(6 + rnd.nextInt(6), 20000L + 100L * trial)
      val cut = 1 + rnd.nextInt(docs.size - 1)
      val (b1, b2) = docs.splitAt(cut)
      val statsT = s"graft_dsirfold_prop_$trial"
      Bucketing.dropWithLocation(spark, statsT)
      ImportanceModels.foldDsirBatch(
        b1.toDF("doc_id", "text", "lang"), 0L, statsT, "text", "doc_id",
        targetPred = col("lang") === "en")
      ImportanceModels.foldDsirBatch(
        b2.toDF("doc_id", "text", "lang"), 1L, statsT, "text", "doc_id",
        targetPred = col("lang") === "en")
      val folded = ImportanceModels.dsirFromFolds(spark, statsT)
        .as[(Long, Long, Long)].collect().toSet
      val occ = docs.flatMap { case (id, text, lang) =>
        words(text).map(w =>
          (bucketOf(w, ImportanceModels.DsirBuckets), lang == "en"))
      }
      val expected = occ.groupBy(_._1).map { case (b, os) =>
        (b, os.count(_._2).toLong, os.count(!_._2).toLong)
      }.toSet
      assert(folded == expected, s"trial $trial fold stats diverge")
    }
  }
}
