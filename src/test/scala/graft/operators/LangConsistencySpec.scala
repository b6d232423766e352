package graft.operators

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Ground truth for [[TextAnalysis.langConsistency]]: uniform documents
  * report one language at frac 1, planted mixed documents split, the
  * majority tiebreak is deterministic, and the rollup costs one
  * doc-keyed exchange after the (doc, lang) aggregate.
  */
class LangConsistencySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 60 tokens of unmistakable English / German so 50/40 chunking yields
  // two chunks per half
  private val en = Seq.fill(12)("the cat is in the house and it is a").mkString(" ")
  private val de = Seq.fill(12)("der hund ist nicht zu haus und die katze").mkString(" ")

  private val docs = Seq(
    (1L, en),              // uniform English
    (2L, de),              // uniform German
    (3L, en + " " + de))   // half-and-half mix
    .toDF("doc_id", "text")

  test("uniform docs report majority_frac 1.0; the mix splits across languages") {
    val got = TextAnalysis.langConsistency(docs, "text", "doc_id", 50, 10)
      .as[(Long, Long, Long, String, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._3 == 1L && got(1L)._4 == "en" && got(1L)._5 == 1.0)
    assert(got(2L)._3 == 1L && got(2L)._4 == "de" && got(2L)._5 == 1.0)
    assert(got(3L)._3 >= 2L, s"mixed doc collapsed to one lang: ${got(3L)}")
    assert(got(3L)._5 < 1.0)
  }

  test("chunk counts follow the q61 closed form and frac = majority/chunks") {
    val got = TextAnalysis.langConsistency(docs, "text", "doc_id", 50, 10)
      .as[(Long, Long, Long, String, Double)].collect()
    got.foreach { case (id, nChunks, nLangs, _, frac) =>
      assert(nChunks >= 1L && nLangs >= 1L && nLangs <= nChunks)
      // majority_frac times n_chunks is an integer count
      val c = frac * nChunks
      assert(math.abs(c - math.rint(c)) < 1e-9, s"doc $id frac not a count ratio")
    }
  }

  test("plan: the two doc-level windows share one exchange after the (doc,lang) aggregate") {
    val p = TextAnalysis.langConsistency(docs, "text", "doc_id", 50, 10)
      .queryExecution.explainString(FormattedMode)
    val exchanges = p.sliding("Exchange (".length).count(_ == "Exchange (")
    assert(exchanges <= 2, s"expected <=2 exchanges (agg + doc rollup), got $exchanges:\n$p")
  }
}
