package graft.operators

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Ground truth and plan shape for [[Boilerplate]]: passage cutting drops
  * the short tail, frequency screening is exact, reassembly preserves
  * order, and the corpus-wide screen is an equi-join on the passage —
  * never a cartesian.
  */
class BoilerplateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    // "x y" boilerplate passage appears in 3 docs; window=2
    (1L, "x y a b c d e"),       // passages: "x y","a b","c d" (+tail "e" dropped)
    (2L, "x y f g"),             // "x y","f g"
    (3L, "h i x y"),             // "h i","x y"
    (4L, "j k"),                 // "j k"
    (5L, "solo")                 // shorter than one window -> no rows
  ).toDF("doc_id", "text")

  test("passages: non-overlapping windows, 0-based pidx, short tail and short docs dropped") {
    val p = Boilerplate.passages(docs, "doc_id", "text", window = 2)
      .as[(Long, Int, String)].collect().toSet
    assert(p == Set(
      (1L, 0, "x y"), (1L, 1, "a b"), (1L, 2, "c d"),
      (2L, 0, "x y"), (2L, 1, "f g"),
      (3L, 0, "h i"), (3L, 1, "x y"),
      (4L, 0, "j k")))
  }

  test("removeBoilerplate: passages over the df cap dropped, survivors reassembled in order") {
    val out = Boilerplate.removeBoilerplate(docs, "doc_id", "text", window = 2, maxDf = 2L)
      .select("doc_id", "n_kept", "n_dropped", "cleaned_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    // "x y" df=3 > 2 -> dropped everywhere; everything else df=1 kept
    assert(out == Seq(
      (1L, 2L, 1L, "a b c d"),
      (2L, 1L, 1L, "f g"),
      (3L, 1L, 1L, "h i"),
      (4L, 1L, 0L, "j k")))
  }

  test("a doc that is ALL boilerplate survives with empty cleaned_text, not a lost row") {
    val d = Seq((1L, "x y"), (2L, "x y"), (3L, "x y")).toDF("doc_id", "text")
    val out = Boilerplate.removeBoilerplate(d, "doc_id", "text", window = 2, maxDf = 2L)
      .select("doc_id", "n_kept", "cleaned_text")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 0L, ""), (2L, 0L, ""), (3L, 0L, "")))
  }

  test("randomized: removeBoilerplate equals a scalar model on small-vocab corpora") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "d")
    val window = 2
    val maxDf = 3L
    val corpus = (1L to 60L).map(i =>
      (i, Seq.fill(3 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    def cuts(t: String): Vector[String] =
      t.split("\\s+").grouped(window).filter(_.length == window)
        .map(_.mkString(" ")).toVector
    val dfModel = corpus
      .flatMap { case (id, t) => cuts(t).distinct.map(p => (p, id)) }
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).distinct.size }
    val want = corpus.map { case (id, t) =>
      val ps = cuts(t)
      val kept = ps.filter(p => dfModel(p) <= maxDf)
      (id, kept.size.toLong, (ps.size - kept.size).toLong, kept.mkString(" "))
    }.sortBy(_._1)
    val got = Boilerplate.removeBoilerplate(
        corpus.toDF("doc_id", "text"), "doc_id", "text", window, maxDf)
      .select("doc_id", "n_kept", "n_dropped", "cleaned_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == want)
  }

  test("plan: the screen is a broadcast LeftAnti hash join — the passage stream never shuffles on the passage value") {
    val out = Boilerplate.removeBoilerplate(
      graft.Tables.documents(spark, SparkTestSession.sf0001),
      "doc_id", "text", window = 3, maxDf = 5L)
    // Simple tree: each join node is one line with its keys inline, so
    // "a SortMergeJoin/ShuffledHashJoin keyed on the passage" is a
    // single-line match. The only allowed joins on `passage` are the
    // broadcast anti screen (and the broadcast bounds of the hot-set agg).
    val lines = out.queryExecution.executedPlan.toString.linesIterator.toSeq
    assert(lines.exists(l =>
        l.contains("BroadcastHashJoin") && l.contains("LeftAnti") && l.contains("passage")),
      lines.mkString("\n"))
    assert(!lines.exists(l =>
        (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")) && l.contains("passage")),
      lines.mkString("\n"))
    val plan = out.queryExecution.explainString(FormattedMode)
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      plan.linesIterator.take(30).mkString("\n"))
    assert(out.limit(5).collect().nonEmpty)
  }

  test("randomized: removeBoilerplateNormalized equals a scalar model (digit-folded case-folded keys)") {
    val rnd = new scala.util.Random(23)
    // vocab mixes case variants and digit-bearing tokens so the fold is live
    val vocab = Vector("a", "A", "b", "B2", "c3", "d")
    val window = 2
    val maxDf = 3L
    val corpus = (1L to 60L).map(i =>
      (i, Seq.fill(3 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    def cuts(t: String): Vector[String] =
      t.split("\\s+").grouped(window).filter(_.length == window)
        .map(_.mkString(" ")).toVector
    def fold(p: String): String = p.toLowerCase.replaceAll("[0-9]+", "0")
    val dfModel = corpus
      .flatMap { case (id, t) => cuts(t).map(fold).distinct.map(k => (k, id)) }
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).distinct.size }
    val want = corpus.map { case (id, t) =>
      val ps = cuts(t)
      val kept = ps.filter(p => dfModel(fold(p)) <= maxDf)
      (id, kept.size.toLong, (ps.size - kept.size).toLong, kept.mkString(" "))
    }.sortBy(_._1)
    val got = Boilerplate.removeBoilerplateNormalized(
        corpus.toDF("doc_id", "text"), "doc_id", "text", window, maxDf)
      .select("doc_id", "n_kept", "n_dropped", "cleaned_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == want)
  }

  test("plan: the normalized screen is also a broadcast LeftAnti — hashed cap keys, no passage shuffle") {
    val out = Boilerplate.removeBoilerplateNormalized(
      graft.Tables.documents(spark, SparkTestSession.sf0001),
      "doc_id", "text", window = 3, maxDf = 5L)
    val lines = out.queryExecution.executedPlan.toString.linesIterator.toSeq
    assert(lines.exists(l =>
        l.contains("BroadcastHashJoin") && l.contains("LeftAnti") && l.contains("__bp_key")),
      lines.mkString("\n"))
    assert(!lines.exists(l =>
        (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")) &&
          (l.contains("passage") || l.contains("__bp_key"))),
      lines.mkString("\n"))
  }

  test("normalized screen catches date/counter-mutated chrome the verbatim screen misses") {
    // Chrome "Copyright YEAR acme" with a different year per doc: verbatim
    // df=1 each (never capped); digit-folded all docs share one cap key.
    // Bodies are digit-free so they stay distinct under the fold.
    val d = (1 to 8).map { i =>
      val tag = ('a' + i - 1).toChar
      (i.toLong, s"Copyright ${2000 + i} acme body$tag stays here")
    }.toDF("doc_id", "text")
    val verbatim = Boilerplate.removeBoilerplate(d, "doc_id", "text", window = 3, maxDf = 5L)
      .select("doc_id", "n_dropped").as[(Long, Long)].collect().toMap
    assert(verbatim.values.forall(_ == 0L), s"verbatim should miss mutated chrome: $verbatim")
    val norm = Boilerplate.removeBoilerplateNormalized(d, "doc_id", "text", window = 3, maxDf = 5L)
      .select("doc_id", "n_kept", "n_dropped", "cleaned_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(norm == (1 to 8).map { i =>
      val tag = ('a' + i - 1).toChar
      (i.toLong, 1L, 1L, s"body$tag stays here")
    })
  }

  test("normalized screen: case-folded chrome caps together, distinct bodies survive") {
    val d = Seq(
      (1L, "TERMS OF service body one filler"),
      (2L, "terms of Service body two filler"),
      (3L, "Terms Of SERVICE body three filler"),
      (4L, "unrelated text here body four filler")
    ).toDF("doc_id", "text")
    val out = Boilerplate.removeBoilerplateNormalized(d, "doc_id", "text", window = 3, maxDf = 2L)
      .select("doc_id", "n_kept", "n_dropped").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 1L, 1L), (2L, 1L, 1L), (3L, 1L, 1L), (4L, 2L, 0L)))
  }

  test("skewed fixture: one passage in 50% of docs is screened correctly (hot key never a join hot-spot)") {
    val n = 200
    val d = (1 to n).map { i =>
      val body = s"body$i unique$i content$i"
      (i.toLong, if (i % 2 == 0) s"copyright acme corp $body" else body)
    }.toDF("doc_id", "text")
    val out = Boilerplate.removeBoilerplate(d, "doc_id", "text", window = 3, maxDf = 10L)
      .select("doc_id", "n_kept", "n_dropped", "cleaned_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val want = (1 to n).map { i =>
      if (i % 2 == 0) (i.toLong, 1L, 1L, s"body$i unique$i content$i")
      else (i.toLong, 1L, 0L, s"body$i unique$i content$i")
    }
    assert(out == want)
  }
}
