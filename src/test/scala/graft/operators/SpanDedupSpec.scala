package graft.operators

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Ground truth and plan shape for [[SpanDedup]]: stride-1 windows, the
  * cross-doc (>= 2 distinct docs) duplicate rule, gaps-and-islands span
  * merging (overlapping AND touching windows coalesce), full-coverage
  * removal, and an equi-only plan — never a cartesian.
  */
class SpanDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val W = 3
  private val docs = Seq(
    (1L, "a b c d e f g h"),      // shares "a b c d e" with doc 2
    (2L, "z z a b c d e q"),
    (3L, "m n o p"),              // nothing shared
    (4L, "a b c x x x q r s"),    // two DISJOINT shared spans
    (5L, "q r s y y a b c"),
    (6L, "hi")                    // shorter than one window
  ).toDF("doc_id", "text")

  /** Scalar model: windows, cross-doc dup set, island merge, coverage. */
  private def model(corpus: Seq[(Long, String)], w: Int) = {
    val wins = corpus.flatMap { case (id, t) =>
      t.trim.split("\\s+").sliding(w).zipWithIndex
        .collect { case (win, i) if win.length == w => (id, i, win.mkString(" ")) }
    }
    val dup = wins.groupBy(_._3)
      .filter(_._2.map(_._1).distinct.size >= 2).keySet
    val spans = wins.filter(h => dup(h._3))
      .groupBy(_._1).view.mapValues { hs =>
        hs.map(_._2).sorted.foldLeft(Vector.empty[(Int, Int, Long)]) {
          case (acc :+ ((s, e, n)), i) if i <= e => acc :+ ((s, i + w, n + 1))
          case (acc, i) => acc :+ ((i, i + w, 1L))
        }
      }.toMap
    val cleaned = corpus.map { case (id, t) =>
      val tk = t.trim.split("\\s+")
      val sp = spans.getOrElse(id, Vector.empty)
      val kept = tk.zipWithIndex.collect {
        case (tok, p) if !sp.exists(s => p >= s._1 && p < s._2) => tok
      }
      (id, tk.length.toLong, (tk.length - kept.length).toLong, kept.mkString(" "))
    }
    (spans, cleaned)
  }

  test("dupSpans: cross-doc windows merge into maximal spans; disjoint spans stay separate") {
    val got = SpanDedup.dupSpans(docs, "doc_id", "text", W)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 0L, 5L, 3L),           // "a b c d e": windows 0,1,2 merged
      (2L, 2L, 7L, 3L),
      (4L, 0L, 3L, 1L), (4L, 6L, 9L, 1L),
      (5L, 0L, 3L, 1L), (5L, 5L, 8L, 1L)))
  }

  test("touching (non-overlapping) duplicated windows coalesce into one span") {
    // "a b c" and "d e f" both shared, adjacent in doc 1: [0,3)+[3,6) -> [0,6)
    val d = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c z z z"),
      (3L, "y y d e f y")).toDF("doc_id", "text")
    val got = SpanDedup.dupSpans(d, "doc_id", "text", W)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 0L, 6L, 2L),
      (2L, 0L, 3L, 1L),
      (3L, 2L, 5L, 1L)))
  }

  test("a window repeated only WITHIN one doc is not a duplicate") {
    val d = Seq(
      (1L, "a b c z a b c"),      // "a b c" twice, same doc
      (2L, "q r s t u")).toDF("doc_id", "text")
    assert(SpanDedup.dupSpans(d, "doc_id", "text", W).count() == 0L)
  }

  test("removeDupSpans: all docs reported, coverage cut, untouched docs verbatim") {
    val got = SpanDedup.removeDupSpans(docs, "doc_id", "text", W)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 8L, 5L, "f g h"),
      (2L, 8L, 5L, "z z q"),
      (3L, 4L, 0L, "m n o p"),
      (4L, 9L, 6L, "x x x"),
      (5L, 8L, 6L, "y y"),
      (6L, 1L, 0L, "hi")))
  }

  test("randomized: dupSpans + removeDupSpans equal the scalar model") {
    val rnd = new scala.util.Random(23)
    val vocab = Vector("a", "b", "c", "d", "e")
    val corpus = (1L to 50L).map(i =>
      (i, Seq.fill(1 + rnd.nextInt(14))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val (wantSpans, wantClean) = model(corpus, W)
    val df = corpus.toDF("doc_id", "text")
    val gotSpans = SpanDedup.dupSpans(df, "doc_id", "text", W)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(s => (s._2.toInt, s._3.toInt, s._4)).sorted.toVector).toMap
    assert(gotSpans == wantSpans.filter(_._2.nonEmpty))
    val gotClean = SpanDedup.removeDupSpans(df, "doc_id", "text", W)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(gotClean == wantClean.sortBy(_._1))
  }

  test("plan: equi-joins only — no cartesian, no broadcast nested loop") {
    val plan = SpanDedup.removeDupSpans(docs, "doc_id", "text", W)
      .queryExecution.explainString(FormattedMode)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
