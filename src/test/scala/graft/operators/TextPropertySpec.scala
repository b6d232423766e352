package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Randomized batch properties for the round-3 text operators: one
  * DataFrame pass over many generated cases (per-case Spark jobs would be
  * seconds each), seeded so failures reproduce.
  */
class TextPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("tokenNgrams matches the scalar sliding model on 200 random token streams, n in 1..6") {
    val cases = (0 until 200).map { i =>
      val nToks = rnd.nextInt(31)
      val toks = Seq.fill(nToks)(rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString)
      (i.toLong, toks.mkString(" "), 1 + rnd.nextInt(6))
    }
    // expected: plain scalar sliding windows over the whitespace split.
    // NOTE no empty-filter: split("") == [""] in the JVM, Spark, AND the
    // DuckDB oracle (string_split_regex('') = ['']) — the one-empty-token
    // convention for empty text is engine-wide.
    val expected = cases.map { case (id, text, n) =>
      val toks = text.trim.split("\\s+").toSeq
      id -> (if (toks.length < n) Seq.empty[String]
             else toks.sliding(n).map(_.mkString(" ")).toSeq)
    }.toMap
    (1 to 6).foreach { n =>
      val sub = cases.filter(_._3 == n)
      val got = sub.map(c => (c._1, c._2)).toDF("id", "text")
        .select(col("id"),
          TextAnalysis.tokenNgrams(TextAnalysis.wsTokens(col("text")), n).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      sub.foreach { case (id, _, _) =>
        assert(got(id) == expected(id), s"case $id n=$n")
      }
    }
  }

  test("redactPii is idempotent and leaves no residual PII pattern matches (300 generated strings)") {
    def email() = s"${rnd.alphanumeric.take(5).mkString}+${rnd.nextInt(1000)}@ex${rnd.nextInt(10)}.example.com"
    def ip() = s"${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}"
    def phone() = s"+${1 + rnd.nextInt(9)}${Seq.fill(9)(rnd.nextInt(10)).mkString}"
    def words(k: Int) = Seq.fill(k)(rnd.alphanumeric.take(1 + rnd.nextInt(7)).mkString).mkString(" ")
    val cases = (0 until 300).map { i =>
      val parts = rnd.shuffle(Seq(words(3), email(), words(2), ip(), phone(), words(1)))
      (i.toLong, parts.take(2 + rnd.nextInt(5)).mkString(" "))
    }
    val out = cases.toDF("id", "text")
      .select(col("id"), TextAnalysis.redactPii(col("text")).as("r1"))
      .select(col("id"), col("r1"),
        TextAnalysis.redactPii(col("r1")).as("r2"),
        (regexp_count(col("r1"), lit(TextAnalysis.emailPattern)) +
          regexp_count(col("r1"), lit(TextAnalysis.ipv4Pattern)) +
          regexp_count(col("r1"), lit(TextAnalysis.phonePattern))).as("residual"))
      .collect()
    out.foreach { r =>
      assert(r.getString(1) == r.getString(2), s"not idempotent: ${r.getString(1)}")
      assert(r.getInt(3) == 0, s"residual PII in: ${r.getString(1)}")
    }
  }

  test("repetitionStats matches the scalar model on 150 random + crafted loop docs") {
    // Random token streams from a small vocab (forces real duplicate
    // grams) + crafted extremes: a pure loop, a no-repeat doc, and a
    // single-token doc (no gram positions -> fracs 0.0 by contract).
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "fff", "g", "hh")
    val cases = (0 until 150).map { i =>
      val n = 1 + rnd.nextInt(40)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    } ++ Seq(
      (900L, Seq.fill(12)("spam ham").mkString(" ")), // pure loop
      (901L, (1 to 9).map(k => s"w$k").mkString(" ")), // all-unique
      (902L, "solo"))                                  // no gram positions
    val topMax = 0.5
    val d3Max = 0.25
    val expected = cases.map { case (id, text) =>
      val t = text.trim.split("\\s+").toSeq
      val n = t.length.toLong
      val top = if (t.isEmpty) 0L else t.groupBy(identity).map(_._2.size).max.toLong
      def mass(g: Int) =
        if (t.length < g) 0L
        else t.sliding(g).map(_.mkString(" ")).toSeq
          .groupBy(identity).values.map(_.size.toLong).filter(_ >= 2L).sum
      val (m2, m3) = (mass(2), mass(3))
      def frac(num: Long, den: Long) = if (den > 0) num.toDouble / den else 0.0
      val twf = frac(top, n)
      val d3f = frac(m3, n - 2)
      id -> ((n, top, m2, m3, twf, frac(m2, n - 1), d3f,
        twf <= topMax && d3f <= d3Max))
    }.toMap
    val got = TextAnalysis.repetitionStats(
        cases.toDF("doc_id", "text"), "doc_id", "text",
        topWordMax = topMax, dup3Max = d3Max)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getBoolean(8))))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, want) =>
      assert(got(id) == want, s"doc $id: got ${got(id)}, want $want")
    }
    // The crafted extremes must land on the intended sides of the screen.
    assert(!got(900L)._8, "pure loop must be rejected")
    assert(got(901L)._8, "all-unique doc must pass")
    assert(got(902L) == ((1L, 1L, 0L, 0L, 1.0, 0.0, 0.0, false)),
      "single-token doc: top_word_frac 1.0, gram fracs 0.0 by contract")
    // The row-local expression form (the streaming face) must equal the
    // shuffle form row for row — same columns, same values.
    val rowLocal = TextAnalysis.repetitionStatsRowLocal(
        cases.toDF("doc_id", "text"), "doc_id", "text",
        topWordMax = topMax, dup3Max = d3Max)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getBoolean(8))))
      .toMap
    assert(rowLocal == got, "row-local form diverges from shuffle form")
    // The GATE form (the composition face streams use) must keep
    // exactly the keep=true ids and leave caller columns untouched.
    val gated = TextAnalysis.repetitionGate(
        cases.toDF("doc_id", "text"), "text",
        topWordMax = topMax, dup3Max = d3Max)
    assert(gated.columns.toSeq == Seq("doc_id", "text"))
    assert(gated.collect().map(_.getLong(0)).toSet ==
      got.filter(_._2._8).keySet, "gate diverges from the stats verdict")
  }

  test("canonicalTextKey: invariant under case/punct/spacing mutations, split by word changes (120 random docs)") {
    val rnd = new scala.util.Random(7)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    def doc(): String =
      Seq.fill(3 + rnd.nextInt(10))(words(rnd.nextInt(words.size))).mkString(" ")
    def mutate(s: String): String = {
      // case flips, injected punctuation, and whitespace churn — the
      // mutation classes the canonical key must erase
      val cased = s.map(c => if (rnd.nextBoolean()) c.toUpper else c)
      val punct = cased.flatMap { c =>
        if (c == ' ' && rnd.nextInt(4) == 0) ",  " else c.toString
      }
      "  " + punct.replace(" ", if (rnd.nextBoolean()) "\t" else "  ") + "!"
    }
    val base = (1 to 120).map(i => (i.toLong, doc()))
    val rows = base.flatMap { case (id, t) =>
      Seq((id * 10, t), (id * 10 + 1, mutate(t)))
    }
    val keys = rows.toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.canonicalTextKey(col("text")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    base.foreach { case (id, t) =>
      assert(keys(id * 10) == keys(id * 10 + 1),
        s"mutation of doc $id changed the canonical key: '$t'")
    }
    // distinct word sequences keep distinct keys
    val byText = base.groupBy(_._2).map { case (t, g) => t -> keys(g.head._1 * 10) }
    assert(byText.values.toSeq.distinct.size == byText.size,
      "distinct texts collided on the canonical key")
  }
}
