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
}
