package graft.operators

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Ground truth for the round-8 audit trio: label centroids (exact
  * scaled-integer accumulation), source distribution drift (integer
  * TV numerator), and the content-hash snapshot diff.
  */
class CentroidDriftDiffSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("labelCentroids: exact means/variances on a hand fixture; one exchange") {
    val df = Seq(
      (0, Seq(1.0f, -2.0f)),
      (0, Seq(3.0f, 2.0f)),
      (1, Seq(0.5f, 0.0f))
    ).toDF("label", "embedding")
    val got = Similarity.labelCentroids(df, "label", "embedding")
      .as[(Int, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // label 0 dim 0: mean (1+3)/2 = 2, var E[x^2]-m^2 = (1+9)/2 - 4 = 1
    assert(got((0, 0L)) == ((2L, 2.0, 1.0)))
    // label 0 dim 1: mean 0, var (4+4)/2 - 0 = 4
    assert(got((0, 1L)) == ((2L, 0.0, 4.0)))
    assert(got((1, 0L)) == ((1L, 0.5, 0.0)))
    assert(got((1, 1L)) == ((1L, 0.0, 0.0)))
    val plan = Similarity.labelCentroids(df, "label", "embedding")
      .queryExecution.explainString(FormattedMode)
    val exchanges = plan.sliding("Exchange (".length).count(_ == "Exchange (")
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  test("labelCentroids: variance is nonnegative on random floats") {
    val rnd = new scala.util.Random(5)
    val df = (1 to 200).map(i =>
      (i % 4, Seq.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("label", "embedding")
    val vs = Similarity.labelCentroids(df, "label", "embedding")
      .select("variance").as[Double].collect()
    assert(vs.forall(_ >= -1e-12), vs.min.toString)
  }

  test("sourceDrift: scalar model; identical-distribution source drifts zero") {
    // s1 and s2 have IDENTICAL token distributions; s3 is disjoint
    val df = Seq(
      ("s1", "a a b"), ("s2", "a a b"),
      ("s3", "z z z")).toDF("source", "text")
    val got = CorpusStats.sourceDrift(df, "source", "text")
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // corpus: a:4 b:2 z:3, N=9
    // s1 (Ns=3): tv = 0.5*(|2/3-4/9| + |1/3-2/9| + |0-3/9|) = 0.5*(2/9+1/9+3/9) = 1/3
    assert(got("s1")._1 == 3L)
    assert(math.abs(got("s1")._2 - 1.0 / 3.0) < 1e-12)
    assert(got("s2") == got("s1"))
    // s3: tv = 0.5*(|1-3/9| + 4/9 + 2/9) = 0.5*(6/9+6/9) = 2/3
    assert(math.abs(got("s3")._2 - 2.0 / 3.0) < 1e-12)
    // bounds: tv in [0, 1] on a random corpus
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d")
    val big = (1 to 100).map(i => (s"src${i % 5}",
      Seq.fill(1 + rnd.nextInt(9))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      .toDF("source", "text")
    val tvs = CorpusStats.sourceDrift(big, "source", "text")
      .select("tv_distance").as[Double].collect()
    assert(tvs.forall(t => t >= 0.0 && t <= 1.0))
  }

  test("snapshot diff: all four statuses; hashes compare content not identity") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("doc_id", "text")
    val b = Seq((1L, "x"), (2L, "y2"), (4L, "w")).toDF("doc_id", "text")
    val got = SnapshotDiff.diff(a, b, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    val s = SnapshotDiff.summary(a, b, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    assert(s == Map("unchanged" -> 1L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }
}
