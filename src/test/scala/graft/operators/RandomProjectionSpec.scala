package graft.operators

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Ground truth for [[RandomProjection]]: the projection equals a scalar
  * sign-walk model, is exactly linear on 2^-30-lattice inputs (where the
  * floor shift is lossless), fails fast on width mismatch, and plans as
  * a pure narrow projection.
  */
class RandomProjectionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val InD = 6
  private val OutD = 3

  private def model(v: Array[Float]): Seq[Long] = {
    val s = RandomProjection.signs(InD, OutD)
    val iv = v.map(x => math.floor(x.toDouble * RandomProjection.Shift).toLong)
    (0 until OutD).map(k =>
      iv.indices.map(j => s(k)(j) * iv(j)).sum)
  }

  private val vecs: Seq[(Long, Array[Float])] = Seq(
    (1L, Array(1.0f, -2.5f, 0.25f, 3.75f, -0.125f, 2.0f)),
    (2L, Array.fill(InD)(0.0f)),
    (3L, Array.tabulate(InD)(j => (math.sin(j * 2.7) * 3).toFloat)))

  test("project equals the scalar sign-walk model; zero vector projects to zeros") {
    val got = RandomProjection.project(
        vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", InD, OutD)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val want = vecs.sortBy(_._1).map { case (id, v) =>
      val p = model(v); (id, p(0), p(1), p(2))
    }
    assert(got == want)
    assert(got.find(_._1 == 2L).get == ((2L, 0L, 0L, 0L)))
    // the sign matrix is genuinely mixed (not all +1 / all -1)
    val s = RandomProjection.signs(InD, OutD).flatten
    assert(s.contains(1) && s.contains(-1))
  }

  test("projection is exactly linear on the 2^-30 lattice") {
    // values representable as k/2^8 widen and floor-shift losslessly,
    // so project(a + b) == project(a) + project(b) EXACTLY
    val a = Array(1.0f, -2.5f, 0.25f, 3.75f, -0.125f, 2.0f)
    val b = Array(0.5f, 1.25f, -0.75f, -1.5f, 2.25f, -3.0f)
    val sum = a.zip(b).map { case (x, y) => x + y }
    val df = Seq((1L, a), (2L, b), (3L, sum)).toDF("vec_id", "embedding")
    val p = RandomProjection.project(df, "vec_id", "embedding", InD, OutD)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    (1 to 3).foreach { k =>
      assert(p(0).productElement(k).asInstanceOf[Long] +
        p(1).productElement(k).asInstanceOf[Long] ==
        p(2).productElement(k).asInstanceOf[Long], s"dim $k not linear")
    }
  }

  test("width mismatch raises instead of projecting nulls") {
    val bad = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      RandomProjection.project(bad, "vec_id", "embedding", InD, OutD).collect()
    }
    assert(e.getMessage != null)
  }

  test("two-stage projected retrieval degenerates to brute force when the shortlist covers the corpus") {
    val e = graft.Tables.embeddings(spark, SparkTestSession.sf0001)
    val q = e.filter(org.apache.spark.sql.functions.col("vec_id") < 4)
    val exact = Similarity.cosineTopK(e, q, "vec_id", "embedding", k = 5)
    val full = RandomProjection.twoStageTopKProjected(
      e, q, "vec_id", "embedding",
      k = 5, shortlist = 499, inDim = 64, outDim = 8)
    val rec = Similarity.topKRecall(exact, full)
      .as[(Long, Long, Long, Double)].collect()
    assert(rec.length == 4)
    rec.foreach { case (qid, _, _, r) => assert(r == 1.0, s"q $qid recall $r") }
    // and the narrow shortlist is a genuine operating point below 1.0
    // on this fixture (the coarse 8-dim representation is lossy)
    val narrow = Similarity.topKRecall(exact,
      RandomProjection.twoStageTopKProjected(
        e, q, "vec_id", "embedding",
        k = 5, shortlist = 20, inDim = 64, outDim = 8))
      .as[(Long, Long, Long, Double)].collect()
    assert(narrow.exists(_._4 < 1.0))
  }

  test("plan: pure narrow projection — no join, no exchange, one transform evaluation") {
    // the parquet fixture: a local Seq relation constant-folds to a
    // LocalTableScan and there would be no plan to inspect
    val p = RandomProjection.project(
        graft.Tables.embeddings(spark, SparkTestSession.sf0001),
        "vec_id", "embedding", inDim = 64, outDim = 8)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Exchange"), p)
    // CollapseProject must NOT inline the iv transform into every
    // output column — one evaluation per row, then codegen'd ±chains
    val n = p.sliding("transform(".length).count(_ == "transform(")
    assert(n == 1, s"iv transform appears $n times:\n$p")
  }
}
