package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}
import graft.operators.SemDedup

/** Streaming == batch equivalence for the semantic-dedup stored-index
  * probe: arrivals screened by [[EmbeddingStream.semDedupScreened]]
  * match [[SemDedup.probeIndex]] row for row against the same persisted
  * artifacts, with zero streaming state.
  */
class EmbeddingStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  lazy val watchDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("emb_stream")
    val copied = java.nio.file.Files.copy(
      java.nio.file.Paths.get(SparkTestSession.sf0001, "embeddings.parquet"),
      dir.resolve("embeddings.parquet"))
    copied.toFile.setWritable(true) // fixture perms are r--r--r--
    copied.toFile.deleteOnExit()
    dir.toFile.deleteOnExit()
    dir.toString
  }

  // The persisted artifacts: even-id half builds the index (q211's split).
  private lazy val emb = Tables.embeddings(spark, SparkTestSession.sf0001)
  private lazy val cents = SemDedup.centroidTable(
    emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding")
  private lazy val kept = SemDedup.keptCodes(
    emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
    centroidsOpt = Some(cents))

  test("streaming semantic-dedup screen equals the batch stored-index probe, zero state") {
    val schema = spark.read.parquet(watchDir).schema
    val stream = spark.readStream.schema(schema).parquet(watchDir)
      .filter(col("vec_id") % 2 === 1)
    val screened = EmbeddingStream.semDedupScreened(stream, kept, cents)
    val q = EventStream.runToMemory(screened, "emb_screened", OutputMode.Append())
    try {
      val streamed = spark.sql("SELECT * FROM emb_screened ORDER BY vec_id").collect()
      val batch = SemDedup.probeIndex(
        emb.filter(col("vec_id") % 2 === 1), kept, cents, "vec_id", "embedding")
        .orderBy("vec_id").collect()
      assert(streamed.length > 0 && streamed.sameElements(batch))
      // the screen genuinely splits arrivals both ways on the fixture
      assert(streamed.exists(_.getBoolean(3)) && streamed.exists(!_.getBoolean(3)))
      // row-local screen: nothing may register in the state store
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
    } finally q.stop()
  }

  test("over-cap index cell is a contract violation, not a tuning knob") {
    val schema = spark.read.parquet(watchDir).schema
    val stream = spark.readStream.schema(schema).parquet(watchDir)
    val e = intercept[IllegalArgumentException] {
      EmbeddingStream.semDedupScreened(
        stream, kept, cents, maxPlanVecsPerCell = 1)
    }
    assert(e.getMessage.contains("maxPlanVecsPerCell"))
  }

  test("an empty centroid table fails loudly instead of keeping every arrival") {
    // without the guard the fold assigns cell = -1 and keeps everything
    // while the batch twin emits no rows — the r16 ADVICE divergence
    val schema = spark.read.parquet(watchDir).schema
    val stream = spark.readStream.schema(schema).parquet(watchDir)
    val e = intercept[IllegalArgumentException] {
      EmbeddingStream.semDedupScreened(
        stream, kept, cents.filter(col("cell") < 0))
    }
    assert(e.getMessage.contains("empty centroid table"))
  }
}
