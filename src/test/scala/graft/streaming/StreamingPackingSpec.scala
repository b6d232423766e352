package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}
import graft.operators.{Packing, TextAnalysis}

/** Streaming sequence packing must equal the batch contiguous layout when
  * the stream's arrival order matches the batch order key — including
  * bins that straddle a micro-batch boundary (the running total carried
  * in state is what makes the layouts line up).
  */
class StreamingPackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streaming packing equals the batch layout; state carries totals across micro-batches") {
    import spark.implicits._
    val fixture = SparkTestSession.sf0001
    val all = Tables.documents(spark, fixture).select("doc_id", "text", "source")

    // two micro-batches split on doc id, replayed one file per trigger:
    // per-source arrival order == ascending doc id == the batch order key
    val dir = java.nio.file.Files.createTempDirectory("stream_pack")
    dir.toFile.deleteOnExit()
    Seq(all.filter(col("doc_id") < 60), all.filter(col("doc_id") >= 60))
      .zipWithIndex.foreach { case (df, i) =>
        val tmp = java.nio.file.Files.createTempDirectory(s"stream_pack_src$i")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
          .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).head
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(part), dir.resolve(f"batch_$i%03d.parquet"))
      }

    val stream = spark.readStream.schema(all.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
    val q = EventStream.runToMemory(
      DocumentStream.packedBySource(stream, capacity = 512L).toDF(),
      "packed_docs", OutputMode.Append())
    try {
      val streamed = spark.sql(
          "SELECT doc_id, seq_tokens, bin_id, bin_offset FROM packed_docs")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      val batch = Packing.contiguousPack(
          all.withColumn("toks",
            TextAnalysis.tokenCount(col("text")).cast("long")),
          "source", "doc_id", "toks", capacity = 512L)
        .select("doc_id", "seq_tokens", "bin_id", "bin_offset")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
      // the second batch's first doc continues a bin the first batch
      // opened (not bin 0 offset 0 for every source) — state carried
      assert(q.lastProgress.stateOperators.nonEmpty)
    } finally q.stop()
  }
}
