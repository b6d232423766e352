package graft.streaming

import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.Dedup

/** Incremental MinHash-LSH: the streaming pair stream over replayed
  * micro-batches must equal the batch band join over the union — including
  * pairs whose two members arrived in DIFFERENT micro-batches (the whole
  * point of keeping bucket membership in state).
  */
class StreamingLshSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val batch1 = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta"),
    (3L, "one two three four five six seven eight"))
  private val batch2 = Seq(
    (4L, "alpha beta gamma delta epsilon zeta eta theta"),
    (5L, "completely different vocabulary nine ten eleven twelve"))

  private def watchDirOf(batches: Seq[Seq[(Long, String)]]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stream_lsh")
    dir.toFile.deleteOnExit()
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"stream_lsh_src$i")
      rows.toDF("doc_id", "text").coalesce(1).write
        .mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).head
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(part), dir.resolve(f"batch_$i%03d.parquet"))
    }
    dir.toString
  }

  test("narrow band keys equal the batch explode+groupBy signatures") {
    import spark.implicits._
    val docs = (batch1 ++ batch2).toDF("doc_id", "text")
    val narrow = DocumentStream.bandKeys(docs, 16, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    // batch signatures -> the same band-key rendering
    val sigs = Dedup.minhashSignatures(docs, "text", "doc_id", 16)
    val fromBatch = sigs.selectExpr(
        "doc_id",
        "concat_ws('_', mh0, mh1, mh2, mh3, mh4, mh5, mh6, mh7) AS k0",
        "concat_ws('_', mh8, mh9, mh10, mh11, mh12, mh13, mh14, mh15) AS k1")
      .collect().flatMap(r =>
        Seq((r.getLong(0), 0, r.getString(1)), (r.getLong(0), 1, r.getString(2)))).toSet
    assert(narrow == fromBatch)
  }

  test("streaming LSH pairs across micro-batches equal the batch band join on the union") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val dirStr = watchDirOf(Seq(batch1, batch2))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dirStr)
    val q = EventStream.runToMemory(
      DocumentStream.lshPairsStream(spark, stream).toDF(), "lsh_pairs",
      OutputMode.Append())
    try {
      val streamed = spark.sql("SELECT doc_a, doc_b FROM lsh_pairs")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val union = (batch1 ++ batch2).toDF("doc_id", "text")
      val batchPairs = Dedup.lshCandidatePairs(
          Dedup.minhashSignatures(union, "text", "doc_id", 16), "doc_id", 16, 2)
        .select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batchPairs)
      // the cross-batch pairs are present — the state actually carried
      assert(streamed.contains((1L, 4L)) && streamed.contains((2L, 4L)))
      assert(q.lastProgress.stateOperators.nonEmpty)
    } finally q.stop()
  }

  test("star-capped streaming pairs preserve components while emitting one edge per over-cap arrival") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val dirStr = watchDirOf(Seq(batch1, batch2))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dirStr)
    // cap 2: docs 1/2/4 share identical text, so their bucket reaches the
    // cap at doc 2 and doc 4 arrives over-cap in a LATER micro-batch
    val q = EventStream.runToMemory(
      DocumentStream.lshPairsStreamStarCapped(
        spark, stream, maxBucket = 2).toDF(), "lsh_star_pairs",
      OutputMode.Append())
    try {
      val streamed = spark.sql("SELECT doc_a, doc_b FROM lsh_star_pairs")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // the over-cap arrival attached to the hub only — the (2,4) edge
      // lshPairsStream would emit is the one star mode saves
      assert(streamed.contains((1L, 2L)) && streamed.contains((1L, 4L)))
      assert(!streamed.contains((2L, 4L)))
      // component equality with the batch UNCAPPED band join on the union
      val union = (batch1 ++ batch2).toDF("doc_id", "text")
      val batchPairs = Dedup.lshCandidatePairs(
        Dedup.minhashSignatures(union, "text", "doc_id", 16), "doc_id", 16, 2)
      val batchComps = graft.operators.Components.connectedComponents(
          batchPairs, numPartitions = Some(2))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val streamEdges = spark.sql(
        "SELECT DISTINCT doc_a, doc_b FROM lsh_star_pairs")
      val streamComps = graft.operators.Components.connectedComponents(
          streamEdges, numPartitions = Some(2))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamComps == batchComps && batchComps.nonEmpty)
    } finally q.stop()
  }
}
