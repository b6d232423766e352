package graft.streaming

import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Streaming == batch equivalence for the text-curation stack: the narrow
  * quality/redaction/chunking operators produce bit-identical output
  * whether the corpus arrives as one batch or as a replayed file stream.
  */
class DocumentStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  lazy val watchDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("docs_stream")
    val copied = java.nio.file.Files.copy(
      java.nio.file.Paths.get(SparkTestSession.sf0001, "documents.parquet"),
      dir.resolve("documents.parquet"))
    copied.toFile.setWritable(true) // fixture perms are r--r--r--
    copied.toFile.deleteOnExit()
    dir.toFile.deleteOnExit()
    dir.toString
  }

  test("streaming curation (quality floor + redaction) equals its batch twin") {
    val stream = DocumentStream.readDocuments(spark, watchDir, SparkTestSession.sf0001)
    val q = EventStream.runToMemory(
      DocumentStream.curated(stream), "docs_curated", OutputMode.Append())
    try {
      val streamed = spark.sql("SELECT * FROM docs_curated ORDER BY doc_id").collect()
      val batch = DocumentStream.curated(
        Tables.documents(spark, SparkTestSession.sf0001))
        .orderBy("doc_id").collect()
      assert(streamed.length > 0 && streamed.sameElements(batch))
    } finally q.stop()
  }

  test("streaming boilerplate screen against a static cap set equals the batch twin, zero state") {
    import org.apache.spark.sql.functions._
    val window = 3
    val maxDf = 5L
    val batchDocs = Tables.documents(spark, SparkTestSession.sf0001)
    // The production refresh job: over-cap passages from the served corpus.
    val capSet = graft.operators.Boilerplate
      .passages(batchDocs, "doc_id", "text", window)
      .groupBy("passage").agg(countDistinct("doc_id").as("pdf"))
      .filter(col("pdf") > maxDf).select("passage")
    val stream = DocumentStream.readDocuments(spark, watchDir, SparkTestSession.sf0001)
    val screened = DocumentStream.boilerplateScreened(stream, capSet, window)
    val q = EventStream.runToMemory(screened, "docs_screened", OutputMode.Append())
    try {
      val streamed = spark.sql("SELECT * FROM docs_screened ORDER BY doc_id").collect()
      val batch = graft.operators.Boilerplate
        .removeBoilerplate(batchDocs, "doc_id", "text", window, maxDf)
        .orderBy("doc_id").collect()
      assert(streamed.length > 0 && streamed.sameElements(batch))
      // row-local screen: nothing may register in the state store
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
    } finally q.stop()
  }

  test("streaming repetition screen equals the batch twin, zero state") {
    import org.apache.spark.sql.functions._
    val (topMax, d3Max) =
      (graft.queries.TextQueries.RepTopWordMax, graft.queries.TextQueries.RepDup3Max)
    val stream = DocumentStream.readDocuments(spark, watchDir, SparkTestSession.sf0001)
    val screened = DocumentStream.repetitionScreened(stream, topMax, d3Max)
    val q = EventStream.runToMemory(screened, "docs_rep", OutputMode.Append())
    try {
      val streamed = spark.sql("SELECT * FROM docs_rep ORDER BY doc_id").collect()
      val batch = graft.operators.TextAnalysis.repetitionStats(
          Tables.documents(spark, SparkTestSession.sf0001),
          "doc_id", "text", topMax, d3Max)
        .orderBy("doc_id").collect()
      assert(streamed.length > 0 && streamed.sameElements(batch))
      // doc-local screen: nothing may register in the state store
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
    } finally q.stop()
  }

  test("streaming NORMALIZED boilerplate screen (hashed cap keys) equals the batch twin, zero state") {
    import org.apache.spark.sql.functions._
    val window = 3
    val maxDf = 5L
    val batchDocs = Tables.documents(spark, SparkTestSession.sf0001)
    graft.functions.GraftFunctions.register(spark)
    val capKeys = graft.operators.Boilerplate
      .passages(batchDocs, "doc_id", "text", window)
      .select(col("doc_id"),
        graft.operators.Boilerplate.normalizedKey(col("passage")).as("key"))
      .groupBy("key").agg(countDistinct("doc_id").as("pdf"))
      .filter(col("pdf") > maxDf).select("key")
    val stream = DocumentStream.readDocuments(spark, watchDir, SparkTestSession.sf0001)
    val screened = DocumentStream.boilerplateScreenedNormalized(stream, capKeys, window)
    val q = EventStream.runToMemory(screened, "docs_screened_norm", OutputMode.Append())
    try {
      val streamed = spark.sql("SELECT * FROM docs_screened_norm ORDER BY doc_id").collect()
      val batch = graft.operators.Boilerplate
        .removeBoilerplateNormalized(batchDocs, "doc_id", "text", window, maxDf)
        .orderBy("doc_id").collect()
      assert(streamed.length > 0 && streamed.sameElements(batch))
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
    } finally q.stop()
  }

  test("streaming chunk explosion equals its batch twin and keeps append-mode statelessness") {
    val stream = DocumentStream.readDocuments(spark, watchDir, SparkTestSession.sf0001)
    val chunks = DocumentStream.curatedChunks(stream)
    val q = EventStream.runToMemory(chunks, "docs_chunks", OutputMode.Append())
    try {
      val streamed =
        spark.sql("SELECT * FROM docs_chunks ORDER BY doc_id, chunk_idx").collect()
      val batch = DocumentStream.curatedChunks(
        Tables.documents(spark, SparkTestSession.sf0001))
        .orderBy("doc_id", "chunk_idx").collect()
      assert(streamed.length > 0 && streamed.sameElements(batch))
      // the whole path is narrow: nothing may register in the state store
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
    } finally q.stop()
  }
}
