package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}
import graft.operators.Decontaminate

/** Streaming faces of the corpus-hygiene pair: exact content dedup
  * (q30's incremental twin) and benchmark decontamination (q63's). The
  * dedup test replays duplicates ACROSS micro-batches to prove the state
  * store carries first-seen hashes between batches; the decontamination
  * screen is zero-state by construction and must equal its batch twin.
  */
class StreamingHygieneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Write each row set as one parquet file inside a fresh watch dir, so
    * maxFilesPerTrigger=1 turns every file into its own micro-batch.
    */
  private def watchDirOf(batches: Seq[Seq[(Long, String)]]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stream_hygiene")
    dir.toFile.deleteOnExit()
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"stream_hyg_src$i")
      rows.toDF("doc_id", "text").coalesce(1).write
        .mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).head
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(part), dir.resolve(f"batch_$i%03d.parquet"))
    }
    dir.toString
  }

  test("streaming content dedup drops duplicates within AND across micro-batches") {
    val dirStr = watchDirOf(Seq(
      Seq((1L, "alpha text"), (2L, "beta text"), (3L, "gamma text"), (4L, "alpha text")),
      Seq((5L, "beta text"), (6L, "delta text"), (7L, "epsilon text"), (8L, "epsilon text"))))
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dirStr)
    val q = EventStream.runToMemory(
      DocumentStream.dedupedByContent(stream), "docs_dedup", OutputMode.Append())
    try {
      val rows = spark.sql("SELECT doc_id, text_sha FROM docs_dedup").collect()
      val shas = rows.map(_.getString(1))
      // 5 distinct texts -> exactly one survivor per content hash: the
      // in-batch dup (alpha), the cross-batch dup (beta), and the
      // same-batch pair (epsilon) are all collapsed.
      assert(shas.length == 5, s"got ${shas.length} rows: ${rows.mkString(", ")}")
      assert(shas.distinct.length == 5)
      // the dedup ran as keyed state, bounded by distinct hashes seen
      assert(q.lastProgress.stateOperators.nonEmpty)
    } finally q.stop()
  }

  test("streaming canonical dedup collapses punct/case/spacing mutations across batches") {
    val dirStr = watchDirOf(Seq(
      Seq((1L, "The cat sat, on the mat."), (2L, "delta text")),
      // raw-distinct mutations of doc 1 (the q220 tier's catch) + one
      // genuinely new doc
      Seq((3L, "the  cat sat on\tthe mat"), (4L, "THE CAT — SAT on the mat!!"),
        (5L, "the cat sat on the rug"))))
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dirStr)
    val q = EventStream.runToMemory(
      DocumentStream.dedupedByCanonical(stream), "docs_canon_dedup",
      OutputMode.Append())
    try {
      val got = spark.sql("SELECT doc_id, canon_sha FROM docs_canon_dedup")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      // 3 canonical classes survive: {1,3,4} collapse (raw sha would
      // keep all three), plus doc 2 and doc 5
      assert(got.map(_._1).toSet == Set(1L, 2L, 5L), got.mkString(", "))
      // stream keys equal the batch face's canonical keys exactly
      import spark.implicits._
      val batchKeys = graft.operators.Dedup.canonicalGroups(
          Seq((1L, "The cat sat, on the mat."), (2L, "delta text"),
            (5L, "the cat sat on the rug")).toDF("doc_id", "text"),
          "text", "doc_id")
        .collect().map(_.getString(0)).toSet
      assert(got.map(_._2).toSet == batchKeys)
    } finally q.stop()
  }

  test("streaming decontamination screen equals its batch twin (q63 semantics)") {
    val fixture = SparkTestSession.sf0001
    val all = Tables.documents(spark, fixture)
    val benchmark = all.filter(col("doc_id") % 10 === 0)

    // batch twin: the report-based filter q63 builds on
    val batchKept = Decontaminate
      .report(all.filter(col("doc_id") % 10 =!= 0), benchmark, "text", "doc_id")
      .filter(!col("contaminated"))
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val dir = java.nio.file.Files.createTempDirectory("docs_decon")
    dir.toFile.deleteOnExit()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(fixture, "documents.parquet"),
      dir.resolve("documents.parquet"))
    val stream = DocumentStream.readDocuments(spark, dir.toString, fixture)
      .filter(col("doc_id") % 10 =!= 0)
    val q = EventStream.runToMemory(
      DocumentStream.decontaminated(stream, benchmark), "docs_decon",
      OutputMode.Append())
    try {
      val streamedKept = spark.sql("SELECT doc_id FROM docs_decon")
        .collect().map(_.getLong(0)).toSet
      assert(streamedKept == batchKept)
      assert(streamedKept.nonEmpty && streamedKept.size < 1000)
      // zero-state screen: nothing may register in the state store
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
    } finally q.stop()
  }

  test("oversized benchmark gram set trips the plan-literal guard with a pointer to the batch path") {
    val fixture = SparkTestSession.sf0001
    val all = Tables.documents(spark, fixture)
    val ex = intercept[IllegalArgumentException] {
      DocumentStream.decontaminated(
        all.limit(50), all.filter(col("doc_id") % 10 === 0),
        n = 8, maxPlanGrams = 3)
    }
    assert(ex.getMessage.contains("maxPlanGrams"))
    assert(ex.getMessage.contains("Decontaminate.report"))
  }

  test("streaming bloom screen equals its batch twin (q105 semantics), zero state") {
    val fixture = SparkTestSession.sf0001
    val all = Tables.documents(spark, fixture)
    val keyed = all.select(col("doc_id"), md5(col("text").cast("binary")).as("key"))
    val blocklist = keyed.filter(col("doc_id") % 20 === 0).select("key")
    val words = graft.operators.BloomScreen.build(blocklist, "key", k = 3, m = 4096)

    // batch twin: the q105 probe over the same bitmap
    val batchFlagged = keyed
      .withColumn("maybe_blocked",
        graft.operators.BloomScreen.maybeContains(col("key"), words, 3, 4096))
      .filter(col("maybe_blocked"))
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val dir = java.nio.file.Files.createTempDirectory("docs_bloom")
    dir.toFile.deleteOnExit()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(fixture, "documents.parquet"),
      dir.resolve("documents.parquet"))
    val stream = DocumentStream.readDocuments(spark, dir.toString, fixture)
    val q = EventStream.runToMemory(
      DocumentStream.bloomScreened(stream, words, k = 3, m = 4096),
      "docs_bloom", OutputMode.Append())
    try {
      val streamedFlagged = spark
        .sql("SELECT doc_id FROM docs_bloom WHERE maybe_blocked")
        .collect().map(_.getLong(0)).toSet
      assert(streamedFlagged == batchFlagged)
      // every blocklisted doc is flagged (no false negatives)
      val blocked = all.filter(col("doc_id") % 20 === 0)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(blocked.subsetOf(streamedFlagged))
      // zero-state screen: nothing may register in the state store
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
    } finally q.stop()
  }
}
