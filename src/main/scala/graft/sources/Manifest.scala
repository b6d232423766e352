package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Rerun-skip manifest — the Spark-native replacement for the reference's
  * filename-keyed JSON cache (SURVEY.md §2 O10: `.raw.cache`/`.formated
  * .cache` probed by basename, main.js:80-103; plus O11's empty-file GC,
  * which atomic parquet commits make unnecessary).
  *
  * Instead of caching *data* per input file (Spark recomputation is cheap
  * and the caches were the source of bugs B2/B6), we record *which input
  * files a completed run has processed* in a small parquet manifest; the
  * next run subtracts them via `input_file_name()`. This preserves the
  * reference's operational semantic — reruns skip completed inputs — with
  * driver-side bookkeeping that is O(#files), not O(rows).
  */
object Manifest {

  private def manifestPath(dir: String) = s"$dir/processed"

  /** Paths already recorded as processed (empty on first run). */
  def processedPaths(spark: SparkSession, manifestDir: String): DataFrame = {
    val hPath = new org.apache.hadoop.fs.Path(manifestPath(manifestDir))
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(hPath))
      spark.read.parquet(manifestPath(manifestDir)).select("path").distinct()
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("path",
            org.apache.spark.sql.types.StringType))))
  }

  /** Restrict `df` (a file-backed DataFrame) to rows from files NOT yet in
    * the manifest: a broadcast anti-join on `input_file_name()` — the
    * manifest is tiny (one row per file) so the big side never shuffles.
    */
  def unprocessedOnly(df: DataFrame, manifestDir: String): DataFrame = {
    val done = processedPaths(df.sparkSession, manifestDir)
      .withColumnRenamed("path", "__done_path")
    df.withColumn("__path", input_file_name())
      .join(broadcast(done), col("__path") === col("__done_path"), "left_anti")
      .drop("__path")
  }

  /** Record the distinct source files of `df` as processed (append-only;
    * parquet commit is atomic, so a crashed run never records partially).
    * Already-recorded paths are subtracted first, so marking the full
    * input every run keeps the manifest O(#distinct files), not
    * O(runs x files) — and a run that processed nothing new appends
    * nothing.
    */
  def markProcessed(df: DataFrame, manifestDir: String): Unit = {
    val done = processedPaths(df.sparkSession, manifestDir)
      .withColumnRenamed("path", "__done_path")
    df.select(input_file_name().as("path")).distinct()
      .join(broadcast(done), col("path") === col("__done_path"), "left_anti")
      .coalesce(1)
      .write.mode(SaveMode.Append)
      .parquet(manifestPath(manifestDir))
  }
}
