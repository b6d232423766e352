package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.pipeline.{TraceConfig, TracePipeline}

/** CSV fan-out sinks (SURVEY.md §2 O12-O13).
  *
  * The reference writes two CSVs per run under `output/<runTs>/`: the full
  * processed set and a "long records" slice (`duration_ms >= 2650`,
  * main.js:225-255). Its literal code crashes (`writeTimestamp` undeclared —
  * B5, SURVEY.md §2.10); we implement the intent. Spark CSV cannot encode
  * arrays/maps/structs, so complex columns are serialized with `to_json`
  * first — the reference would have JSON.stringify'd them the same way
  * (main.js:117).
  *
  * Scale note: both sinks share one upstream plan. Callers persist the
  * transformed DataFrame once and run the two (cheap, filter-only) writes
  * against it, so the scan/dedup work is not recomputed per sink — the Spark
  * replacement for the reference's in-memory `recordsToWrite` barrier
  * (main.js:51,208-213).
  */
object CsvSinks {

  /** CSV cannot carry nested types: serialize arrays/maps/structs to JSON
    * strings, leave scalars untouched.
    */
  def flattenForCsv(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: ArrayType | _: MapType | _: StructType => to_json(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** O12: full CSV with header. */
  def writeFull(df: DataFrame, outDir: String): Unit =
    flattenForCsv(df).write
      .mode(SaveMode.Overwrite)
      .option("header", "true")
      .csv(outDir)

  /** O13: the "long records" slice — second sink over the same plan. */
  def writeLongSlice(df: DataFrame, cfg: TraceConfig, outDir: String): Unit =
    writeFull(TracePipeline.longSlice(df, cfg), outDir)

  /** Both sinks over one persisted plan (replaces the reference's barrier).
    * If the caller already persisted `df`, that cache is left untouched
    * (persist() on a cached DF returns the same instance — unpersisting
    * here would silently evict the caller's cache before its later sinks).
    */
  def fanOut(df: DataFrame, cfg: TraceConfig, fullDir: String, longDir: String): Unit = {
    val callerCached = df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val cached = if (callerCached) df else df.persist()
    try {
      writeFull(cached, fullDir)
      writeLongSlice(cached, cfg, longDir)
    } finally if (!callerCached) cached.unpersist()
  }
}
