package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Reader/writer for the reference's JSON record-cache format (SURVEY.md
  * §2 O9/O10: 10,000-row chunk files with every int64 serialized as a
  * STRING — `main.js:108-121,180-194` round-trips BigInt through strings
  * because JSON numbers are doubles and ns-precision timestamps do not
  * survive 2^53).
  *
  * The engine's own rerun story is [[Manifest]] (skip whole files, never
  * cache rows) — this source exists for MIGRATION parity: a user holding
  * warm `.raw.cache/`/`.formated.cache/` directories can read them
  * directly into a DataFrame with exact int64 values restored.
  *
  * Format notes: the reference writes one JSON ARRAY per chunk file; Spark
  * natively writes newline-delimited JSON. [[read]] accepts both (the
  * `arrayPerFile` flag switches the parser's multiLine mode); [[write]]
  * produces NDJSON chunks — Spark-native, splittable, and what [[read]]
  * defaults to. Array-per-file output is deliberately NOT reproduced: a
  * multi-MB single JSON value cannot be split across tasks, which is the
  * kind of format decision that dies at 100 TB.
  */
object JsonCache {

  /** Write `df` as BigInt-safe NDJSON chunks: every LongType column is
    * stringified (the reference's own convention) so a JSON round-trip is
    * exact; `chunkRows` bounds rows per output file like the reference's
    * `chunkArray(records, 10000)`.
    */
  def write(df: DataFrame, dir: String, chunkRows: Int = 10000): Unit = {
    val cols = df.schema.fields.toIndexedSeq.map { f =>
      f.dataType match {
        case LongType => col(f.name).cast(StringType).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols: _*)
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", chunkRows.toString)
      .json(dir)
  }

  /** Read cache chunks back into `target`'s shape. Top-level LongType
    * fields parse as STRINGS first and cast back (matching [[write]]'s
    * stringification — the reference's BigInt-as-string convention; this
    * also accepts raw JSON numbers, which coerce to string then cast
    * losslessly via Jackson's integer lexing). Every other field keeps
    * its target type in the parse schema, so nested arrays/structs read
    * natively — flattening THEM to string would make the cast back fail
    * at analysis. Exactness is guaranteed for top-level integral
    * columns; a Long nested inside a struct rides as a JSON number.
    *
    * @param arrayPerFile true for the reference's one-JSON-array-per-file
    *        chunks; false (default) for NDJSON as [[write]] produces.
    */
  def read(
      spark: SparkSession,
      dir: String,
      target: StructType,
      arrayPerFile: Boolean = false): DataFrame = {
    val parseSchema = StructType(target.fields.map { f =>
      if (f.dataType == LongType) f.copy(dataType = StringType) else f
    })
    val raw = spark.read
      .option("multiLine", arrayPerFile.toString)
      .schema(parseSchema)
      .json(s"$dir/*.json")
    raw.select(target.fields.toIndexedSeq.map { f =>
      col(f.name).cast(f.dataType).as(f.name)
    }: _*)
  }
}
