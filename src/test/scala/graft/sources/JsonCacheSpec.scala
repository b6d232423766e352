package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Reference JSON-cache parity: BigInt-as-string round trip (exact int64,
  * including values that do not survive a double), chunked output, and
  * reading the reference's one-array-per-file chunk format.
  */
class JsonCacheSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("ns-precision longs survive the JSON round trip exactly") {
    // 2^53 = 9007199254740992: these ns timestamps lose precision as JSON
    // numbers — the string convention is the whole point (main.js:117-119).
    val df = Seq(
      (1700000000123456789L, 1700000000123456790L, "a"),
      (9007199254740993L, -9007199254740993L, null.asInstanceOf[String])
    ).toDF("start_time", "end_time", "tag")
    val dir = Files.createTempDirectory("jcache").toString
    JsonCache.write(df, dir, chunkRows = 1)
    val back = JsonCache.read(spark, dir, df.schema)
    // names+types restored (nullability is JSON-source true, as expected)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val rows = back.collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(got == Set(
      (1700000000123456789L, 1700000000123456790L, Some("a")),
      (9007199254740993L, -9007199254740993L, None)))
    // chunkRows=1 -> one file per row
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".json")) == 2)
  }

  test("reads the reference's array-per-file cache chunks (BigInt as string)") {
    val dir = Files.createTempDirectory("refcache")
    Files.writeString(dir.resolve("input.0.json"),
      """[{"start_time":"1700000000123456789","duration_ms":"2100","tag":"x"},
        | {"start_time":"1700000000123456790","duration_ms":null,"tag":"y"}]""".stripMargin)
    Files.writeString(dir.resolve("input.1.json"),
      """[{"start_time":"42","duration_ms":"2650","tag":"z"}]""")
    val target = StructType(Seq(
      StructField("start_time", LongType),
      StructField("duration_ms", LongType),
      StructField("tag", StringType)))
    val back = JsonCache.read(spark, dir.toString, target, arrayPerFile = true)
    assert(back.count() == 3)
    assert(back.filter(col("start_time") === 1700000000123456789L).count() == 1)
    assert(back.filter(col("duration_ms").isNull).count() == 1)
  }

  test("nested array columns round-trip (only top-level longs stringify)") {
    val df = Seq(
      (1L, Seq("a", "b"), 2.5),
      (9007199254740993L, Seq.empty[String], -0.5)
    ).toDF("id", "tags", "score")
    val dir = Files.createTempDirectory("nestedcache").toString
    JsonCache.write(df, dir)
    val back = JsonCache.read(spark, dir, df.schema)
      .collect().map(r => (r.getLong(0), r.getSeq[String](1), r.getDouble(2))).toSet
    assert(back == Set(
      (1L, Seq("a", "b"), 2.5),
      (9007199254740993L, Seq.empty[String], -0.5)))
  }

  test("a malformed cache chunk degrades to null rows; good chunks survive") {
    // mirrors the reference's O3 tolerance posture: one bad file must not
    // kill the run (its empty-file GC exists because crashes left bad
    // chunks behind). Spark's PERMISSIVE JSON mode nulls the bad record.
    val dir = Files.createTempDirectory("badcache")
    Files.writeString(dir.resolve("good.0.json"),
      """[{"start_time":"1","tag":"ok"}]""")
    Files.writeString(dir.resolve("bad.0.json"), """[{"start_time": TRUNC""")
    val target = StructType(Seq(
      StructField("start_time", LongType),
      StructField("tag", StringType)))
    val back = JsonCache.read(spark, dir.toString, target, arrayPerFile = true).collect()
    assert(back.exists(r => !r.isNullAt(0) && r.getLong(0) == 1L && r.getString(1) == "ok"))
    assert(back.forall(r => r.isNullAt(0) || r.getLong(0) == 1L)) // bad file -> nulls only
  }
}
