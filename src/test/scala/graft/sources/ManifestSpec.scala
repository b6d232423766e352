package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Rerun-skip manifest (O10 parity intent — without the reference's cache
  * bugs B2/B6: a warm rerun must yield the SAME data, minus already-done
  * files, never a truncated one).
  */
class ManifestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("unprocessed-only subtracts manifested files; rerun after marking skips everything") {
    val inDir = Files.createTempDirectory("manifest_in").toString
    val mDir = Files.createTempDirectory("manifest_meta").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
      .write.parquet(s"$inDir/f1.parquet")
    Seq((3L, "c")).toDF("id", "v").coalesce(1)
      .write.parquet(s"$inDir/f2.parquet")

    def input = spark.read.parquet(s"$inDir/*")

    // first run: nothing manifested -> all rows
    val first = Manifest.unprocessedOnly(input, mDir)
    assert(first.count() == 3)
    Manifest.markProcessed(first, mDir)

    // second run: everything manifested -> nothing to do (B6 fixed: zero,
    // not a silently truncated subset)
    assert(Manifest.unprocessedOnly(input, mDir).count() == 0)

    // a NEW file arrives -> only its rows surface
    Seq((4L, "d"), (5L, "e")).toDF("id", "v").coalesce(1)
      .write.parquet(s"$inDir/f3.parquet")
    val incremental = Manifest.unprocessedOnly(input, mDir)
    assert(incremental.select("id").as[Long].collect().sorted.sameElements(Array(4L, 5L)))
  }
}
