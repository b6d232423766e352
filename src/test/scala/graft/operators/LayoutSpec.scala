package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.ZOrderInterleave

/** The z-order contract: the interleave matches an independent bit-loop
  * model (including 31-bit masking), the SQL registration works, and —
  * the point of the operator — a z-ordered layout makes a box predicate
  * on the NON-leading dimension touch a fraction of the files a
  * single-column layout touches.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def model(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 31) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("interleave equals the bit-loop model, masks to 31 bits, stays non-negative") {
    val rnd = new scala.util.Random(5)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L),
        (Int.MaxValue.toLong, Int.MaxValue.toLong),
        ((1L << 31) + 7L, (1L << 40) + 9L)) ++
      Seq.fill(200)((rnd.nextLong().abs, rnd.nextLong().abs))
    val got = cases.toDF("a", "b")
      .select(ZOrderInterleave.zorderInterleave(col("a"), col("b")))
      .as[Long].collect()
    cases.zip(got).foreach { case ((a, b), z) =>
      assert(z == model(a & 0x7fffffffL, b & 0x7fffffffL), s"($a, $b)")
      assert(z >= 0L)
    }
  }

  test("SQL registration: zorder_interleave callable from SQL, both paths") {
    graft.functions.GraftFunctions.register(spark)
    val z = spark.sql("SELECT zorder_interleave(3, 5)").as[Long].head()
    // 3 = 0b11 on even bits -> 0b0101; 5 = 0b101 on odd bits -> 0b100010
    assert(z == (0x5L | 0x22L))
  }

  test("zOrderBy refuses an input that already has z_value instead of silently overwriting it") {
    val d = spark.range(10).selectExpr("id AS a", "id AS b", "id AS z_value")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Layout.zOrderBy(d, org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b"), partitions = 2)
    }
    assert(e.getMessage.contains("z_value"))
  }

  test("incremental z-compaction: append+compact == full rebuild; untouched bucket files never rewritten") {
    val n = 128
    val grid = spark.range(n.toLong * n)
      .select((col("id") / n).cast("long").as("x"), (col("id") % n).as("y"))
    // arrivals confined to the high-x region: only part of the curve is touched
    val base = grid.filter(col("x") < 96)
    val arrivals = grid.filter(col("x") >= 96)
    val dir = java.nio.file.Files.createTempDirectory("zinc").toString

    def files(): Map[String, Long] = {
      val out = scala.collection.mutable.Map.empty[String, Long]
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).forEach { p =>
        val s = p.toString
        if (s.endsWith(".parquet")) out(s.stripPrefix(dir)) =
          java.nio.file.Files.getLastModifiedTime(p).toMillis
      }
      out.toMap
    }

    Layout.writeZBase(base, col("x"), col("y"), dir, shiftBits = 10)
    val before = files()
    val touched = Layout.appendArrivals(arrivals, col("x"), col("y"), dir, shiftBits = 10)
    assert(touched.nonEmpty && touched.toSet.subsetOf(
      (0L until 16L).toSet), s"touched: $touched")
    Layout.compactTouched(spark, dir, touched)
    val after = files()

    // 1. logical content == from-scratch base write of the full data
    val fullDir = java.nio.file.Files.createTempDirectory("zfull").toString
    Layout.writeZBase(grid, col("x"), col("y"), fullDir, shiftBits = 10)
    def canon(d: String) = spark.read.parquet(d)
      .select(col("x"), col("y"), col("z_value"), col("zbucket").cast("long"))
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(canon(dir) == canon(fullDir), "compacted layout diverges from full rebuild")

    // 2. untouched buckets: files carried over untouched (same path, same mtime)
    val untouchedBefore = before.filterNot { case (p, _) =>
      touched.exists(b => p.contains(s"zbucket=$b/")) }
    assert(untouchedBefore.nonEmpty, "premise broken: every bucket was touched")
    untouchedBefore.foreach { case (p, mtime) =>
      assert(after.get(p).contains(mtime), s"untouched file rewritten: $p") }

    // 3. every touched bucket is again exactly one z-sorted file
    touched.foreach { b =>
      val inBucket = after.keys.filter(_.contains(s"zbucket=$b/"))
      assert(inBucket.size == 1, s"bucket $b has ${inBucket.size} files after compaction")
    }
  }

  test("skipping audit: hand-computed file cuts, overlap rule, and the clustered-vs-scattered gap") {
    // 12 rows, files of 4. Clustered okey = v: files [0..3][4..7][8..11];
    // predicate [5, 6] overlaps only the middle file -> 4 rows read, 2 matched.
    val df = (0L until 12L).map(v => (v, v)).toDF("v", "okc")
      .withColumn("oks", expr("(v * 7) % 12")) // a 12-cycle scatter, unique
    val c = Layout.skippingAudit(df, "okc", "v", "clustered", 4L, 5L, 6L)
      .collect()(0)
    assert((c.getLong(1), c.getLong(2), c.getLong(3), c.getLong(4)) ==
      ((3L, 1L, 4L, 2L)))
    // scattered: 5 and 6 land in different files, each file's minmax
    // straddles the range -> more rows read for the same 2 matches
    val s = Layout.skippingAudit(df, "oks", "v", "scattered", 4L, 5L, 6L)
      .collect()(0)
    assert(s.getLong(4) == 2L && s.getLong(3) > c.getLong(3))
    assert(s.getString(0) == "scattered" && c.getString(0) == "clustered")
  }

  test("z-layout prunes files on the non-leading dimension where a linear layout cannot") {
    val n = 256
    val grid = spark.range(n.toLong * n)
      .select((col("id") / n).cast("long").as("x"), (col("id") % n).as("y"))
    val files = 16

    def distinctFiles(dir: String): Long = {
      val read = spark.read.parquet(dir).filter(col("y") < 64)
      val cnt = read.select(input_file_name()).distinct().count()
      assert(read.count() == n.toLong * 64, "predicate selected the wrong rows")
      cnt
    }

    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    Layout.zOrderBy(grid, col("x"), col("y"), partitions = files)
      .write.mode("overwrite").parquet(zDir)
    val linDir = java.nio.file.Files.createTempDirectory("linear").toString
    grid.repartitionByRange(files, col("x")).sortWithinPartitions("x", "y")
      .write.mode("overwrite").parquet(linDir)

    val zFiles = distinctFiles(zDir)
    val linFiles = distinctFiles(linDir)
    // y < 64 zeroes the two top y bits: the matching z-range is ~1/4 of
    // the curve in two contiguous chunks -> ~4 of 16 z-files hold matches;
    // under x-major layout every x-stripe contains y<64 rows -> all files
    assert(zFiles <= 8, s"z-layout read $zFiles of $files files")
    assert(linFiles >= 14, s"linear layout read only $linFiles files; premise broken")
  }
}
