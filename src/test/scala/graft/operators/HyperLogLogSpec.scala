package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The HLL contract: registers match a scalar md5 model cell-for-cell,
  * the sketch is duplicate-insensitive, sketches merge by cell-wise max,
  * the fixed-point harmonic sum is exact, and the corrected estimate
  * lands within the published error bounds on known cardinalities.
  */
class HyperLogLogSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val p = 6
  private val m = 1 << p

  private def h32(s: String): Long =
    graft.functions.PortableHash32.hash32(s.getBytes("UTF-8"))

  private def scalarBucket(s: String): Long = h32(s) & (m - 1)

  private def scalarRank(s: String): Int = {
    val w = h32(s) >>> p
    if (w == 0) 33 - p
    else 33 - p - (64 - java.lang.Long.numberOfLeadingZeros(w))
  }

  private def scalarRegisters(keys: Seq[String]): Map[Long, Int] =
    keys.groupBy(scalarBucket).map { case (b, ks) => b -> ks.map(scalarRank).max }

  private val keys: Seq[String] = (1 to 400).map(i => s"key$i")

  test("register table equals the scalar model; duplicates change nothing") {
    val got = HyperLogLog.registers(
        keys.toDF("k").withColumn("g", lit("all")), "k", Seq("g"), p)
      .select("bucket", "register").as[(Long, Int)].collect().toMap
    assert(got == scalarRegisters(keys))

    val dup = HyperLogLog.registers(
        (keys ++ keys ++ keys.take(50)).toDF("k").withColumn("g", lit("all")),
        "k", Seq("g"), p)
      .select("bucket", "register").as[(Long, Int)].collect().toMap
    assert(dup == got, "the sketch must be duplicate-insensitive")
  }

  test("merge is cell-wise max and equals the sketch of the union") {
    val (a, b) = keys.splitAt(150)
    val overlap = keys.slice(100, 200) // make the halves overlap too
    def sk(ks: Seq[String]) = HyperLogLog.registers(
      ks.toDF("k").withColumn("g", lit("all")), "k", Seq("g"), p)
    val merged = HyperLogLog.merge(sk(a ++ overlap), sk(b), Seq("g"))
      .select("bucket", "register").as[(Long, Int)].collect().toMap
    val whole = sk(keys)
      .select("bucket", "register").as[(Long, Int)].collect().toMap
    assert(merged == whole)
  }

  test("fixed-point harmonic sum is exact against the scalar model") {
    val regs = scalarRegisters(keys)
    val wantScaled = (m - regs.size).toLong * (1L << (33 - p)) +
      regs.values.map(r => 1L << (33 - p - r)).sum
    val got = HyperLogLog.estimateRaw(
        HyperLogLog.registers(
          keys.toDF("k").withColumn("g", lit("all")), "k", Seq("g"), p),
        Seq("g"), p)
      .select("s_scaled").as[Long].collect().head
    assert(got == wantScaled)
  }

  test("corrected estimate within published error on large and small cardinalities") {
    // Large: n >> m at p=10 (m=1024, standard error ~3.25%): allow 4 sigma.
    val p10 = 10
    val n = 50000
    val big = (1 to n).map(i => s"big$i")
    val est = HyperLogLog.estimateCorrected(
        HyperLogLog.registers(
          big.toDF("k").withColumn("g", lit("all")), "k", Seq("g"), p10),
        Seq("g"), p10)
      .select("estimate").as[Double].collect().head
    val relErr = math.abs(est - n) / n
    assert(relErr < 0.13, s"estimate $est for n=$n off by $relErr")

    // Small: n << m triggers linear counting, which is near-exact there.
    val small = (1 to 30).map(i => s"small$i")
    val estSmall = HyperLogLog.estimateCorrected(
        HyperLogLog.registers(
          small.toDF("k").withColumn("g", lit("all")), "k", Seq("g"), p10),
        Seq("g"), p10)
      .select("estimate").as[Double].collect().head
    assert(math.abs(estSmall - 30) / 30 < 0.1,
      s"linear-counting estimate $estSmall for n=30")
  }

  test("per-group sketches are independent") {
    val df = keys.take(100).map(("a", _)) ++ keys.map(("b", _))
    val regs = HyperLogLog.registers(df.toDF("g", "k"), "k", Seq("g"), p)
    val byG = regs.select("g", "bucket", "register").as[(String, Long, Int)]
      .collect().groupBy(_._1)
      .map { case (g, rows) => g -> rows.map(r => r._2 -> r._3).toMap }
    assert(byG("a") == scalarRegisters(keys.take(100)))
    assert(byG("b") == scalarRegisters(keys))
  }
}
