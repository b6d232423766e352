package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The Bloom-screen contract: zero false negatives ever, probes match a
  * scalar bit-model exactly (false positives included — they are
  * deterministic values here, not statistics), and the plan-literal
  * geometry guard refuses oversized filters.
  */
class BloomScreenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def h32(s: String): Long =
    graft.functions.PortableHash32.hash32(s.getBytes("UTF-8"))

  private def scalarPositions(key: String, k: Int, m: Int): Seq[Long] =
    (0 until k).map(i => ((h32(s"bloom$i:$key") % m) + m) % m)

  private def scalarMaybe(key: String, bits: Set[Long], k: Int, m: Int): Boolean =
    scalarPositions(key, k, m).forall(bits)

  private val block = (1 to 40).map(i => s"blocked$i")
  private val clean = (1 to 300).map(i => s"clean$i")

  test("no false negatives: every blocklisted key probes true") {
    val words = BloomScreen.build(block.toDF("key"), "key", k = 3, m = 256)
    val flagged = block.toDF("key")
      .select(BloomScreen.maybeContains(col("key"), words, 3, 256))
      .as[Boolean].collect()
    assert(flagged.forall(identity))
  }

  test("probes match the scalar bit model exactly, and a crowded filter shows real false positives") {
    // m = 256 with 40 keys * 3 hashes: crowded enough that some clean
    // keys MUST collide — and the model must agree on exactly which.
    val k = 3; val m = 256
    val words = BloomScreen.build(block.toDF("key"), "key", k, m)
    val bits = block.flatMap(scalarPositions(_, k, m)).toSet
    // the built bitmap is the scalar bit set
    val builtBits = (0 until m).filter(i =>
      (words(i / 64) >> (i % 64) & 1L) == 1L).map(_.toLong).toSet
    assert(builtBits == bits)

    val got = (block ++ clean).toDF("key")
      .select(col("key"), BloomScreen.maybeContains(col("key"), words, k, m))
      .as[(String, Boolean)].collect().toMap
    (block ++ clean).foreach { key =>
      assert(got(key) == scalarMaybe(key, bits, k, m), s"probe mismatch on $key")
    }
    val falsePositives = clean.filter(got)
    assert(falsePositives.nonEmpty,
      "fixture expected to produce at least one deterministic false positive")
  }

  test("screen: exact_blocked is ground truth; maybe_blocked superset of it") {
    val docs = (block.take(10) ++ clean.take(50)).zipWithIndex
      .map { case (key, i) => (i.toLong, key) }.toDF("id", "key")
    val out = BloomScreen.screen(
        docs, "key", block.toDF("bk"), "bk", k = 3, m = 1024)
      .select("key", "maybe_blocked", "exact_blocked")
      .as[(String, Boolean, Boolean)].collect()
    out.foreach { case (key, maybe, exact) =>
      assert(exact == block.contains(key))
      assert(!exact || maybe, s"false negative on $key")
    }
  }

  test("geometry guards: non-multiple-of-64 m and oversized m are refused") {
    intercept[IllegalArgumentException] {
      BloomScreen.build(block.toDF("key"), "key", k = 3, m = 100)
    }
    intercept[IllegalArgumentException] {
      BloomScreen.build(block.toDF("key"), "key", k = 3, m = 1 << 21)
    }
  }
}
