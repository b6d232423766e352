package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Salted join == plain join, with the hot key spread across salt shards. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("salted equi-join returns exactly the plain-join result") {
    // 90% of the big side lands on one hot key
    val big = (1 to 1000).map(i => (if (i % 10 == 0) i.toLong else 1L, i.toLong))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (10L, "cold10"), (20L, "cold20")).toDF("k", "label")

    val plain = big.join(small, "k").select("k", "payload", "label")
    val salted = Skew.saltedJoin(big, small, "k", saltBuckets = 8,
      saltSource = Seq("payload")).select("k", "payload", "label")

    val p = plain.collect().map(_.toSeq).sortBy(_.toString)
    val s = salted.collect().map(_.toSeq).sortBy(_.toString)
    assert(p.length == s.length && p.sameElements(s))
  }

  test("salt is deterministic and spans buckets") {
    val df = (1 to 100).map(_.toLong).toDF("x")
    val salts = df.select(Skew.salt(8, col("x")).as("s")).as[Int].collect()
    val salts2 = df.select(Skew.salt(8, col("x")).as("s")).as[Int].collect()
    assert(salts.sameElements(salts2))
    assert(salts.forall(s => s >= 0 && s < 8))
    assert(salts.distinct.length > 4) // actually spreads
  }
}
