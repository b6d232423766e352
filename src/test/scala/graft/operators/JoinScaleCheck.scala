package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Scale rehearsal for the round-4 join operators: run them WITHOUT the
  * registry queries' id bounds, on the full fixture tables, with
  * broadcast disabled — the shuffle/sort-merge code path a 100 TB
  * deployment takes. The assertions are about behavior at the bigger
  * size (completes, keys honest, no cross-product blowup), not exact
  * values — those are the oracle's job on the bounded forms.
  */
class JoinScaleCheck extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def noBroadcast[A](body: => A): A = {
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      body
    } finally saved match {
      case Some(v) => conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("fuzzy blocking on ALL customers (no id bound), sort-merge path") {
    noBroadcast {
      val c = Tables.customer(spark, SparkTestSession.sf0001)
        .select("c_custkey", "c_name")
      val pairs = FuzzyJoin.segmentBlockedPairs(c, "c_name", "c_custkey",
        maxDist = 2, numSegments = 9, blockCap = 100)
      val n = pairs.count()
      // every pair verified: spot-check ordering + distance bounds hold
      val sample = pairs.limit(50).collect()
      assert(sample.forall(r => r.getLong(0) < r.getLong(1) && r.getInt(2) <= 2))
      assert(n > 0)
    }
  }

  test("range join on ALL events (no slice), sort-merge path") {
    noBroadcast {
      val ev = Tables.eventsTsNs(spark, SparkTestSession.sf0001)
      val intervals = ev.filter(col("event_type") === "signup")
        .select(col("event_id"),
          expr("ts div 1000").as("s"),
          (expr("ts div 1000") + lit(21600000000L)).as("e"))
      val points = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), expr("ts div 1000").as("p_ts"))
      val joined = RangeJoin.pointInInterval(
        points, "event_id", "p_ts", intervals, "event_id", "s", "e",
        binWidth = 3600000000L)
      // all ~200 intervals x ~200 points: the binned join completes and
      // each reported pair satisfies the predicate (exactly-once shape
      // means no distinct pass could be hiding duplicates)
      val rows = joined.collect()
      assert(rows.length == rows.distinct.length)
      assert(rows.nonEmpty)
    }
  }

  test("banded embedding dup pairs on the FULL embeddings table, sort-merge path") {
    noBroadcast {
      val e = Tables.embeddings(spark, SparkTestSession.sf0001)
      val pairs = Similarity.cosineDupPairsLsh(
        e, "vec_id", "embedding", threshold = 0.4)
      val rows = pairs.collect()
      assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
      assert(rows.forall(r => r.getDouble(2) >= 0.4))
    }
  }

  test("boilerplate removal on ALL documents, sort-merge path") {
    noBroadcast {
      val docs = Tables.documents(spark, SparkTestSession.sf0001)
      val out = Boilerplate.removeBoilerplate(docs, "doc_id", "text",
        window = 3, maxDf = 5L)
      val rows = out.select("doc_id", "n_kept", "n_dropped").collect()
      // every doc with >= one passage comes back exactly once, and the
      // kept/dropped split accounts for all of its passages
      assert(rows.map(_.getLong(0)).distinct.length == rows.length)
      assert(rows.forall(r => r.getLong(1) + r.getLong(2) > 0))
      assert(rows.length == docs.count())
    }
  }

  test("gram novelty on ALL documents, sort-merge path") {
    noBroadcast {
      val docs = Tables.documents(spark, SparkTestSession.sf0001)
      val out = CorpusStats.gramNovelty(docs, "doc_id", "text", n = 5)
      val rows = out.select("doc_id", "n_grams", "n_novel", "novelty").collect()
      assert(rows.map(_.getLong(0)).distinct.length == rows.length)
      assert(rows.forall(r => r.getLong(2) <= r.getLong(1)))
      assert(rows.forall { r =>
        val nov = r.getDouble(3); nov >= 0.0 && nov <= 1.0
      })
      // first doc by id is all-novel by definition
      val firstId = rows.map(_.getLong(0)).min
      assert(rows.find(_.getLong(0) == firstId).get.getDouble(3) == 1.0)
    }
  }
}
