package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The exactness and plan-shape contract of [[ShardedPrefix]]: the
  * two-phase sharded prefix sum / rank must equal the one-window form
  * bit-for-bit on ANY input meeting the contract (numeric, non-null,
  * per-group-unique order key), and the wide window in its physical plan
  * must partition by (group, shard) — never by the bare group, which is
  * the single-task-per-group bottleneck the operator exists to remove.
  */
class ShardedPrefixSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Adversarial fixture: group sizes 1 / small / large (smaller and much
    * larger than the shard count), negative + widely-scaled double order
    * keys (exercises the monotone float bucketing), zero and large values.
    */
  private def fixture(seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val rows = Seq(
      ("solo", Seq(0.0)),
      ("tiny", Seq.fill(3)(rnd.nextDouble() * 10 - 5)),
      ("neg", Seq.fill(40)(-1e6 * rnd.nextDouble())),
      ("big", Seq.fill(500)(rnd.nextDouble() * 1e9))
    ).flatMap { case (g, keys) =>
      // per-group-unique order keys via distinct; values include zeros
      keys.distinct.map(k => (g, k, if (rnd.nextBoolean()) 0L else rnd.nextInt(1000).toLong))
    }
    rows.toDF("grp", "ord", "v")
  }

  private def windowedExclusive(df: DataFrame): DataFrame = {
    val w = Window.partitionBy($"grp").orderBy($"ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("expect", sum($"v").over(w) - $"v")
  }

  test("exclusivePrefixSum equals the one-window form on adversarial groups, any shard count") {
    for (seed <- Seq(1, 7); shards <- Seq(1, 3, 32, 97)) {
      val df = fixture(seed)
      val got = ShardedPrefix.exclusivePrefixSum(df, "grp", "ord", $"v", "cum", shards)
        .select($"grp", $"ord", $"cum").as[(String, Double, Long)].collect()
        .map { case (g, o, c) => (g, o) -> c }.toMap
      val exp = windowedExclusive(df)
        .select($"grp", $"ord", $"expect").as[(String, Double, Long)].collect()
      assert(exp.nonEmpty)
      exp.foreach { case (g, o, e) =>
        assert(got((g, o)) == e, s"seed=$seed shards=$shards grp=$g ord=$o")
      }
      assert(got.size == exp.length, "sharded form must not change the row count")
    }
  }

  test("globalRank equals row_number over the one-window form") {
    val df = fixture(3)
    val w = Window.partitionBy($"grp").orderBy($"ord")
    val exp = df.withColumn("expect", row_number().over(w).cast("long"))
      .select($"grp", $"ord", $"expect").as[(String, Double, Long)].collect()
    val got = ShardedPrefix.globalRank(df, "grp", "ord", "rnk", shards = 5)
      .select($"grp", $"ord", $"rnk").as[(String, Double, Long)].collect()
      .map { case (g, o, r) => (g, o) -> r }.toMap
    exp.foreach { case (g, o, e) => assert(got((g, o)) == e, s"grp=$g ord=$o") }
  }

  test("contiguousPackSharded equals contiguousPack") {
    val rnd = new scala.util.Random(17)
    val docs = (for (g <- Seq("a", "b", "c"); i <- 0 until 300)
      yield (g, g.hashCode.toLong * 10000 + i, 1L + rnd.nextInt(200)))
      .toDF("src", "id", "toks")
    def key(df: DataFrame) = df
      .select($"id", $"seq_tokens", $"bin_id", $"bin_offset")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(
      key(Packing.contiguousPackSharded(docs, "src", "id", "toks", 512L, shards = 7)) ==
      key(Packing.contiguousPack(docs, "src", "id", "toks", 512L)))
  }

  test("mixtureInterleaveSharded equals mixtureInterleave (bit-identical keys)") {
    val docs = (for (g <- Seq("en", "zh", "de"); i <- 0 until 200)
      yield (g, g.hashCode.toLong * 10000 + i)).toDF("lang", "id")
    def key(df: DataFrame) = df.select($"id", $"interleave_key")
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    val weights = Map("en" -> 3.0, "zh" -> 2.0)
    assert(
      key(Sampling.mixtureInterleaveSharded(docs, $"lang", $"id", weights, 1.0, shards = 6)) ==
      key(Sampling.mixtureInterleave(docs, $"lang", $"id", weights, 1.0)))
  }

  test("contract: a null ORDER key fails fast instead of silently mis-sharding") {
    val bad = Seq(("a", Some(1.0), 5L), ("a", None, 7L), ("b", Some(2.0), 1L))
      .toDF("grp", "ord", "v")
    val e = intercept[Exception] {
      ShardedPrefix.exclusivePrefixSum(bad, "grp", "ord", $"v", "cum").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("SHARDED_PREFIX_NULL_KEY")), e.toString)
  }

  test("contract: a null GROUP key fails fast instead of silently dropping at the bounds join") {
    val bad = Seq((Some("a"), 1.0, 5L), (None, 2.0, 7L), (Some("b"), 3.0, 1L))
      .toDF("grp", "ord", "v")
    val e = intercept[Exception] {
      ShardedPrefix.globalRank(bad, "grp", "ord", "rnk").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("SHARDED_PREFIX_NULL_KEY")), e.toString)
  }

  /** The plan pin: the window that sees EVERY row partitions by
    * (group, shard) — parallelism groups x shards. A bare-group window is
    * allowed only above an aggregate (the tiny groups x shards offsets
    * table), never over raw rows.
    */
  test("plan: the full-data window partitions by (group, shard); bare-group windows sit above aggregates only") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val df = fixture(5)
    val out = ShardedPrefix.exclusivePrefixSum(df, "grp", "ord", $"v", "cum", shards = 8)
    out.collect() // materialize so AQE finalizes the plan
    // collect()/collectWithSubqueries stop at AQE wrapper nodes
    // (AdaptiveSparkPlanExec and materialized QueryStageExec expose no
    // children) — descend through them explicitly.
    def windows(p: SparkPlan): Seq[WindowExec] = {
      val here = p match {
        case w: WindowExec => Seq(w)
        case _ => Nil
      }
      val below = p match {
        case a: AdaptiveSparkPlanExec => windows(a.executedPlan)
        case q: QueryStageExec => windows(q.plan)
        case other => other.children.flatMap(windows)
      }
      here ++ below
    }
    val ws = windows(out.queryExecution.executedPlan)
    assert(ws.nonEmpty, out.queryExecution.executedPlan.toString)
    ws.foreach { w =>
      // the rendered subtree shows through any remaining wrappers
      val hasAggBelow = w.child.toString.contains("HashAggregate")
      assert(w.partitionSpec.size == 2 || hasAggBelow,
        s"bare-group window over raw rows:\n$w")
    }
    assert(ws.exists(_.partitionSpec.size == 2), "expected the (group, shard) window")
  }
}
