package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{And, Expression, IsNotNull}
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession, Tables}

/** The three catalog-driven optimizer rules: decision enacted when the
  * evidence says so, provable no-op when it doesn't, and always the
  * same rows as the un-ruled plan. These pins are the load-bearing
  * claims of q244/q245/q246 (whose oracles can only see semantics).
  */
class CatalogRulesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf0001

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** The unique join in the optimized plan whose BOTH sides are
    * recognizable base scans — the chain's first (innermost) join. */
  private def firstJoinTables(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case j: Join if CatalogRules.tableOf(j.left).isDefined &&
        CatalogRules.tableOf(j.right).isDefined =>
        Set(CatalogRules.tableOf(j.left).get, CatalogRules.tableOf(j.right).get)
    }.head

  private def conjuncts(df: DataFrame): Seq[Expression] = {
    val f = df.queryExecution.optimizedPlan.collect {
      case flt: org.apache.spark.sql.catalyst.plans.logical.Filter => flt
    }.head
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    split(f.condition)
  }

  // ---------------------------------------------------------------- tableOf

  test("tableOf names a base scan through prune/filter, refuses joins") {
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") >= 10).select("l_orderkey", "l_suppkey")
    assert(CatalogRules.tableOf(li.queryExecution.optimizedPlan)
      === Some("lineitem"))
    val joined = Tables.lineitem(spark, sf).join(
      Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
    assert(CatalogRules.tableOf(joined.queryExecution.optimizedPlan).isEmpty)
  }

  // ------------------------------------------------- CatalogBroadcastRule

  test("q244: catalog rule broadcasts the dim with auto-broadcast off; rule-off plans SortMergeJoin; same rows") {
    val on = SparkEntry.queries("q244_rule_broadcast_choice")(spark, sf)
    assert(physical(on).contains("BroadcastHashJoin"), physical(on))

    val off = CatalogRules.sessionWith(spark, Nil,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val offDf = Tables.lineitem(off, sf)
      .join(Tables.supplier(off, sf), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"))
    assert(physical(offDf).contains("SortMergeJoin"), physical(offDf))
    assert(!physical(offDf).contains("BroadcastHashJoin"), physical(offDf))
    assert(sortedRows(on) === sortedRows(offDf))
  }

  test("broadcast rule defers to an existing user hint") {
    val rows = Map("lineitem" -> 6000L, "supplier" -> 10L)
    val child = CatalogRules.sessionWith(spark,
      Seq(CatalogBroadcastRule(rows)),
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val df = Tables.lineitem(child, sf)
      .join(Tables.supplier(child, sf).hint("merge"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("cnt"))
    assert(physical(df).contains("SortMergeJoin"), physical(df))
    assert(!physical(df).contains("BroadcastHashJoin"), physical(df))
  }

  test("broadcast rule stays silent when no side is decisively small") {
    val rows = Map("lineitem" -> 6000L, "orders" -> 1500L)
    val child = CatalogRules.sessionWith(spark,
      Seq(CatalogBroadcastRule(rows, maxBroadcastRows = 100L)),
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val df = Tables.lineitem(child, sf)
      .join(Tables.orders(child, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
    assert(physical(df).contains("SortMergeJoin"), physical(df))
    assert(!physical(df).contains("BroadcastHashJoin"), physical(df))
  }

  test("config-only deployment: the injected rule broadcasts from spark.graft.broadcast.rows and no-ops with it unset") {
    import org.apache.spark.sql.SparkSession
    // getOrCreate ignores withExtensions when a session exists, so clear
    // and rebuild over the shared context (the GraftExtensionsSpec
    // device); never stop() — that would kill the context.
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[2]")
      .appName("rule-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try {
      ext.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      ext.conf.set("spark.sql.adaptive.enabled", "false")
      def joined = Tables.lineitem(ext, sf)
        .join(Tables.supplier(ext, sf), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("cnt"))
      // conf unset: strict no-op, plain shuffle join
      assert(physical(joined).contains("SortMergeJoin"), physical(joined))
      ext.conf.set(ConfCatalogBroadcastRule.RowsConf, "lineitem:6000, supplier:10")
      assert(physical(joined).contains("BroadcastHashJoin"), physical(joined))
      ext.conf.unset(ConfCatalogBroadcastRule.RowsConf)
      assert(physical(joined).contains("SortMergeJoin"), physical(joined))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
      prior.foreach(SparkSession.setActiveSession)
    }
  }

  test("config-only rule fails loudly on a malformed catalog string") {
    val child = CatalogRules.sessionWith(spark, Seq(ConfCatalogBroadcastRule))
    child.conf.set(ConfCatalogBroadcastRule.RowsConf, "lineitem=6000")
    val df = Tables.lineitem(child, sf)
      .join(Tables.supplier(child, sf), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("cnt"))
    val e = intercept[Exception] { df.queryExecution.optimizedPlan }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.isInstanceOf[IllegalArgumentException] &&
      c.getMessage.contains("table:rows")), e.toString)
  }

  test("config-only deployment: join-order and conjunct rules fire from confs and no-op with them unset") {
    import org.apache.spark.sql.SparkSession
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[2]")
      .appName("rule-ext-test2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try {
      ext.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def chain = Tables.lineitem(ext, sf)
        .join(Tables.orders(ext, sf), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(ext, sf), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
      // confs unset: strict no-op, written order survives
      assert(firstJoinTables(chain) === Set("lineitem", "orders"))
      ext.conf.set(ConfCatalogJoinOrderRule.StatsConf,
        "lineitem:6000:l_orderkey=1500; " +
          "orders:1500:o_orderkey=1500,o_custkey=150; " +
          "customer:150:c_custkey=150")
      assert(firstJoinTables(chain) === Set("orders", "customer"))
      ext.conf.unset(ConfCatalogJoinOrderRule.StatsConf)
      assert(firstJoinTables(chain) === Set("lineitem", "orders"))

      def filtered = Tables.lineitem(ext, sf)
        .filter(col("l_extendedprice") >= 1000.0 &&
          col("l_suppkey") === 1 && col("l_quantity") >= 45.0)
        .groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
      def idxOf(df: DataFrame, colName: String): Int = conjuncts(df).indexWhere(e =>
        !e.isInstanceOf[IsNotNull] &&
          e.references.map(_.name).toSet == Set(colName))
      // conf unset: written order (price, equality, quantity)
      assert(idxOf(filtered, "l_extendedprice") < idxOf(filtered, "l_quantity"))
      ext.conf.set(ConfConjunctReorderRule.HistsConf,
        "l_quantity:1.0:50.0:" + Seq.fill(16)("100").mkString("|") + ";" +
          "l_extendedprice:900.0:105000.0:" + Seq.fill(16)("100").mkString("|"))
      ext.conf.set(ConfConjunctReorderRule.McvsConf,
        "l_suppkey:6000:10:1=600,2=600")
      // published stats: equality (~10%) then quantity (~11%) then price (~99%)
      val eqI = idxOf(filtered, "l_suppkey")
      val qtyI = idxOf(filtered, "l_quantity")
      val priceI = idxOf(filtered, "l_extendedprice")
      assert(eqI < qtyI && qtyI < priceI,
        conjuncts(filtered).mkString("; "))
      // without the MCV conf the equality is uncostable: whole chain as written
      ext.conf.unset(ConfConjunctReorderRule.McvsConf)
      assert(idxOf(filtered, "l_extendedprice") < idxOf(filtered, "l_quantity"))
      ext.conf.unset(ConfConjunctReorderRule.HistsConf)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
      prior.foreach(SparkSession.setActiveSession)
    }
  }

  test("config-only join-order and conjunct rules fail loudly on malformed catalog strings") {
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    val child = CatalogRules.sessionWith(spark,
      Seq(ConfCatalogJoinOrderRule, ConfConjunctReorderRule))
    child.conf.set(ConfCatalogJoinOrderRule.StatsConf, "lineitem=6000")
    val df = Tables.lineitem(child, sf)
      .join(Tables.orders(child, sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(child, sf), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
    val e1 = intercept[Exception] { df.queryExecution.optimizedPlan }
    assert(causes(e1).exists(c => c.isInstanceOf[IllegalArgumentException] &&
      c.getMessage.contains("table:rows:col=ndv")), e1.toString)
    child.conf.unset(ConfCatalogJoinOrderRule.StatsConf)
    child.conf.set(ConfConjunctReorderRule.HistsConf, "l_quantity:1.0:50.0")
    val df2 = Tables.lineitem(child, sf)
      .filter(col("l_extendedprice") >= 1000.0 && col("l_quantity") >= 45.0)
      .groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
    val e2 = intercept[Exception] { df2.queryExecution.optimizedPlan }
    assert(causes(e2).exists(c => c.isInstanceOf[IllegalArgumentException] &&
      c.getMessage.contains("col:mn:mx")), e2.toString)
    child.conf.unset(ConfConjunctReorderRule.HistsConf)
  }

  // ------------------------------------------------- CatalogJoinOrderRule

  test("q245: rule re-associates so orders><customer materializes first; rule-off keeps written order; same rows") {
    val on = SparkEntry.queries("q245_rule_join_order")(spark, sf)
    assert(firstJoinTables(on) === Set("orders", "customer"))

    val off = CatalogRules.sessionWith(spark, Nil,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val offDf = Tables.lineitem(off, sf)
      .join(Tables.orders(off, sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(off, sf), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double")
          .as("sum_price"))
    assert(firstJoinTables(offDf) === Set("lineitem", "orders"))
    assert(sortedRows(on) === sortedRows(offDf))
  }

  test("join-order rule keeps an already-minimal order, and preserves raw column order on the rewritten one") {
    val st = {
      // sf0.001 catalog shape: the same stats q241 reads.
      import CatalogRules.{CatalogStats, TableStat}
      CatalogStats(Map(
        "lineitem" -> TableStat(6000L, Map("l_orderkey" -> 1500L)),
        "orders" -> TableStat(1500L,
          Map("o_orderkey" -> 1500L, "o_custkey" -> 150L)),
        "customer" -> TableStat(150L, Map("c_custkey" -> 150L))))
    }
    val child = CatalogRules.sessionWith(spark,
      Seq(CatalogJoinOrderRule(st)),
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")

    // Written optimal: orders><customer first — the rule must not touch it.
    val optimal = Tables.orders(child, sf)
      .join(Tables.customer(child, sf), col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(child, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
    assert(firstJoinTables(optimal) === Set("orders", "customer"))

    // Written suboptimal, NO aggregate on top: the raw joined frame must
    // keep the exact written column order (the restoring projection) and
    // the exact row multiset.
    val rewritten = Tables.lineitem(child, sf)
      .join(Tables.orders(child, sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(child, sf), col("o_custkey") === col("c_custkey"))
    assert(firstJoinTables(rewritten) === Set("orders", "customer"))
    val plainSess = CatalogRules.sessionWith(spark, Nil,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val plain = Tables.lineitem(plainSess, sf)
      .join(Tables.orders(plainSess, sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(plainSess, sf), col("o_custkey") === col("c_custkey"))
    assert(rewritten.columns.toSeq === plain.columns.toSeq)
    assert(sortedRows(rewritten) === sortedRows(plain))
  }

  test("join-order rule stays silent when a side isn't a cataloged base scan") {
    import CatalogRules.{CatalogStats, TableStat}
    val st = CatalogStats(Map(
      "lineitem" -> TableStat(6000L, Map("l_orderkey" -> 1500L)),
      "orders" -> TableStat(1500L,
        Map("o_orderkey" -> 1500L, "o_custkey" -> 150L))))
    val child = CatalogRules.sessionWith(spark,
      Seq(CatalogJoinOrderRule(st)),
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    // customer is missing from the catalog: no stats, no rewrite.
    val df = Tables.lineitem(child, sf)
      .join(Tables.orders(child, sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(child, sf), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
    assert(firstJoinTables(df) === Set("lineitem", "orders"))
  }

  test("q247: greedy 4-chain seeds from customer><nation, attaches orders then lineitem; rule-off keeps written order; same rows") {
    val on = SparkEntry.queries("q247_rule_join_order4")(spark, sf)
    val joins = on.queryExecution.optimizedPlan.collect { case j: Join => j }
    // pre-order: top join attaches lineitem, middle attaches orders,
    // innermost is the dimension-dimension seed.
    assert(CatalogRules.tableOf(joins(0).right) === Some("lineitem"))
    assert(CatalogRules.tableOf(joins(1).right) === Some("orders"))
    assert(firstJoinTables(on) === Set("customer", "nation"))

    val off = CatalogRules.sessionWith(spark, Nil,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val offDf = Tables.lineitem(off, sf)
      .join(Tables.orders(off, sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(off, sf), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(off, sf), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double")
          .as("sum_price"))
    assert(firstJoinTables(offDf) === Set("lineitem", "orders"))
    assert(sortedRows(on) === sortedRows(offDf))
  }

  test("q262: the same text + catalog orders differently blind vs filter-aware; selectivity-aware keeps the filtered fact first; same rows") {
    import graft.queries.{HistPhases, McvPhases, StatsPhases}
    val est = ConjunctReorderRule.estimator(
      HistPhases.collectedHists(spark, sf),
      McvPhases.collectedMcvs(spark, sf))
    val st = StatsPhases.collected(spark, sf)
    def chain(s: org.apache.spark.sql.SparkSession) =
      Tables.lineitem(s, sf)
        .filter(col("l_quantity") >= 49.0)
        .join(Tables.orders(s, sf), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, sf), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
    // BLIND: lineitem costs 6000 — the rule pulls the dim pair first.
    val blind = CatalogRules.sessionWith(spark,
      Seq(CatalogJoinOrderRule(st)),
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    assert(firstJoinTables(chain(blind)) === Set("orders", "customer"))
    // AWARE: the ~3%-pass quantity filter discounts lineitem below the
    // dim-pair estimate — the written (filtered-fact-first) order is
    // already minimal and survives.
    val aware = CatalogRules.sessionWith(spark,
      Seq(CatalogJoinOrderRule(st, Some(est))),
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    assert(firstJoinTables(chain(aware)) === Set("lineitem", "orders"))
    // decisions differ, rows cannot
    assert(sortedRows(chain(aware)) === sortedRows(chain(blind)))

    // conf face: same contrast through the opt-in conf
    val confAware = CatalogRules.sessionWith(spark,
      Seq(ConfCatalogJoinOrderRule),
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      ConfCatalogJoinOrderRule.StatsConf -> StatsPhases.confJoinOrder(spark, sf),
      ConfCatalogJoinOrderRule.UseSelectivityConf -> "true",
      ConfConjunctReorderRule.HistsConf -> HistPhases.confString(spark, sf),
      ConfConjunctReorderRule.McvsConf -> McvPhases.confString(spark, sf))
    assert(firstJoinTables(chain(confAware)) === Set("lineitem", "orders"))
  }

  test("q248 companion: approx-HLL stats drive the join-order rule to the same tree as the exact catalog") {
    import graft.operators.{HyperLogLog, Profile}
    def approxNdv(t: String, k: String): Long = math.round(
      HyperLogLog.estimateRaw(
          Profile.profileSketch(Tables(spark, sf, t), Seq(k), p = 6),
          Seq("column"), p = 6)
        .collect()(0).getAs[Double]("hll_raw"))
    def rows(t: String): Long = Tables(spark, sf, t).count()
    import CatalogRules.{CatalogStats, TableStat}
    val st = CatalogStats(Map(
      "lineitem" -> TableStat(rows("lineitem"),
        Map("l_orderkey" -> approxNdv("lineitem", "l_orderkey"))),
      "orders" -> TableStat(rows("orders"),
        Map("o_orderkey" -> approxNdv("orders", "o_orderkey"),
          "o_custkey" -> approxNdv("orders", "o_custkey"))),
      "customer" -> TableStat(rows("customer"),
        Map("c_custkey" -> approxNdv("customer", "c_custkey")))))
    val child = CatalogRules.sessionWith(spark,
      Seq(CatalogJoinOrderRule(st)),
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val df = Tables.lineitem(child, sf)
      .join(Tables.orders(child, sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(child, sf), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
    // ~13% rsd at p=6 cannot flip a 4x predicted-size gap: the
    // approximate catalog reproduces the exact catalog's choice.
    assert(firstJoinTables(df) === Set("orders", "customer"))
  }

  test("q253: the full standardRules stack fires all three effects on one plan; same rows as rule-off") {
    import org.apache.spark.sql.catalyst.expressions.IsNotNull
    val on = SparkEntry.queries("q253_rules_composed")(spark, sf)
    // join-order effect, FILTER-AWARE (standardRules passes the
    // estimator through since r19) and scale-explicit: at this fixture
    // the ~12%-pass quantity filter discounts lineitem to ~0.12 * n_li,
    // which is SMALLER than the blind orders><customer seed (n_ord),
    // so the aware rule correctly keeps the filtered fact's join first
    // — the blind rule would have re-associated to the dims (q245's
    // pin; q262 pins the blind-vs-aware contrast on one text).
    assert(firstJoinTables(on) === Set("lineitem", "orders"))
    // broadcast effect: the rewritten inner join is hint-broadcast
    assert(physical(on).contains("BroadcastHashJoin"), physical(on))
    // conjunct effect: quantity test precedes the price test, null
    // guards (incl. the inferred join-key guard) lead. Pick the
    // lineitem Filter (other sides carry inferred-guard-only filters).
    val cs = {
      val f = on.queryExecution.optimizedPlan.collect {
        case flt: org.apache.spark.sql.catalyst.plans.logical.Filter
            if flt.condition.references.map(_.name).exists(_ == "l_quantity") => flt
      }.head
      def split(e: org.apache.spark.sql.catalyst.expressions.Expression)
          : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
        case org.apache.spark.sql.catalyst.expressions.And(l, r) => split(l) ++ split(r)
        case other => Seq(other)
      }
      split(f.condition)
    }
    val qtyIdx = cs.indexWhere(e =>
      !e.isInstanceOf[IsNotNull] && e.references.map(_.name).toSet == Set("l_quantity"))
    val priceIdx = cs.indexWhere(e =>
      !e.isInstanceOf[IsNotNull] && e.references.map(_.name).toSet == Set("l_extendedprice"))
    assert(qtyIdx >= 0 && priceIdx >= 0 && qtyIdx < priceIdx, cs.mkString("; "))

    val off = CatalogRules.sessionWith(spark, Nil,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val offDf = Tables.lineitem(off, sf)
      .filter(col("l_extendedprice") >= 1000.0 && col("l_quantity") >= 45.0)
      .join(Tables.orders(off, sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(off, sf), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double")
          .as("sum_price"))
    assert(sortedRows(on) === sortedRows(offDf))
  }

  test("standardRules order contract: the MV rewrite still fires with the broadcast rule installed") {
    import graft.queries.{MvPhases, StatsPhases}
    MvPhases.ensureStoredSk(spark, sf)
    val st = StatsPhases.collected(spark, sf)
    val child = CatalogRules.sessionWith(spark, Nil,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    CatalogRules.installRules(child,
      CatalogRules.standardRules(st, mvs = Seq(MvPhases.mvDefSk(child, sf))))
    val df = Tables.lineitem(child, sf)
      .join(Tables.supplier(child, sf), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("cnt"))
    // the MV shape runs before the hint rule, so the fact scan is gone
    // even though the broadcast rule would have hinted (and thereby
    // hidden) this join had it run first
    val leaves = df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.catalogTable.map(_.identifier.table)
          .orElse(CatalogRules.tableOf(lr)).getOrElse("?")
    }.toSet
    assert(leaves === Set(MvPhases.skTable(sf), "supplier"), leaves)
  }

  test("safety property: arbitrary catalog stats can change the plan but never the rows") {
    // The decision layer must be UNABLE to corrupt semantics: whatever
    // (even adversarial) statistics the rules are fed — including
    // RANDOM PROVENANCE, i.e. false Exact declarations that let the
    // eager-aggregation proof fire on lies — the rewritten 4-chain
    // returns exactly the rule-off rows. For the ordering rules this
    // is semantics-preservation by construction; for eager aggregation
    // it is the spec-pinned multiplicity linearity of the
    // re-aggregating fold menu. Seeded draws cover order-flipping,
    // degenerate (ndv=1), and huge-row regimes.
    import CatalogRules.{CatalogStats, StatProvenance, TableStat}
    val rng = new scala.util.Random(42)
    def draw(): CatalogStats = {
      def n() = 1L + rng.nextInt(1000000)
      def prov() =
        if (rng.nextBoolean()) StatProvenance.Exact else StatProvenance.Approx
      // random path too: sometimes the table's REAL path (so a false
      // Exact claim can actually fire the proof), sometimes none (the
      // proofs must refuse pathless declarations)
      def path(t: String) =
        if (rng.nextBoolean())
          Some(CatalogRules.normalizePath(graft.Tables.path(sf, t)))
        else None
      CatalogStats(Map(
        "lineitem" -> TableStat(n(), Map("l_orderkey" -> n(),
          "l_suppkey" -> n()), prov(), path("lineitem")),
        "orders" -> TableStat(n(),
          Map("o_orderkey" -> n(), "o_custkey" -> n()), prov(),
          path("orders")),
        "customer" -> TableStat(n(),
          Map("c_custkey" -> n(), "c_nationkey" -> n()), prov(),
          path("customer")),
        "nation" -> TableStat(n(), Map("n_nationkey" -> n()), prov(),
          path("nation")),
        // a randomly-(un)proven dim for the avg-shaped 2-table join,
        // where the eager COUNT + guarded-DECIMAL folds CAN fire —
        // sometimes on a true claim, sometimes on a lie, sometimes
        // pathless (which the proof must refuse)
        "supplier" -> TableStat(n(), Map("s_suppkey" -> n()), prov(),
          path("supplier"))))
    }
    val expected = {
      val off = CatalogRules.sessionWith(spark, Nil,
        "spark.sql.autoBroadcastJoinThreshold" -> "-1")
      sortedRows(chain4(off))
    }
    val avgExpected = {
      val off = CatalogRules.sessionWith(spark, Nil,
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.ansi.enabled" -> "false")
      sortedRows(avgJoin(off))
    }
    (1 to 8).foreach { i =>
      val st = draw()
      val child = CatalogRules.sessionWith(spark,
        Seq(EagerAggregationRule(st), CatalogJoinOrderRule(st),
          CatalogBroadcastRule(
            st.tables.map { case (t, s) => t -> s.rows },
            maxBroadcastRows = 1L + rng.nextInt(1000000))),
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.ansi.enabled" -> "false")
      assert(sortedRows(chain4(child)) === expected, s"draw $i with $st")
      assert(sortedRows(avgJoin(child)) === avgExpected, s"draw $i with $st")
    }
  }

  /** The q271 shape: the deterministic-average idiom over the 2-table
    * join eager aggregation CAN fire on (when a draw happens to claim
    * an Exact, correctly-pathed unique s_suppkey — truth not
    * required: the fold menu is multiplicity-linear). */
  private def avgJoin(s: org.apache.spark.sql.SparkSession): DataFrame =
    Tables.lineitem(s, sf)
      .join(Tables.supplier(s, sf), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(col("l_quantity")).as("cnt_qty"),
        (sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
          / count(col("l_quantity"))).as("avg_qty"))

  private def chain4(s: org.apache.spark.sql.SparkSession): DataFrame =
    Tables.lineitem(s, sf)
      .join(Tables.orders(s, sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, sf), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, sf), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double")
          .as("sum_price"))

  // -------------------------------------------------- EagerAggregationRule

  test("q264: eager aggregation pushes a fact-side partial below the join; bails without proof, under-reduction, or on unsafe sums; same rows") {
    import graft.queries.StatsPhases
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    def pushedBelowJoin(df: DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collectFirst {
        case Join(l, _, _, _, _) if l.collectFirst {
          case a: Aggregate if CatalogRules.tableOf(a.child).contains("lineitem") => a
        }.isDefined => true
        case Join(_, r, _, _, _) if r.collectFirst {
          case a: Aggregate if CatalogRules.tableOf(a.child).contains("lineitem") => a
        }.isDefined => true
      }.getOrElse(false)

    val on = SparkEntry.queries("q264_eager_aggregation")(spark, sf)
    assert(pushedBelowJoin(on), on.queryExecution.optimizedPlan.toString)

    val off = CatalogRules.sessionWith(spark, Nil)
    def text(s: org.apache.spark.sql.SparkSession) =
      Tables.lineitem(s, sf)
        .join(Tables.supplier(s, sf), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("bigint")).as("sum_qty"),
          max(col("l_extendedprice")).as("max_price"))
    val offDf = text(off)
    assert(!pushedBelowJoin(offDf))
    assert(on.schema === offDf.schema)
    assert(sortedRows(on) === sortedRows(offDf))

    val st = StatsPhases.collected(spark, sf)
    // no uniqueness proof (empty stats): bail
    val noProof = CatalogRules.sessionWith(spark,
      Seq(EagerAggregationRule(CatalogRules.CatalogStats(Map.empty))),
      "spark.sql.ansi.enabled" -> "false")
    assert(!pushedBelowJoin(text(noProof)))
    // approx provenance satisfying ndv == rows numerically: bail
    val n = Tables.supplier(spark, sf).count()
    val approx = CatalogRules.CatalogStats(Map(
      "supplier" -> CatalogRules.TableStat(n, Map("s_suppkey" -> n)),
      "lineitem" -> st.tables("lineitem").copy(
        provenance = CatalogRules.StatProvenance.Approx)))
    val approxS = CatalogRules.sessionWith(spark,
      Seq(EagerAggregationRule(approx)), "spark.sql.ansi.enabled" -> "false")
    assert(!pushedBelowJoin(text(approxS)))
    // reduction gate: a fact already at key grain gains nothing
    val flat = CatalogRules.CatalogStats(st.tables.updated("lineitem",
      st.tables("lineitem").copy(
        ndv = st.tables("lineitem").ndv.updated(
          "l_suppkey", st.tables("lineitem").rows))))
    val flatS = CatalogRules.sessionWith(spark, Seq(EagerAggregationRule(flat)),
      "spark.sql.ansi.enabled" -> "false")
    assert(!pushedBelowJoin(text(flatS)))
    // double SUM refuses (regrouping reorders float addition — no
    // guard can see a bit-level divergence)
    val proofS = CatalogRules.sessionWith(spark, Seq(EagerAggregationRule(st)),
      "spark.sql.ansi.enabled" -> "false")
    val dbl = Tables.lineitem(proofS, sf)
      .join(Tables.supplier(proofS, sf), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(sum(col("l_quantity")).as("s"))
    assert(!pushedBelowJoin(dbl))
    // DECIMAL folds exactly through the loud-guarded narrow (q271) —
    // pushed, and the rows match the direct aggregation
    val dec = Tables.lineitem(proofS, sf)
      .join(Tables.supplier(proofS, sf), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("s"))
    assert(pushedBelowJoin(dec))
    val decOff = Tables.lineitem(off, sf)
      .join(Tables.supplier(off, sf), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("s"))
    assert(dec.schema === decOff.schema)
    assert(sortedRows(dec) === sortedRows(decOff))
    // q271: the full deterministic-average idiom pushes both calls
    val q271 = SparkEntry.queries("q271_eager_avg")(spark, sf)
    assert(pushedBelowJoin(q271), q271.queryExecution.optimizedPlan.toString)
    val avgOff = CatalogRules.sessionWith(spark, Nil,
      "spark.sql.ansi.enabled" -> "false")
    assert(q271.schema === avgJoin(avgOff).schema)
    assert(sortedRows(q271) === sortedRows(avgJoin(avgOff)))
    // a DIM-side aggregate refuses outright: the fk-grain join changes
    // its per-group multiplicity (each supplier row would count once
    // instead of once per lineitem row)
    val dimAgg = Tables.lineitem(proofS, sf)
      .join(Tables.supplier(proofS, sf), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("cnt"),
        sum(col("s_acctbal").cast("bigint")).as("s"))
    assert(!pushedBelowJoin(dimAgg))

    // conf face: fires from the published join-order stats + the
    // declared-exact constraint; approx stats alone cannot prove it
    val nLi = Tables.lineitem(spark, sf).count()
    val fkNdv = st.tables("lineitem").ndv("l_suppkey")
    val joConf = s"lineitem:$nLi:l_suppkey=$fkNdv"
    val confOn = CatalogRules.sessionWith(spark,
      Seq(ConfEagerAggregationRule),
      "spark.sql.ansi.enabled" -> "false",
      ConfCatalogJoinOrderRule.StatsConf -> joConf,
      ConfMvRewriteRule.ExactConf -> (s"supplier:$n:path=" +
        CatalogRules.normalizePath(graft.Tables.path(sf, "supplier")) +
        s":s_suppkey=$n"))
    assert(pushedBelowJoin(text(confOn)))
    val confNoProof = CatalogRules.sessionWith(spark,
      Seq(ConfEagerAggregationRule),
      "spark.sql.ansi.enabled" -> "false",
      ConfCatalogJoinOrderRule.StatsConf ->
        (joConf + s";supplier:$n:s_suppkey=$n"))
    assert(!pushedBelowJoin(text(confNoProof)))
  }

  test("q268: a composite (AND-of-equalities) edge costs from the counted composite entry and the chain reorders; a missing entry bails; same rows") {
    import graft.queries.StatsPhases
    val on = SparkEntry.queries("q268_rule_join_order_composite")(spark, sf)
    // greedy seeds the cheapest pair — orders><customer — even though
    // the text joins the composite self-join first
    assert(firstJoinTables(on) === Set("orders", "customer"),
      firstJoinTables(on))

    def text(s: org.apache.spark.sql.SparkSession) = {
      val a = Tables.lineitem(s, sf)
      val b = Tables.lineitem(s, sf)
      a.join(b, a("l_orderkey") === b("l_orderkey") &&
          a("l_linenumber") === b("l_linenumber"))
        .join(Tables.orders(s, sf), a("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, sf), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"),
          sum(b("l_quantity").cast("bigint")).as("sum_qty"))
    }
    val off = CatalogRules.sessionWith(spark, Nil,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    assert(firstJoinTables(text(off)) === Set("lineitem"))
    assert(on.schema === text(off).schema)
    assert(sortedRows(on) === sortedRows(text(off)))

    // Without the COUNTED composite entry the edge is uncostable and
    // the whole chain stays as written — per-column ndvs are never
    // combined (independence would overestimate a correlated key's
    // ndv and underprice the join).
    val st = StatsPhases.collected(spark, sf)
    val compKey = CatalogRules.compositeKey(Seq("l_orderkey", "l_linenumber"))
    assert(st.tables("lineitem").ndv.contains(compKey),
      "the ANALYZE collector must count the composite entry")
    val noComp = CatalogRules.CatalogStats(st.tables.updated("lineitem",
      st.tables("lineitem").copy(
        ndv = st.tables("lineitem").ndv - compKey)))
    val blind = CatalogRules.sessionWith(spark,
      Seq(CatalogJoinOrderRule(noComp)),
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    assert(firstJoinTables(text(blind)) === Set("lineitem"),
      firstJoinTables(text(blind)))
  }

  test("composite keys are orientation-insensitive: swapped conjunct order and swapped equality sides meet the same catalog entry and reorder identically") {
    assert(CatalogRules.compositeKey(Seq("b", "a"))
      === CatalogRules.compositeKey(Seq("a", "b")))
    import graft.queries.StatsPhases
    val st = StatsPhases.collected(spark, sf)
    val child = CatalogRules.sessionWith(spark,
      Seq(CatalogJoinOrderRule(st)),
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    // q268's chain with the composite condition written BACKWARDS —
    // conjuncts swapped AND each equality's sides flipped
    val a = Tables.lineitem(child, sf)
    val b = Tables.lineitem(child, sf)
    val df = a.join(b, b("l_linenumber") === a("l_linenumber") &&
        b("l_orderkey") === a("l_orderkey"))
      .join(Tables.orders(child, sf), a("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(child, sf), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"))
    assert(firstJoinTables(df) === Set("orders", "customer"),
      firstJoinTables(df))
  }

  test("composite eager aggregation: fires on a counted composite-unique dim, refuses without the composite entry; same rows") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    // A dim whose UNIQUENESS only holds on the column PAIR — the
    // (supplier, returnflag) enrichment table every routing pipeline
    // keeps; each column alone repeats.
    val dir = java.nio.file.Files.createTempDirectory("compdim").toString
    val li = Tables.lineitem(spark, sf)
    li.select(col("l_suppkey").as("sf_suppkey"),
        col("l_returnflag").as("sf_flag")).distinct()
      .withColumn("label",
        concat_ws("-", col("sf_suppkey"), col("sf_flag")))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/suppflag.parquet")
    val dimN = spark.read.parquet(s"$dir/suppflag.parquet").count()
    val liN = li.count()
    val compLi = CatalogRules.compositeKey(Seq("l_suppkey", "l_returnflag"))
    val compSf = CatalogRules.compositeKey(Seq("sf_suppkey", "sf_flag"))
    assert(liN / dimN >= 4, "fixture must clear the reduction gate")
    val st = CatalogRules.CatalogStats(Map(
      "lineitem" -> CatalogRules.TableStat(liN, Map(compLi -> dimN),
        CatalogRules.StatProvenance.Exact,
        Some(CatalogRules.normalizePath(graft.Tables.path(sf, "lineitem")))),
      "suppflag" -> CatalogRules.TableStat(dimN, Map(compSf -> dimN),
        CatalogRules.StatProvenance.Exact,
        Some(CatalogRules.normalizePath(s"$dir/suppflag.parquet")))))
    def fired(df: DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collectFirst {
        case Join(l, _, _, _, _) if l.collectFirst {
          case a: Aggregate
              if CatalogRules.tableOf(a.child).contains("lineitem") => a
        }.isDefined => true
      }.getOrElse(false)
    def text(s: org.apache.spark.sql.SparkSession) =
      Tables.lineitem(s, sf)
        .join(s.read.parquet(s"$dir/suppflag.parquet"),
          col("l_suppkey") === col("sf_suppkey") &&
            col("l_returnflag") === col("sf_flag"))
        .groupBy("label")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("bigint")).as("sum_qty"))
    val onS = CatalogRules.sessionWith(spark, Seq(EagerAggregationRule(st)),
      "spark.sql.ansi.enabled" -> "false")
    assert(fired(text(onS)),
      text(onS).queryExecution.optimizedPlan.toString)
    val off = CatalogRules.sessionWith(spark, Nil)
    assert(sortedRows(text(onS)) === sortedRows(text(off)))
    // per-column ndvs alone — even both exactly unique-looking — must
    // not prove the tuple: the composite entry is the only evidence
    val perCol = CatalogRules.CatalogStats(st.tables.updated("suppflag",
      st.tables("suppflag").copy(
        ndv = Map("sf_suppkey" -> dimN, "sf_flag" -> dimN))))
    val noComp = CatalogRules.sessionWith(spark,
      Seq(EagerAggregationRule(perCol)), "spark.sql.ansi.enabled" -> "false")
    assert(!fired(text(noComp)))
  }

  test("q272: mixed grouping keys — fact-side keys join the inner grouping; missing the (fk x group) composite entry stands down; same rows") {
    import graft.queries.StatsPhases
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val on = SparkEntry.queries("q272_eager_mixed_grouping")(spark, sf)
    // the inner aggregate sits below the join and groups by BOTH the
    // join key and the fact-side grouping column
    val innerAgg = on.queryExecution.optimizedPlan.collectFirst {
      case Join(l, _, _, _, _) => l.collectFirst {
        case a: Aggregate
            if CatalogRules.tableOf(a.child).contains("lineitem") => a
      }
    }.flatten
    assert(innerAgg.isDefined, on.queryExecution.optimizedPlan.toString)
    val innerKeys = innerAgg.get.groupingExpressions
      .collect { case a: org.apache.spark.sql.catalyst.expressions
          .AttributeReference => a.name }.toSet
    assert(innerKeys === Set("l_suppkey", "l_returnflag"), innerKeys)

    def text(s: org.apache.spark.sql.SparkSession) =
      Tables.lineitem(s, sf)
        .join(Tables.supplier(s, sf), col("l_suppkey") === col("s_suppkey"))
        .groupBy("l_returnflag", "s_name")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("bigint")).as("sum_qty"))
    val off = CatalogRules.sessionWith(spark, Nil)
    assert(on.schema === text(off).schema)
    assert(sortedRows(on) === sortedRows(text(off)))

    // without the counted (l_returnflag+l_suppkey) entry the gate has
    // no evidence at the inner grain — stand down (per-column ndvs are
    // never combined)
    val st = StatsPhases.collected(spark, sf)
    val grainKey = CatalogRules.compositeKey(Seq("l_suppkey", "l_returnflag"))
    val noGrain = CatalogRules.CatalogStats(st.tables.updated("lineitem",
      st.tables("lineitem").copy(
        ndv = st.tables("lineitem").ndv - grainKey)))
    val blind = CatalogRules.sessionWith(spark,
      Seq(EagerAggregationRule(noGrain)), "spark.sql.ansi.enabled" -> "false")
    val blindAgg = text(blind).queryExecution.optimizedPlan.collectFirst {
      case Join(l, _, _, _, _) => l.collectFirst { case a: Aggregate => a }
    }.flatten
    assert(blindAgg.isEmpty)
  }

  test("q273: grouping sets push fact partials below the join — the Expand multiplies partials, not fact rows; no proof keeps the fact-grain Expand; same rows") {
    import graft.queries.StatsPhases
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand => LExpand, Join => LJoin}
    def pushedUnderExpand(df: DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collectFirst {
        case e: LExpand if e.child.collectFirst {
          case LJoin(l, _, _, _, _) => l.collectFirst {
            case a: Aggregate
                if CatalogRules.tableOf(a.child).contains("lineitem") => a
          }
        }.flatten.isDefined => true
      }.getOrElse(false)
    val on = SparkEntry.queries("q273_eager_rollup")(spark, sf)
    assert(pushedUnderExpand(on), on.queryExecution.optimizedPlan.toString)

    def text(s: org.apache.spark.sql.SparkSession) =
      Tables.lineitem(s, sf)
        .join(Tables.supplier(s, sf), col("l_suppkey") === col("s_suppkey"))
        .rollup(col("l_returnflag"), col("s_name"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("bigint")).as("sum_qty"))
    val off = CatalogRules.sessionWith(spark, Nil,
      "spark.sql.ansi.enabled" -> "false")
    assert(!pushedUnderExpand(text(off)))
    assert(on.schema === text(off).schema)
    assert(sortedRows(on) === sortedRows(text(off)))

    // no uniqueness proof: the Expand shape stands down like the flat one
    val noProof = CatalogRules.sessionWith(spark,
      Seq(EagerAggregationRule(CatalogRules.CatalogStats(Map.empty))),
      "spark.sql.ansi.enabled" -> "false")
    assert(!pushedUnderExpand(text(noProof)))
    // missing the inner-grain composite entry: stand down
    val st = StatsPhases.collected(spark, sf)
    val grainKey = CatalogRules.compositeKey(Seq("l_suppkey", "l_returnflag"))
    val noGrain = CatalogRules.CatalogStats(st.tables.updated("lineitem",
      st.tables("lineitem").copy(
        ndv = st.tables("lineitem").ndv - grainKey)))
    val blind = CatalogRules.sessionWith(spark,
      Seq(EagerAggregationRule(noGrain)), "spark.sql.ansi.enabled" -> "false")
    assert(!pushedUnderExpand(text(blind)))
    // a dim-side aggregate under the Expand refuses outright
    val proofS = CatalogRules.sessionWith(spark,
      Seq(EagerAggregationRule(st)), "spark.sql.ansi.enabled" -> "false")
    val dimAgg = Tables.lineitem(proofS, sf)
      .join(Tables.supplier(proofS, sf), col("l_suppkey") === col("s_suppkey"))
      .rollup(col("l_returnflag"), col("s_name"))
      .agg(sum(col("s_acctbal").cast("bigint")).as("s"))
    assert(!pushedUnderExpand(dimAgg))
  }

  test("eager aggregation's SUM fold stands down under ANSI mode: regrouped partials can throw on an intermediate overflow where the direct sum would not") {
    import graft.queries.StatsPhases
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val st = StatsPhases.collected(spark, sf)
    def fired(df: DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collectFirst {
        case Join(l, r, _, _, _) if (l.collectFirst {
          case a: Aggregate if CatalogRules.tableOf(a.child).contains("lineitem") => a
        }).orElse(r.collectFirst {
          case a: Aggregate if CatalogRules.tableOf(a.child).contains("lineitem") => a
        }).isDefined => true
      }.getOrElse(false)
    def text(s: org.apache.spark.sql.SparkSession) =
      Tables.lineitem(s, sf)
        .join(Tables.supplier(s, sf), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(sum(col("l_quantity").cast("bigint")).as("sum_qty"))
    val ansiOn = CatalogRules.sessionWith(spark, Seq(EagerAggregationRule(st)),
      "spark.sql.ansi.enabled" -> "true")
    assert(!fired(text(ansiOn)),
      "integral-SUM wraparound associativity only holds under non-ANSI eval")
    val ansiOff = CatalogRules.sessionWith(spark, Seq(EagerAggregationRule(st)),
      "spark.sql.ansi.enabled" -> "false")
    assert(fired(text(ansiOff)))
  }

  test("q274: eager aggregation peels a proven-unique dim CHAIN — the fact partial sits below BOTH joins; ONE unproven dim stands the whole rewrite down; same rows") {
    import graft.queries.StatsPhases
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    // Every Join node whose subtree holds the pushed lineitem partial:
    // 2 in the chain shape (the partial is below both rejoins), 0 when
    // the rule stands down.
    def joinsAbovePartial(df: DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case j: Join if j.collectFirst {
          case a: Aggregate
              if CatalogRules.tableOf(a.child).contains("lineitem") => a
        }.isDefined => j
      }.length
    val on = SparkEntry.queries("q274_eager_chain")(spark, sf)
    assert(joinsAbovePartial(on) === 2,
      on.queryExecution.optimizedPlan.toString)
    def text(s: org.apache.spark.sql.SparkSession) =
      Tables.lineitem(s, sf)
        .join(Tables.supplier(s, sf), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.nation(s, sf), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("bigint")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double")
            .as("sum_price"))
    val off = CatalogRules.sessionWith(spark, Nil,
      "spark.sql.ansi.enabled" -> "false")
    val offDf = text(off)
    assert(joinsAbovePartial(offDf) === 0)
    assert(on.schema === offDf.schema)
    assert(sortedRows(on) === sortedRows(offDf))
    // the proof composes STEP-wise: drop nation's entry and the whole
    // chain stands down — a half-proven chain must not half-fire
    val st = StatsPhases.collected(spark, sf)
    val noNation = CatalogRules.CatalogStats(st.tables - "nation")
    val half = CatalogRules.sessionWith(spark,
      Seq(EagerAggregationRule(noNation)), "spark.sql.ansi.enabled" -> "false")
    assert(joinsAbovePartial(text(half)) === 0)
    // grouping keys on an INNER dim compose with the chain (the q272
    // mixed shape): s_name rides supplier's rejoin verbatim while the
    // fact still exchanges at l_suppkey grain below both joins
    val onS = CatalogRules.sessionWith(spark, Seq(EagerAggregationRule(st)),
      "spark.sql.ansi.enabled" -> "false")
    val mixed = Tables.lineitem(onS, sf)
      .join(Tables.supplier(onS, sf), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(onS, sf), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name", "s_name")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("bigint")).as("sum_qty"))
    assert(joinsAbovePartial(mixed) === 2,
      mixed.queryExecution.optimizedPlan.toString)
    val mixedOff = Tables.lineitem(off, sf)
      .join(Tables.supplier(off, sf), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(off, sf), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name", "s_name")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("bigint")).as("sum_qty"))
    assert(sortedRows(mixed) === sortedRows(mixedOff))
  }

  test("name-shadowing dim refuses (r21): an aliasing Project on the dim side stands eager aggregation down even when the alias NAME carries a unique-proven stat") {
    import graft.queries.StatsPhases
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    def joinsAbovePartial(df: DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case j: Join if j.collectFirst {
          case a: Aggregate
              if CatalogRules.tableOf(a.child).contains("lineitem") => a
        }.isDefined => j
      }.length
    val st = StatsPhases.collected(spark, sf)
    val on = CatalogRules.sessionWith(spark, Seq(EagerAggregationRule(st)),
      "spark.sql.ansi.enabled" -> "false")
    // The dim subtree renames NON-unique s_nationkey to the NAME of the
    // proven-unique key. tableOf/scanPath still recognize supplier and
    // the name-keyed ndv entry says "unique" — only the verbatim-leaf
    // guard can tell the joined attribute is a different column. Firing
    // here would duplicate partials (~25 suppliers per nationkey).
    def shadowText(s: org.apache.spark.sql.SparkSession) =
      Tables.lineitem(s, sf)
        .join(Tables.supplier(s, sf)
            .select(col("s_nationkey").as("s_suppkey"), col("s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("bigint")).as("sum_qty"))
    assert(joinsAbovePartial(shadowText(on)) === 0,
      shadowText(on).queryExecution.optimizedPlan.toString)
    // same text against the REAL unique key still fires — the guard
    // refuses aliases, not the proven shape
    def verbatimText(s: org.apache.spark.sql.SparkSession) =
      Tables.lineitem(s, sf)
        .join(Tables.supplier(s, sf).select(col("s_suppkey"), col("s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("bigint")).as("sum_qty"))
    assert(joinsAbovePartial(verbatimText(on)) === 1,
      verbatimText(on).queryExecution.optimizedPlan.toString)
    // rows: the stood-down shadow query equals a rule-free session's
    val off = CatalogRules.sessionWith(spark, Nil,
      "spark.sql.ansi.enabled" -> "false")
    assert(sortedRows(shadowText(on)) === sortedRows(shadowText(off)))
  }

  test("q278: grouping sets compose with the dim chain — the Expand multiplies chain-joined partials, pushed below both joins; conf face fires both new gates from the published grammars") {
    import graft.queries.{MvPhases, StatsPhases}
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, Join}
    def joinsAbovePartial(df: DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case j: Join if j.collectFirst {
          case a: Aggregate
              if CatalogRules.tableOf(a.child).contains("lineitem") => a
        }.isDefined => j
      }.length
    val on = SparkEntry.queries("q278_eager_chain_rollup")(spark, sf)
    assert(joinsAbovePartial(on) === 2,
      on.queryExecution.optimizedPlan.toString)
    // the Expand sits ABOVE the rejoined chain (it multiplies
    // partials per set, never fact rows)
    assert(on.queryExecution.optimizedPlan.collectFirst {
      case e: Expand if e.collectFirst { case _: Join => () }.isDefined => e
    }.isDefined)
    val off = CatalogRules.sessionWith(spark, Nil,
      "spark.sql.ansi.enabled" -> "false")
    val offDf = Tables.lineitem(off, sf)
      .join(Tables.supplier(off, sf), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(off, sf), col("s_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("bigint")).as("sum_qty"))
    assert(on.schema === offDf.schema)
    assert(sortedRows(on) === sortedRows(offDf))

    // conf face: the CHAIN and the COMPUTED grain both fire from the
    // PUBLISHED grammars — the join-order stats string carries the
    // exprKey composite entry unescaped, the exactstats string carries
    // every dim's path, so a config-only deployment gets q274/q277/q278
    // with zero code installed
    val confS = CatalogRules.sessionWith(spark,
      Seq(ConfEagerAggregationRule),
      "spark.sql.ansi.enabled" -> "false",
      ConfCatalogJoinOrderRule.StatsConf -> StatsPhases.confJoinOrder(spark, sf),
      ConfMvRewriteRule.ExactConf -> StatsPhases.confExact(spark, sf))
    val chainConf = Tables.lineitem(confS, sf)
      .join(Tables.supplier(confS, sf), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(confS, sf), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("bigint")).as("sum_qty"))
    assert(joinsAbovePartial(chainConf) === 2,
      chainConf.queryExecution.optimizedPlan.toString)
    val computedConf = Tables.eventsTsNs(confS, sf)
      .join(Tables.customer(confS, sf), col("user_id") === col("c_custkey"))
      .groupBy(
        expr(graft.operators.Resample.floorDivSql("ts", MvPhases.WeekNs))
          .as("week_idx"),
        col("c_mktsegment"))
      // count(1) alone has no references to orient the fact side — the
      // rule needs at least one referencing aggregate (by design)
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("bigint")).as("sum_value"))
    val computedFired = computedConf.queryExecution.optimizedPlan.collectFirst {
      case j: Join if j.collectFirst {
        case a: Aggregate
            if CatalogRules.tableOf(a.child).contains("events") &&
              a.groupingExpressions.exists(
                !_.isInstanceOf[AttributeReference]) => a
      }.isDefined => true
    }.getOrElse(false)
    assert(computedFired, computedConf.queryExecution.optimizedPlan.toString)
  }

  test("q277: a computed fact-side grouping key pushes into the inner aggregate's grouping; no counted grain entry, no rewrite; same rows") {
    import graft.queries.{MvPhases, StatsPhases}
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    // The pushed shape: an aggregate over the events base BELOW the
    // join whose grouping includes a NON-attribute expression (the
    // week bucket, evaluated at the inner grain).
    def fired(df: DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collectFirst {
        case j: Join if j.collectFirst {
          case a: Aggregate
              if CatalogRules.tableOf(a.child).contains("events") &&
                a.groupingExpressions.exists(
                  !_.isInstanceOf[AttributeReference]) => a
        }.isDefined => true
      }.getOrElse(false)
    val on = SparkEntry.queries("q277_eager_computed_key")(spark, sf)
    assert(fired(on), on.queryExecution.optimizedPlan.toString)
    def text(s: org.apache.spark.sql.SparkSession) =
      Tables.eventsTsNs(s, sf)
        .join(Tables.customer(s, sf), col("user_id") === col("c_custkey"))
        .groupBy(
          expr(graft.operators.Resample.floorDivSql("ts", MvPhases.WeekNs))
            .as("week_idx"),
          col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,4)")).cast("double")
            .as("sum_value"))
    val off = CatalogRules.sessionWith(spark, Nil,
      "spark.sql.ansi.enabled" -> "false")
    val offDf = text(off)
    assert(!fired(offDf))
    assert(on.schema === offDf.schema)
    assert(sortedRows(on) === sortedRows(offDf))
    // the gate prices the COMPUTED grain through its own counted
    // entry (exprKey over the probe-derived canonical); without it the
    // rewrite stands down — per-column ndvs are never combined
    val st = StatsPhases.collected(spark, sf)
    val wk = StatsPhases.weekGrainKey(spark, sf)
    assert(st.tables("events").ndv.contains(wk),
      "collector must store the computed grain under the exprKey name")
    val noGrain = CatalogRules.CatalogStats(st.tables.updated("events",
      st.tables("events").copy(ndv = st.tables("events").ndv - wk)))
    val bare = CatalogRules.sessionWith(spark,
      Seq(EagerAggregationRule(noGrain)), "spark.sql.ansi.enabled" -> "false")
    assert(!fired(text(bare)))
  }

  test("the decimal SUM fold's deployment switch: spark.graft.eageragg.decimalfold=false refuses decimal sums while COUNT/MIN/integral keep folding") {
    import graft.queries.StatsPhases
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    def fired(df: DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collectFirst {
        case j: Join if j.collectFirst {
          case a: Aggregate
              if CatalogRules.tableOf(a.child).contains("lineitem") => a
        }.isDefined => true
      }.getOrElse(false)
    val st = StatsPhases.collected(spark, sf)
    val s = CatalogRules.sessionWith(spark, Seq(EagerAggregationRule(st)),
      "spark.sql.ansi.enabled" -> "false",
      EagerAggregationRule.DecimalFoldConf -> "false")
    val dec = Tables.lineitem(s, sf)
      .join(Tables.supplier(s, sf), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("s"))
    assert(!fired(dec),
      "decimal sums must stand down under the deployment switch — the " +
        "only fold whose loud guard can fail a query the direct plan " +
        "completes")
    val rest = Tables.lineitem(s, sf)
      .join(Tables.supplier(s, sf), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("bigint")).as("sum_qty"),
        min(col("l_quantity")).as("min_qty"))
    assert(fired(rest), "the switch must not disable the rest of the menu")
  }

  test("the decimal fold's companion count raises LOUDLY on partial-ACCUMULATOR overflow (null sum over a positive count), and still passes a legitimately-null all-null group") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    import org.apache.spark.sql.types.{DecimalType, LongType, StringType, StructField, StructType}
    // decimal(38,0) input: Sum's accumulator caps at the SAME width
    // (min(38+10, 38)), so two near-max values overflow the partial
    // itself — the silent-null path the companion count disambiguates
    // from an all-null group (ADVICE r19: the fold was inconsistent
    // with narrowExact's accumulator-overflow branch).
    val dir = java.nio.file.Files.createTempDirectory("eaovf").toString
    val big = new java.math.BigDecimal(
      "89999999999999999999999999999999999999") // ~9e37, fits decimal(38,0)
    val factSchema = StructType(Seq(
      StructField("k", LongType), StructField("v", DecimalType(38, 0))))
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(
        Row(1L, big), Row(1L, big),
        Row(2L, null), Row(2L, null))), factSchema)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/eafact.parquet")
    val dimSchema = StructType(Seq(
      StructField("k2", LongType), StructField("name", StringType)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(
        Row(1L, "x"), Row(2L, "y"))), dimSchema)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/eadim.parquet")
    val stats = CatalogRules.CatalogStats(Map(
      "eafact" -> CatalogRules.TableStat(4, Map("k" -> 2)),
      "eadim" -> CatalogRules.TableStat(2, Map("k2" -> 2),
        provenance = CatalogRules.StatProvenance.Exact,
        path = Some(CatalogRules.normalizePath(s"$dir/eadim.parquet")))))
    val s = CatalogRules.sessionWith(spark,
      Seq(EagerAggregationRule(stats, minReduction = 2)),
      "spark.sql.ansi.enabled" -> "false")
    def fired(df: DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collectFirst {
        case j: Join if j.collectFirst {
          case a: Aggregate
              if CatalogRules.tableOf(a.child).contains("eafact") => a
        }.isDefined => true
      }.getOrElse(false)
    def q(filterKey: Option[Long]) = {
      val base = s.read.parquet(s"$dir/eafact.parquet")
      filterKey.map(k => base.filter(col("k") === k)).getOrElse(base)
        .join(s.read.parquet(s"$dir/eadim.parquet"),
          col("k") === col("k2"))
        .groupBy("name").agg(sum(col("v")).as("s"))
    }
    val overflowing = q(None)
    assert(fired(overflowing), overflowing.queryExecution.optimizedPlan.toString)
    val e = intercept[Exception] { overflowing.collect() }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + msgs(t.getCause)
    assert(msgs(e).contains("accumulator"),
      s"expected the loud accumulator-overflow guard, got: ${msgs(e)}")
    // all-null group: null sum over count 0 is LEGITIMATE — passes
    // through as null, no raise (the disambiguation working)
    val allNull = q(Some(2L))
    assert(fired(allNull))
    assert(sortedRows(allNull) === Seq(Row("y", null).toString))
  }

  test("trust boundary, probed adversarially: a FALSE declared constraint is trusted (fires), yet the re-aggregating fold menu is multiplicity-linear — rows survive even that") {
    import graft.queries.StatsPhases
    // A dim whose key is genuinely NON-unique: supplier unioned with
    // itself, written under the same basename so the rules recognize it.
    val dupDir = java.nio.file.Files.createTempDirectory("dupdim").toString
    val sup = Tables.supplier(spark, sf)
    sup.unionByName(sup).coalesce(1)
      .write.mode("overwrite").parquet(s"$dupDir/supplier.parquet")
    val st = StatsPhases.collected(spark, sf)
    val n2 = 2 * Tables.supplier(spark, sf).count()
    // The deployer DECLARES (falsely) that s_suppkey is unique. Declared
    // constraints are trusted — the database-PK contract — so the
    // rewrite fires on the duplicate-keyed dim:
    val falseClaim = CatalogRules.CatalogStats(Map(
      "lineitem" -> st.tables("lineitem"),
      "supplier" -> CatalogRules.TableStat(n2, Map("s_suppkey" -> n2),
        provenance = CatalogRules.StatProvenance.Exact,
        path = Some(CatalogRules.normalizePath(
          s"$dupDir/supplier.parquet")))))
    def text(s: org.apache.spark.sql.SparkSession) =
      Tables.lineitem(s, sf)
        .join(s.read.parquet(s"$dupDir/supplier.parquet"),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("bigint")).as("sum_qty"),
          min(col("l_quantity")).as("min_qty"))
    val trusted = CatalogRules.sessionWith(spark,
      Seq(EagerAggregationRule(falseClaim)),
      "spark.sql.ansi.enabled" -> "false")
    val fired = text(trusted).queryExecution.optimizedPlan.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.left.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Aggregate] ||
            j.right.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Aggregate] => j
    }.isDefined
    assert(fired, "a declared constraint must be trusted — that is the contract")
    // ...and yet the rows survive: with a FULL re-aggregation above the
    // join, a key with multiplicity m multiplies the direct result and
    // the joined partials EQUALLY (SUM/COUNT scale linearly in m,
    // MIN/MAX are idempotent), so the implemented fold menu is robust
    // even to a false declaration. The proof is defense in depth — it
    // becomes load-bearing the moment a shape passes partials through
    // WITHOUT re-aggregating (the q252 MV-join rewrite's documented
    // reasoning), and it keeps estimated catalogs from ever being
    // mistaken for declarations. This pin makes the boundary's actual
    // mechanics a tested fact rather than folklore.
    val off = CatalogRules.sessionWith(spark, Nil)
    assert(sortedRows(text(trusted)) === sortedRows(text(off)))
  }

  // -------------------------------------------------- ConjunctReorderRule

  test("q246: selective comparison evaluates before the unselective one, null guards first; rule-off keeps written order; same rows") {
    val on = SparkEntry.queries("q246_rule_conjunct_order")(spark, sf)
    val cs = conjuncts(on)
    val qtyIdx = cs.indexWhere(e =>
      !e.isInstanceOf[IsNotNull] && e.references.map(_.name).toSet == Set("l_quantity"))
    val priceIdx = cs.indexWhere(e =>
      !e.isInstanceOf[IsNotNull] && e.references.map(_.name).toSet == Set("l_extendedprice"))
    assert(qtyIdx >= 0 && priceIdx >= 0, cs.mkString("; "))
    assert(qtyIdx < priceIdx, cs.mkString("; "))
    cs.takeWhile(_.isInstanceOf[IsNotNull]) // null guards, if present, lead
      .foreach(e => assert(e.isInstanceOf[IsNotNull]))

    val off = CatalogRules.sessionWith(spark, Nil)
    val offDf = Tables.lineitem(off, sf)
      .filter(col("l_extendedprice") >= 1000.0 && col("l_quantity") >= 45.0)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double")
          .as("sum_price"))
    val csOff = conjuncts(offDf)
    val qtyOff = csOff.indexWhere(e =>
      !e.isInstanceOf[IsNotNull] && e.references.map(_.name).toSet == Set("l_quantity"))
    val priceOff = csOff.indexWhere(e =>
      !e.isInstanceOf[IsNotNull] && e.references.map(_.name).toSet == Set("l_extendedprice"))
    assert(priceOff < qtyOff, csOff.mkString("; "))
    assert(sortedRows(on) === sortedRows(offDf))
  }

  test("q254: MCV-costed equality evaluates before the unselective range test; rule-off keeps written order; same rows") {
    val on = SparkEntry.queries("q254_rule_conjunct_equality")(spark, sf)
    val cs = conjuncts(on)
    val eqIdx = cs.indexWhere(e =>
      !e.isInstanceOf[IsNotNull] && e.references.map(_.name).toSet == Set("l_suppkey"))
    val priceIdx = cs.indexWhere(e =>
      !e.isInstanceOf[IsNotNull] && e.references.map(_.name).toSet == Set("l_extendedprice"))
    assert(eqIdx >= 0 && priceIdx >= 0, cs.mkString("; "))
    assert(eqIdx < priceIdx, cs.mkString("; "))
    cs.takeWhile(_.isInstanceOf[IsNotNull])
      .foreach(e => assert(e.isInstanceOf[IsNotNull]))

    val off = CatalogRules.sessionWith(spark, Nil)
    val offDf = Tables.lineitem(off, sf)
      .filter(col("l_extendedprice") >= 1000.0 && col("l_suppkey") === 1)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double")
          .as("sum_price"))
    val csOff = conjuncts(offDf)
    val eqOff = csOff.indexWhere(e =>
      !e.isInstanceOf[IsNotNull] && e.references.map(_.name).toSet == Set("l_suppkey"))
    val priceOff = csOff.indexWhere(e =>
      !e.isInstanceOf[IsNotNull] && e.references.map(_.name).toSet == Set("l_extendedprice"))
    assert(priceOff < eqOff, csOff.mkString("; "))
    assert(sortedRows(on) === sortedRows(offDf))
  }

  test("eqFraction: MCV members cost their exact mass, the tail gets the uniform remainder, degenerate shapes stay bounded") {
    import ConjunctReorderRule.ColumnMcv
    val m = ColumnMcv(n = 1000L, ndv = 12L,
      top = Map("1.0" -> 400L, "2.0" -> 300L))
    assert(m.eqFraction("1.0") === 0.4)
    assert(m.eqFraction("2.0") === 0.3)
    // tail: (1000 - 700) / (12 - 2) = 30 rows
    assert(m.eqFraction("9.0") === 0.03)
    // every value in the list: tail has no remaining ndv -> 0
    val full = ColumnMcv(10L, 2L, Map("1.0" -> 6L, "2.0" -> 4L))
    assert(full.eqFraction("3.0") === 0.0)
    // string values are their own keys; numeric spellings all meet at
    // Double.toString's rendering — "1", "1.0" and 1L cannot drift
    val s = ColumnMcv(100L, 4L, Map(ColumnMcv.key("A") -> 50L))
    assert(s.eqFraction(ColumnMcv.key("A")) === 0.5)
    assert(ColumnMcv.key("1") === "1.0")
    assert(ColumnMcv.key("1.0") === "1.0")
    assert(ColumnMcv.key("A") === "A")
    // all fractions bounded [0, 1] under arbitrary CONSISTENT shapes
    // (mcv mass <= n, ndv >= k — what any counting collector produces)
    val rng = new scala.util.Random(11)
    (1 to 50).foreach { _ =>
      val k = 1 + rng.nextInt(8)
      val top = (1 to k).map(i => ColumnMcv.key(i.toString) -> (1L + rng.nextInt(1000)))
        .toMap
      val n = top.values.sum + rng.nextInt(100000)
      val mc = ColumnMcv(n, (k + rng.nextInt(100)).toLong, top)
      (0 to 12).map(i => ColumnMcv.key(i.toString)).foreach { v =>
        val f = mc.eqFraction(v)
        assert(f >= 0.0 && f <= 1.0, s"$f out of range for v=$v in $mc")
      }
    }
  }

  test("q260: string-equality conjunct costed from the MCV catalog evaluates first; rule-off keeps written order; same rows") {
    val on = SparkEntry.queries("q260_rule_conjunct_string")(spark, sf)
    val cs = conjuncts(on)
    val eqIdx = cs.indexWhere(e =>
      !e.isInstanceOf[IsNotNull] && e.references.map(_.name).toSet == Set("l_returnflag"))
    val priceIdx = cs.indexWhere(e =>
      !e.isInstanceOf[IsNotNull] && e.references.map(_.name).toSet == Set("l_extendedprice"))
    assert(eqIdx >= 0 && priceIdx >= 0, cs.mkString("; "))
    assert(eqIdx < priceIdx, cs.mkString("; "))

    val off = CatalogRules.sessionWith(spark, Nil)
    val offDf = Tables.lineitem(off, sf)
      .filter(col("l_extendedprice") >= 1000.0 && col("l_returnflag") === "A")
      .groupBy("l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double")
          .as("sum_price"))
    val csOff = conjuncts(offDf)
    val eqOff = csOff.indexWhere(e =>
      !e.isInstanceOf[IsNotNull] && e.references.map(_.name).toSet == Set("l_returnflag"))
    val priceOff = csOff.indexWhere(e =>
      !e.isInstanceOf[IsNotNull] && e.references.map(_.name).toSet == Set("l_extendedprice"))
    assert(priceOff < eqOff, csOff.mkString("; "))
    assert(sortedRows(on) === sortedRows(offDf))
  }

  test("q261: the conf-installed stack fires the same three effects as the programmatic q253 stack; same rows") {
    val on = SparkEntry.queries("q261_conf_stack")(spark, sf)
    // join-order effect from the conf catalog
    assert(firstJoinTables(on) === Set("orders", "customer"))
    // broadcast effect from the conf row counts
    assert(physical(on).contains("BroadcastHashJoin"), physical(on))
    // conjunct effect from the conf histograms
    val cs = {
      val f = on.queryExecution.optimizedPlan.collect {
        case flt: org.apache.spark.sql.catalyst.plans.logical.Filter
            if flt.condition.references.map(_.name).exists(_ == "l_quantity") => flt
      }.head
      def split(e: Expression): Seq[Expression] = e match {
        case And(l, r) => split(l) ++ split(r)
        case other => Seq(other)
      }
      split(f.condition)
    }
    val qtyIdx = cs.indexWhere(e =>
      !e.isInstanceOf[IsNotNull] && e.references.map(_.name).toSet == Set("l_quantity"))
    val priceIdx = cs.indexWhere(e =>
      !e.isInstanceOf[IsNotNull] && e.references.map(_.name).toSet == Set("l_extendedprice"))
    assert(qtyIdx >= 0 && priceIdx >= 0 && qtyIdx < priceIdx, cs.mkString("; "))
    // row-identity with the programmatic stack (q253 — same text)
    val prog = SparkEntry.queries("q253_rules_composed")(spark, sf)
    assert(sortedRows(on) === sortedRows(prog))
  }

  test("ANALYZE -> publish round trip: the conf stack built from the published serializers plans IDENTICALLY to the in-session rules") {
    import graft.queries.{HistPhases, McvPhases, MvPhases, StatsPhases}
    MvPhases.ensureStored(spark, sf)
    MvPhases.ensureStoredSk(spark, sf)
    val st = StatsPhases.collected(spark, sf)
    val est = ConjunctReorderRule.estimator(
      HistPhases.collectedHists(spark, sf),
      McvPhases.collectedMcvs(spark, sf))
    val prog = CatalogRules.sessionWith(spark, Nil,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.ansi.enabled" -> "false")
    CatalogRules.installRules(prog,
      Seq(MvRewriteRule(
          Seq(MvPhases.mvDef(prog, sf), MvPhases.mvDefSk(prog, sf)), st),
        EagerAggregationRule(st), CatalogJoinOrderRule(st),
        ConjunctReorderRule(est),
        CatalogBroadcastRule(st.tables.map { case (t, s2) => t -> s2.rows })))
    // the conf session is configured ONLY by the published strings —
    // the exact payload an ANALYZE job would push to cluster config
    val conf = CatalogRules.sessionWith(spark,
      Seq(ConfMvRewriteRule, ConfEagerAggregationRule,
        ConfCatalogJoinOrderRule, ConfConjunctReorderRule,
        ConfCatalogBroadcastRule),
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.ansi.enabled" -> "false",
      ConfMvRewriteRule.DefsConf ->
        s"${MvPhases.mvDefConf(sf)}|${MvPhases.mvDefSkConf(sf)}",
      ConfMvRewriteRule.ExactConf -> StatsPhases.confExact(spark, sf),
      ConfCatalogJoinOrderRule.StatsConf ->
        StatsPhases.confJoinOrder(spark, sf),
      ConfConjunctReorderRule.HistsConf -> HistPhases.confString(spark, sf),
      ConfConjunctReorderRule.McvsConf -> McvPhases.confString(spark, sf),
      ConfCatalogBroadcastRule.RowsConf ->
        StatsPhases.confBroadcastRows(spark, sf))
    def planSig(df: DataFrame): String =
      df.queryExecution.optimizedPlan.toString.replaceAll("#\\d+L?", "#x")
    // three decision shapes: the FK-join MV rewrite (q252 text — needs
    // the published EXACT catalog's path field to prove uniqueness),
    // the eager avg fold (q271 text), the filtered-chain composition
    // (q253 text)
    def mvJoin(s: org.apache.spark.sql.SparkSession) =
      Tables.lineitem(s, sf)
        .join(Tables.supplier(s, sf), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
            .as("sum_qty"))
    def avg(s: org.apache.spark.sql.SparkSession) = avgJoin(s)
    def chain(s: org.apache.spark.sql.SparkSession) =
      Tables.lineitem(s, sf)
        .filter(col("l_extendedprice") >= 1000.0 && col("l_quantity") >= 45.0)
        .join(Tables.orders(s, sf), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, sf), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double")
            .as("sum_price"))
    // and the composite-key chain (q268 text) — the published
    // join-order stats carry the counted composite entries
    def composite(s: org.apache.spark.sql.SparkSession) = {
      val a = Tables.lineitem(s, sf)
      val b = Tables.lineitem(s, sf)
      a.join(b, a("l_orderkey") === b("l_orderkey") &&
          a("l_linenumber") === b("l_linenumber"))
        .join(Tables.orders(s, sf), a("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, sf), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"),
          sum(b("l_quantity").cast("bigint")).as("sum_qty"))
    }
    Seq[(String, org.apache.spark.sql.SparkSession => DataFrame)](
      ("mvJoin", mvJoin), ("avg", avg), ("chain", chain),
      ("composite", composite)).foreach {
      case (name, q) =>
        assert(planSig(q(conf)) === planSig(q(prog)), name)
        assert(sortedRows(q(conf)) === sortedRows(q(prog)), name)
    }
    // and the conf MV-join plan really did lose the fact scan — the
    // round trip carried the proof, not just the costs
    val leaves = mvJoin(conf).queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.catalogTable.map(_.identifier.table)
          .orElse(CatalogRules.tableOf(lr)).getOrElse("?")
    }.toSet
    assert(leaves === Set(MvPhases.skTable(sf), "supplier"), leaves)
  }

  test("q263: IN-list costed as summed member fractions evaluates before the unselective range; rule-off keeps written order; same rows") {
    import org.apache.spark.sql.catalyst.expressions.In
    val on = SparkEntry.queries("q263_rule_conjunct_inlist")(spark, sf)
    val cs = conjuncts(on)
    val inIdx = cs.indexWhere(e =>
      !e.isInstanceOf[IsNotNull] && e.references.map(_.name).toSet == Set("l_returnflag"))
    val priceIdx = cs.indexWhere(e =>
      !e.isInstanceOf[IsNotNull] && e.references.map(_.name).toSet == Set("l_extendedprice"))
    assert(inIdx >= 0 && priceIdx >= 0, cs.mkString("; "))
    assert(inIdx < priceIdx, cs.mkString("; "))

    val off = CatalogRules.sessionWith(spark, Nil)
    val offDf = Tables.lineitem(off, sf)
      .filter(col("l_extendedprice") >= 1000.0 &&
        col("l_returnflag").isin("A", "R"))
      .groupBy("l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double")
          .as("sum_price"))
    val csOff = conjuncts(offDf)
    val inOff = csOff.indexWhere(e =>
      !e.isInstanceOf[IsNotNull] && e.references.map(_.name).toSet == Set("l_returnflag"))
    val priceOff = csOff.indexWhere(e =>
      !e.isInstanceOf[IsNotNull] && e.references.map(_.name).toSet == Set("l_extendedprice"))
    assert(priceOff < inOff, csOff.mkString("; "))
    assert(sortedRows(on) === sortedRows(offDf))

    // IN fraction properties: sum of member masses, capped, null/
    // non-literal members uncostable
    import ConjunctReorderRule.ColumnMcv
    val est = ConjunctReorderRule.estimator(Map.empty,
      Map("f" -> ColumnMcv(100L, 3L, Map("A" -> 50L, "R" -> 30L, "N" -> 20L))))
    val attr = org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "f", org.apache.spark.sql.types.StringType)()
    def strLit(s: String) = org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString(s),
      org.apache.spark.sql.types.StringType)
    assert(est(In(attr, Seq(strLit("A"), strLit("R")))) === Some(0.8))
    // duplicate members count once; full membership caps at 1.0
    assert(est(In(attr, Seq(strLit("A"), strLit("A")))) === Some(0.5))
    assert(est(In(attr, Seq(strLit("A"), strLit("R"), strLit("N"),
      strLit("Z")))).exists(_ <= 1.0))
    // a null literal member makes the IN uncostable, not mispriced
    assert(est(In(attr, Seq(strLit("A"),
      org.apache.spark.sql.catalyst.expressions.Literal(null,
        org.apache.spark.sql.types.StringType)))).isEmpty)
  }

  test("conjunct rule leaves a chain with an uncostable predicate alone") {
    import ConjunctReorderRule.ColumnHist
    val est = ConjunctReorderRule.estimator(Map(
      "l_quantity" -> ColumnHist(1.0, 50.0, Vector.fill(16)(100L)),
      "l_extendedprice" -> ColumnHist(900.0, 105000.0, Vector.fill(16)(100L))))
    val child = CatalogRules.sessionWith(spark, Seq(ConjunctReorderRule(est)))
    val df = Tables.lineitem(child, sf)
      .filter(col("l_extendedprice") >= 1000.0 &&
        col("l_returnflag") === "A" && col("l_quantity") >= 45.0)
      .groupBy("l_linestatus").agg(count(lit(1)).as("cnt"))
    val cs = conjuncts(df)
    val qtyIdx = cs.indexWhere(e =>
      !e.isInstanceOf[IsNotNull] && e.references.map(_.name).toSet == Set("l_quantity"))
    val priceIdx = cs.indexWhere(e =>
      !e.isInstanceOf[IsNotNull] && e.references.map(_.name).toSet == Set("l_extendedprice"))
    // written order (price before quantity) survives: the opaque
    // equality makes the whole chain un-sortable by contract.
    assert(priceIdx < qtyIdx, cs.mkString("; "))
  }

  test("geFraction properties on random histograms: bounded, monotone non-increasing, edge-exact") {
    // The estimator only feeds a SORT, so the properties that matter
    // are ordering-grade: stay in [0,1], never increase with v, and
    // hit the edges exactly — under arbitrary bucket counts (including
    // all-zero) and arbitrary bounds.
    val rng = new scala.util.Random(7)
    (1 to 50).foreach { _ =>
      val b = 1 + rng.nextInt(32)
      val mn = rng.nextDouble() * 100 - 50
      val mx = mn + rng.nextDouble() * 1000 + 1e-6
      val counts = Vector.fill(b)(rng.nextInt(1000).toLong)
      val h = ConjunctReorderRule.ColumnHist(mn, mx, counts)
      val fr = (0 to 64).map(i => h.geFraction(mn - 1 + (mx - mn + 2) * i / 64.0))
      fr.foreach(f => assert(f >= 0.0 && f <= 1.0, s"$f out of range"))
      fr.sliding(2).foreach { case Seq(a, c) => assert(a + 1e-12 >= c, s"$a < $c") }
      assert(h.geFraction(mn) === 1.0)
      assert(h.geFraction(mx + 1.0) === 0.0)
    }
  }

  test("geFraction: interpolation is monotone and hits the edges") {
    import ConjunctReorderRule.ColumnHist
    val h = ColumnHist(0.0, 160.0, Vector.tabulate(16)(i => (i + 1).toLong))
    assert(h.geFraction(0.0) === 1.0)
    assert(h.geFraction(161.0) === 0.0)
    val samples = (0 to 32).map(i => h.geFraction(i * 5.0))
    samples.sliding(2).foreach { case Seq(a, b) => assert(a >= b) }
    // exact at a bucket boundary: buckets 8..15 hold 9+..+16 of 136
    assert(math.abs(h.geFraction(80.0) - (9 to 16).sum / 136.0) < 1e-12)
  }
}
