package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession, Tables}
import graft.queries.MvPhases

/** The MV rewrite's load-bearing claims, which the q249/q250 oracles
  * (base-table SQL in DuckDB) cannot see: the rewritten plan reads ONLY
  * the rollup, non-subsumed shapes bail to the fact scan, and the
  * rewrite changes no result.
  */
class MvRewriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf0001

  private def scanTables(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation =>
        lr.catalogTable.map(_.identifier.table)
          .orElse(CatalogRules.tableOf(lr))
          .getOrElse("?")
    }.toSet

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def mvSession() = {
    MvPhases.ensureStored(spark, sf)
    val child = CatalogRules.sessionWith(spark, Nil)
    CatalogRules.installRules(child,
      Seq(MvRewriteRule(Seq(MvPhases.mvDef(child, sf)))))
    child
  }

  test("q249: the full-grain aggregate reads only the rollup; rule-off reads lineitem; same rows") {
    val on = SparkEntry.queries("q249_mv_rewrite")(spark, sf)
    assert(scanTables(on) === Set(MvPhases.mvTable(sf)), scanTables(on))

    val off = CatalogRules.sessionWith(spark, Nil)
    val offDf = Tables.lineitem(off, sf)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double").as("sum_price"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_extendedprice")).as("max_price"))
    assert(scanTables(offDf) === Set("lineitem"))
    assert(on.schema === offDf.schema)
    assert(sortedRows(on) === sortedRows(offDf))
  }

  test("q250: coarser grain + dim filter reads only the rollup and matches the base computation") {
    val on = SparkEntry.queries("q250_mv_rewrite_coarser")(spark, sf)
    assert(scanTables(on) === Set(MvPhases.mvTable(sf)), scanTables(on))
    val off = Tables.lineitem(spark, sf)
      .filter(col("l_linestatus") === "F")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double")
          .as("sum_price"))
    assert(sortedRows(on) === sortedRows(off))
  }

  test("q252: join-shaped rewrite reads rollup + dim, never the fact table; bails without the uniqueness proof") {
    import graft.queries.{RelationalQueries, StatsPhases}
    val on = SparkEntry.queries("q252_mv_join_rewrite")(spark, sf)
    assert(scanTables(on) === Set(MvPhases.skTable(sf), "supplier"),
      scanTables(on))

    val off = CatalogRules.sessionWith(spark, Nil)
    val offDf = Tables.lineitem(off, sf)
      .join(Tables.supplier(off, sf), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
          .as("sum_qty"))
    assert(scanTables(offDf).contains("lineitem"))
    assert(on.schema === offDf.schema)
    assert(sortedRows(on) === sortedRows(offDf))

    // No stats -> uniqueness unprovable -> the join shape must bail.
    MvPhases.ensureStoredSk(spark, sf)
    val noProof = CatalogRules.sessionWith(spark, Nil)
    CatalogRules.installRules(noProof,
      Seq(MvRewriteRule(Seq(MvPhases.mvDefSk(noProof, sf)))))
    val np = Tables.lineitem(noProof, sf)
      .join(Tables.supplier(noProof, sf), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("cnt"))
    assert(scanTables(np).contains("lineitem"), scanTables(np))

    // Join key not a rollup dimension -> bail (the returnflag rollup
    // knows nothing about l_suppkey).
    val wrongMv = CatalogRules.sessionWith(spark, Nil)
    MvPhases.ensureStored(spark, sf)
    CatalogRules.installRules(wrongMv,
      Seq(MvRewriteRule(Seq(MvPhases.mvDef(wrongMv, sf)),
        StatsPhases.collected(spark, sf))))
    val wm = Tables.lineitem(wrongMv, sf)
      .join(Tables.supplier(wrongMv, sf), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("cnt"))
    assert(scanTables(wm).contains("lineitem"), scanTables(wm))

    // An aggregate over a DIM-side column is not foldable from the
    // rollup's partials -> bail.
    val dimAgg = CatalogRules.sessionWith(spark, Nil)
    CatalogRules.installRules(dimAgg,
      Seq(MvRewriteRule(Seq(MvPhases.mvDefSk(dimAgg, sf)),
        StatsPhases.collected(spark, sf))))
    val da = Tables.lineitem(dimAgg, sf)
      .join(Tables.supplier(dimAgg, sf), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(sum(col("s_acctbal").cast("decimal(18,4)")).as("sum_bal"))
    assert(scanTables(da).contains("lineitem"), scanTables(da))
  }

  test("trust boundary: approx stats numerically satisfying ndv == rows must NOT fire the join rewrite") {
    import CatalogRules.{CatalogStats, StatProvenance, TableStat}
    MvPhases.ensureStoredSk(spark, sf)
    val n = Tables.supplier(spark, sf).count()
    // Numerically a perfect uniqueness claim — but the provenance is
    // Approx (the TableStat DEFAULT — a collector that forgets to claim
    // its grade lands here), the grade an HLL catalog could reach by
    // estimation error; the proof must refuse it and keep the fact scan.
    val approx = CatalogStats(Map(
      "supplier" -> TableStat(n, Map("s_suppkey" -> n))))
    val child = CatalogRules.sessionWith(spark, Nil)
    CatalogRules.installRules(child,
      Seq(MvRewriteRule(Seq(MvPhases.mvDefSk(child, sf)), approx)))
    val df = Tables.lineitem(child, sf)
      .join(Tables.supplier(child, sf), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("cnt"))
    assert(scanTables(df).contains("lineitem"), scanTables(df))

    // The SAME numbers claimed Exact WITH the counted table's path fire
    // the rewrite — isolating the refusal to the provenance tag, not
    // the values.
    val supPath = CatalogRules.normalizePath(graft.Tables.path(sf, "supplier"))
    val exact = CatalogStats(Map(
      "supplier" -> TableStat(n, Map("s_suppkey" -> n),
        provenance = StatProvenance.Exact, path = Some(supPath))))
    val child2 = CatalogRules.sessionWith(spark, Nil)
    CatalogRules.installRules(child2,
      Seq(MvRewriteRule(Seq(MvPhases.mvDefSk(child2, sf)), exact)))
    val df2 = Tables.lineitem(child2, sf)
      .join(Tables.supplier(child2, sf), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("cnt"))
    assert(scanTables(df2) === Set(MvPhases.skTable(sf), "supplier"),
      scanTables(df2))

    // ...and the same Exact numbers WITHOUT a path refuse: a proof must
    // say WHICH table it counted — base identity is a parquet basename,
    // so a pathless stat could vouch for another directory's same-named
    // table (the conf-catalog aliasing seam, closed).
    val pathless = CatalogStats(Map(
      "supplier" -> TableStat(n, Map("s_suppkey" -> n),
        provenance = StatProvenance.Exact)))
    val child3 = CatalogRules.sessionWith(spark, Nil)
    CatalogRules.installRules(child3,
      Seq(MvRewriteRule(Seq(MvPhases.mvDefSk(child3, sf)), pathless)))
    val df3 = Tables.lineitem(child3, sf)
      .join(Tables.supplier(child3, sf), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("cnt"))
    assert(scanTables(df3).contains("lineitem"), scanTables(df3))
  }

  test("path identity: a rollup/proof built over one directory never answers a same-named table from another") {
    val otherDir = "/root/testdata/sf0.01"
    // (a) base-table identity: the MvDef records sf0.001's lineitem
    // path; the same-NAMED table from sf0.01 must keep its fact scan.
    val child = mvSession() // rollup + MvDef built over sf0.001
    val foreign = Tables.lineitem(child, otherDir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"))
    assert(scanTables(foreign) === Set("lineitem"), scanTables(foreign))
    // ...while the recorded-path table still rewrites in the same session.
    val home = Tables.lineitem(child, sf)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"))
    assert(scanTables(home) === Set(MvPhases.mvTable(sf)), scanTables(home))

    // (b) dim-side proof identity: the catalog proved s_suppkey unique
    // for sf0.001's supplier (path recorded by StatsPhases.collected);
    // joining sf0.01's supplier proves nothing about THIS plan's rows.
    import graft.queries.StatsPhases
    MvPhases.ensureStoredSk(spark, sf)
    val st = StatsPhases.collected(spark, sf)
    val child2 = CatalogRules.sessionWith(spark, Nil)
    CatalogRules.installRules(child2,
      Seq(MvRewriteRule(Seq(MvPhases.mvDefSk(child2, sf)), st)))
    val crossDim = Tables.lineitem(child2, sf)
      .join(Tables.supplier(child2, otherDir),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("cnt"))
    assert(scanTables(crossDim).contains("lineitem"), scanTables(crossDim))
  }

  test("non-deterministic predicates and aggregates bail — a rand() filter must sample rows, never rollup cells") {
    val child = mvSession()
    val li = Tables.lineitem(child, sf)
    // rand() < 0.5 has NO attribute references: the dim-only reference
    // check alone would pass it vacuously and remap it onto the rollup.
    // (Threshold strictly inside (0,1): Spark's optimizer knows rand's
    // range and folds an always-true comparison away entirely.)
    val a = li.filter(rand(42) < 0.5)
      .groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
    assert(scanTables(a) === Set("lineitem"), scanTables(a))
    // Non-deterministic grouping expression: same contract.
    val b = li.groupBy((rand(7) * 0 + col("l_returnflag").isNotNull.cast("int")).as("g"))
      .agg(count(lit(1)).as("cnt"))
    assert(scanTables(b) === Set("lineitem"), scanTables(b))
  }

  test("q265: ROLLUP and CUBE answer from the stored rollup's cells; non-foldable shapes under Expand bail") {
    val on = SparkEntry.queries("q265_mv_rollup_cube")(spark, sf)
    assert(scanTables(on) === Set(MvPhases.mvTable(sf)), scanTables(on))
    val off = CatalogRules.sessionWith(spark, Nil)
    val offDf = Tables.lineitem(off, sf)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
          .as("sum_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_extendedprice")).as("max_price"))
    assert(scanTables(offDf) === Set("lineitem"))
    assert(on.schema === offDf.schema)
    assert(sortedRows(on) === sortedRows(offDf))

    val child = mvSession()
    // CUBE is the same Expand shape with more sets
    val cube = Tables.lineitem(child, sf)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"))
    assert(scanTables(cube) === Set(MvPhases.mvTable(sf)), scanTables(cube))
    val cubeOff = Tables.lineitem(spark, sf)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"))
    assert(sortedRows(cube) === sortedRows(cubeOff))
    // dim-only filter below the rollup grouping commutes and remaps
    val filtered = Tables.lineitem(child, sf)
      .filter(col("l_linestatus") === "F")
      .rollup("l_returnflag")
      .agg(count(lit(1)).as("cnt"))
    assert(scanTables(filtered) === Set(MvPhases.mvTable(sf)), scanTables(filtered))
    val filteredOff = Tables.lineitem(spark, sf)
      .filter(col("l_linestatus") === "F")
      .rollup("l_returnflag")
      .agg(count(lit(1)).as("cnt"))
    assert(sortedRows(filtered) === sortedRows(filteredOff))
    // an aggregate the rollup has no partial for bails to the fact scan
    val bad = Tables.lineitem(child, sf)
      .rollup("l_returnflag")
      .agg(sum(col("l_tax").cast("decimal(18,4)")).as("sum_tax"))
    assert(scanTables(bad) === Set("lineitem"), scanTables(bad))
    // a grouping column the rollup does not carry bails
    val badDim = Tables.lineitem(child, sf)
      .rollup("l_returnflag", "l_suppkey")
      .agg(count(lit(1)).as("cnt"))
    assert(scanTables(badDim) === Set("lineitem"), scanTables(badDim))
    // grouping()/grouping_id() are expressions over the grouping-id
    // slot (a fresh Expand attribute) — they ride the rewrite for free
    val gid = Tables.lineitem(child, sf)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        grouping_id().as("gid"),
        grouping(col("l_returnflag")).as("g_rf"))
    assert(scanTables(gid) === Set(MvPhases.mvTable(sf)), scanTables(gid))
    val gidOff = Tables.lineitem(spark, sf)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        grouping_id().as("gid"),
        grouping(col("l_returnflag")).as("g_rf"))
    assert(sortedRows(gid) === sortedRows(gidOff))
  }

  test("q266: expression dims — the hour-bucket report reads only the time rollup; shadow names and unaligned filters bail") {
    import org.apache.spark.sql.functions.expr
    import graft.queries.MvPhases
    val on = SparkEntry.queries("q266_mv_time_bucket")(spark, sf)
    assert(scanTables(on) === Set(MvPhases.tsTable(sf)), scanTables(on))
    val off = CatalogRules.sessionWith(spark, Nil)
    val offDf = Tables.eventsTsNs(off, sf)
      .groupBy(
        expr(graft.operators.Resample.floorDivSql("ts", MvPhases.HourNs))
          .as("hour_idx"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
    assert(scanTables(offDf) === Set("events"))
    assert(on.schema === offDf.schema)
    assert(sortedRows(on) === sortedRows(offDf))

    MvPhases.ensureStoredTs(spark, sf)
    val child = CatalogRules.sessionWith(spark, Nil)
    CatalogRules.installRules(child,
      Seq(MvRewriteRule(Seq(MvPhases.mvDefTs(child, sf)))))
    // a DIFFERENT bucket width canonicalizes differently: fact scan
    val otherBucket = Tables.eventsTsNs(child, sf)
      .groupBy(expr(graft.operators.Resample.floorDivSql("ts", 60000000000L))
        .as("minute_idx"))
      .agg(count(lit(1)).as("cnt"))
    assert(scanTables(otherBucket) === Set("events"), scanTables(otherBucket))
    // a MISALIGNED raw-timestamp filter selects part of a bucket —
    // unprovable from cells — and bails (the aligned case is q269's)
    val rawTsFilter = Tables.eventsTsNs(child, sf)
      .filter(col("ts") >= 1704070800000000001L)
      .groupBy(expr(graft.operators.Resample.floorDivSql("ts", MvPhases.HourNs))
        .as("hour_idx"))
      .agg(count(lit(1)).as("cnt"))
    assert(scanTables(rawTsFilter) === Set("events"), scanTables(rawTsFilter))
    // a plain-dim filter DOES commute and remaps
    val dimFilter = Tables.eventsTsNs(child, sf)
      .filter(col("event_type") === "click")
      .groupBy(expr(graft.operators.Resample.floorDivSql("ts", MvPhases.HourNs))
        .as("hour_idx"))
      .agg(count(lit(1)).as("cnt"))
    assert(scanTables(dimFilter) === Set(MvPhases.tsTable(sf)), scanTables(dimFilter))
    val dimFilterOff = Tables.eventsTsNs(spark, sf)
      .filter(col("event_type") === "click")
      .groupBy(expr(graft.operators.Resample.floorDivSql("ts", MvPhases.HourNs))
        .as("hour_idx"))
      .agg(count(lit(1)).as("cnt"))
    assert(sortedRows(dimFilter) === sortedRows(dimFilterOff))
  }

  test("q269: bucket-aligned ranges serve from cells — all four comparison forms; misaligned literals and non-bucket expressions bail") {
    import org.apache.spark.sql.functions.expr
    import graft.queries.MvPhases
    val on = SparkEntry.queries("q269_mv_bucket_aligned_filter")(spark, sf)
    assert(scanTables(on) === Set(MvPhases.tsTable(sf)), scanTables(on))

    MvPhases.ensureStoredTs(spark, sf)
    val child = CatalogRules.sessionWith(spark, Nil)
    CatalogRules.installRules(child,
      Seq(MvRewriteRule(Seq(MvPhases.mvDefTs(child, sf)))))
    val k = 473712L // an hour boundary inside the fixture's range
    val w = MvPhases.HourNs
    def report(s: org.apache.spark.sql.SparkSession,
        f: org.apache.spark.sql.Column) =
      Tables.eventsTsNs(s, sf).filter(f)
        .groupBy(expr(graft.operators.Resample.floorDivSql("ts", w))
          .as("hour_idx"))
        .agg(count(lit(1)).as("cnt"))
    val off = CatalogRules.sessionWith(spark, Nil)
    // >= and < at boundaries serve from cells and match rule-off rows;
    // > and <= normalize through +1 (aligned when literal+1 is a
    // boundary, i.e. literal == k*w - 1)
    val forms = Seq(
      col("ts") >= k * w,
      col("ts") < k * w,
      col("ts") > (k * w - 1),
      col("ts") <= (k * w - 1),
      lit(k * w) <= col("ts"),
      // and a predicate on the BUCKET EXPRESSION itself (any operator)
      expr(graft.operators.Resample.floorDivSql("ts", w)) >= k)
    forms.foreach { f =>
      val onDf = report(child, f)
      assert(scanTables(onDf) === Set(MvPhases.tsTable(sf)),
        s"$f -> ${scanTables(onDf)}")
      assert(sortedRows(onDf) === sortedRows(report(off, f)), f.toString)
    }
    // misaligned in every direction: part of a bucket, bail
    Seq(col("ts") >= k * w + 1, col("ts") < k * w - 1,
        col("ts") > k * w, col("ts") <= k * w).foreach { f =>
      assert(scanTables(report(child, f)) === Set("events"), f.toString)
    }
  }

  test("q270: ROLLUP over the FK join serves from cells + live dim; no proof or a dim-side aggregate keeps the fact scan; same rows") {
    import graft.queries.{MvPhases, StatsPhases}
    val on = SparkEntry.queries("q270_mv_rollup_join")(spark, sf)
    assert(scanTables(on) === Set(MvPhases.skTable(sf), "supplier"),
      scanTables(on))
    def text(s: org.apache.spark.sql.SparkSession) =
      Tables.lineitem(s, sf)
        .join(Tables.supplier(s, sf), col("l_suppkey") === col("s_suppkey"))
        .rollup(col("s_name"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
            .as("sum_qty"))
    val off = CatalogRules.sessionWith(spark, Nil)
    assert(scanTables(text(off)).contains("lineitem"))
    assert(on.schema === text(off).schema)
    assert(sortedRows(on) === sortedRows(text(off)))

    // no uniqueness proof: the Expand join shape bails to the fact scan
    MvPhases.ensureStoredSk(spark, sf)
    val noProof = CatalogRules.sessionWith(spark, Nil)
    CatalogRules.installRules(noProof,
      Seq(MvRewriteRule(Seq(MvPhases.mvDefSk(noProof, sf)))))
    assert(scanTables(text(noProof)).contains("lineitem"),
      scanTables(text(noProof)))
    // a dim-side aggregate is not foldable from fact partials: bail
    val st = StatsPhases.collected(spark, sf)
    val dimAgg = CatalogRules.sessionWith(spark, Nil)
    CatalogRules.installRules(dimAgg,
      Seq(MvRewriteRule(Seq(MvPhases.mvDefSk(dimAgg, sf)), st)))
    val da = Tables.lineitem(dimAgg, sf)
      .join(Tables.supplier(dimAgg, sf), col("l_suppkey") === col("s_suppkey"))
      .rollup(col("s_name"))
      .agg(sum(col("s_acctbal").cast("decimal(18,4)")).as("sum_bal"))
    assert(scanTables(da).contains("lineitem"), scanTables(da))
    // CUBE over (dim attr, base dim) — mixed slot kinds — still serves
    // when the base column is a rollup dimension... the sk rollup's only
    // dim is the join key itself, so grouping on it composes too
    val mixed = Tables.lineitem(dimAgg, sf)
      .join(Tables.supplier(dimAgg, sf), col("l_suppkey") === col("s_suppkey"))
      .cube(col("s_name"), col("l_suppkey"))
      .agg(count(lit(1)).as("cnt"))
    assert(scanTables(mixed) === Set(MvPhases.skTable(sf), "supplier"),
      scanTables(mixed))
    val mixedOff = Tables.lineitem(spark, sf)
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .cube(col("s_name"), col("l_suppkey"))
      .agg(count(lit(1)).as("cnt"))
    assert(sortedRows(mixed) === sortedRows(mixedOff))
  }

  test("bucket alignment is exact on NEGATIVE timestamps: pre-1970 aligned boundaries serve from cells and match rule-off in every form; misaligned bail") {
    import org.apache.spark.sql.functions.expr
    // Synthetic event stream straddling the epoch with ragged in-bucket
    // offsets — the fixture's 2024 data never exercises floorDiv's
    // negative-operand behavior, which is exactly where an alignment
    // proof written with `/` instead of floor semantics would break.
    val w = 3600000000000L
    val dir = java.nio.file.Files.createTempDirectory("negts").toString
    spark.range(-40, 40).selectExpr(
        "CAST(id AS BIGINT) * CAST(3600000000000 AS BIGINT) " +
          "+ pmod(id, 7) * CAST(123456789 AS BIGINT) AS ts",
        "CAST(pmod(id, 3) AS STRING) AS event_type")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    def raw(s: org.apache.spark.sql.SparkSession) =
      s.read.parquet(s"$dir/events.parquet")
    val bucket = expr(graft.operators.Resample.floorDivSql("ts", w))
    raw(spark).groupBy(bucket.as("hour_idx"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/rollup.parquet")
    // canonicals derived through the SAME machinery the rewrite
    // matches with (a leaf source canonicalizes to its bare name)
    val probe = raw(spark).groupBy(bucket.as("hour_idx"))
      .agg(count(lit(1)).as("c"))
    val canon = MvRewriteRule.groupingCanonicals(
      probe.queryExecution.optimizedPlan).values.head
    def mv(s: org.apache.spark.sql.SparkSession) = MvDef(
      baseTable = "events",
      dims = Map("event_type" -> "event_type"),
      measures = Seq(MvMeasure("count", "", None, "cnt")),
      mvPlan = s.read.parquet(s"$dir/rollup.parquet")
        .queryExecution.analyzed,
      basePath = Some(CatalogRules.normalizePath(s"$dir/events.parquet")),
      exprDims = Seq(MvExprDim(canon, "hour_idx",
        bucket = Some(MvBucket("ts", w)))))
    val child = CatalogRules.sessionWith(spark, Nil)
    CatalogRules.installRules(child, Seq(MvRewriteRule(Seq(mv(child)))))
    val off = CatalogRules.sessionWith(spark, Nil)
    def report(s: org.apache.spark.sql.SparkSession,
        f: org.apache.spark.sql.Column) =
      raw(s).filter(f).groupBy(bucket.as("hour_idx"))
        .agg(count(lit(1)).as("cnt"))
    // NEGATIVE aligned boundaries, every comparison form and both
    // literal orientations
    Seq(-13L, -1L, 0L, 17L).foreach { k =>
      val forms = Seq(
        col("ts") >= k * w, col("ts") < k * w,
        col("ts") > (k * w - 1), col("ts") <= (k * w - 1),
        lit(k * w) <= col("ts"), lit(k * w) > col("ts"))
      forms.foreach { f =>
        val on = report(child, f)
        assert(scanTables(on) === Set("rollup"), s"k=$k $f ${scanTables(on)}")
        assert(sortedRows(on) === sortedRows(report(off, f)), s"k=$k $f")
      }
      // misaligned by one ns in either direction: part of a bucket, bail
      Seq(col("ts") >= k * w + 1, col("ts") < k * w - 1).foreach { f =>
        assert(scanTables(report(child, f)) === Set("events"), s"k=$k $f")
      }
    }
  }

  test("q267 companion: TS fold == scratch; the conf face serves the expression-dim rollup") {
    import org.apache.spark.sql.functions.expr
    import graft.queries.MvPhases
    val ev = Tables.eventsTsNs(spark, sf)
    val folded = MvPhases.foldTs(
      MvPhases.partialsTs(ev.filter(col("event_id") % 2 === 0)),
      ev.filter(col("event_id") % 2 === 1))
    val scratch = MvPhases.partialsTs(ev)
    assert(folded.schema.map(f => (f.name, f.dataType))
      === scratch.schema.map(f => (f.name, f.dataType)))
    assert(sortedRows(folded) === sortedRows(scratch))

    // conf face: the exprdims key (base64 canonical) round-trips and
    // the hourly report answers from the rollup with zero code
    MvPhases.ensureStoredTs(spark, sf)
    val conf = CatalogRules.sessionWith(spark, Seq(ConfMvRewriteRule),
      ConfMvRewriteRule.DefsConf -> MvPhases.mvDefTsConf(spark, sf))
    val df = Tables.eventsTsNs(conf, sf)
      .groupBy(
        expr(graft.operators.Resample.floorDivSql("ts", MvPhases.HourNs))
          .as("hour_idx"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    assert(scanTables(df) === Set(MvPhases.tsTable(sf)), scanTables(df))
    // the exprdims BUCKET fields (src canonical + width) also ride the
    // conf: an aligned time-range filter serves from cells with zero
    // code installed (q269 by config)
    val aligned = Tables.eventsTsNs(conf, sf)
      .filter(col("ts") >= lit(473712L * MvPhases.HourNs))
      .groupBy(
        expr(graft.operators.Resample.floorDivSql("ts", MvPhases.HourNs))
          .as("hour_idx"))
      .agg(count(lit(1)).as("cnt"))
    assert(scanTables(aligned) === Set(MvPhases.tsTable(sf)),
      scanTables(aligned))
  }

  test("grouping sets compose with expression dims: hourly ROLLUP subtotals serve from the TS rollup's cells") {
    import org.apache.spark.sql.functions.expr
    import graft.queries.MvPhases
    MvPhases.ensureStoredTs(spark, sf)
    val child = CatalogRules.sessionWith(spark, Nil)
    CatalogRules.installRules(child,
      Seq(MvRewriteRule(Seq(MvPhases.mvDefTs(child, sf)))))
    def report(s: org.apache.spark.sql.SparkSession) =
      Tables.eventsTsNs(s, sf)
        .rollup(
          expr(graft.operators.Resample.floorDivSql("ts", MvPhases.HourNs))
            .as("hour_idx"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,4)")).cast("double")
            .as("sum_value"))
    val on = report(child)
    assert(scanTables(on) === Set(MvPhases.tsTable(sf)), scanTables(on))
    val off = report(CatalogRules.sessionWith(spark, Nil))
    assert(scanTables(off) === Set("events"))
    assert(on.schema === off.schema)
    assert(sortedRows(on) === sortedRows(off))

    // ...and a bucket-ALIGNED range filter composes with the grouping
    // sets (q269's class-3 mapping runs under the Expand too): the
    // dashboard "subtotals over the last N hours" stays a cells read
    def ranged(s: org.apache.spark.sql.SparkSession) =
      Tables.eventsTsNs(s, sf)
        .filter(col("ts") >= lit(473712L * MvPhases.HourNs))
        .rollup(
          expr(graft.operators.Resample.floorDivSql("ts", MvPhases.HourNs))
            .as("hour_idx"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"))
    val rangedOn = ranged(child)
    assert(scanTables(rangedOn) === Set(MvPhases.tsTable(sf)),
      scanTables(rangedOn))
    assert(sortedRows(rangedOn)
      === sortedRows(ranged(CatalogRules.sessionWith(spark, Nil))))
    // misaligned: part of a bucket, the Expand shape bails too
    val misaligned = Tables.eventsTsNs(child, sf)
      .filter(col("ts") >= lit(473712L * MvPhases.HourNs + 1))
      .rollup(
        expr(graft.operators.Resample.floorDivSql("ts", MvPhases.HourNs))
          .as("hour_idx"))
      .agg(count(lit(1)).as("cnt"))
    assert(scanTables(misaligned) === Set("events"), scanTables(misaligned))
  }

  test("shadow hole closed: a computed projection that takes a dim's NAME never matches the dim") {
    val child = mvSession()
    // l_returnflag here is NOT lineitem's l_returnflag — it is a
    // computed rename of l_linestatus. Matching by name would answer
    // from the rollup with the wrong attribute; the rewrite must keep
    // the fact scan (the plain-dims path requires the matched leaf to
    // be the raw relation; the computed path resolves by exprId and
    // finds no canonical match).
    val shadow = Tables.lineitem(child, sf)
      .select(col("l_linestatus").as("l_returnflag"), col("l_quantity"),
        col("l_linestatus"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"))
    assert(scanTables(shadow) === Set("lineitem"), scanTables(shadow))
    val shadowOff = Tables.lineitem(spark, sf)
      .select(col("l_linestatus").as("l_returnflag"), col("l_quantity"),
        col("l_linestatus"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"))
    assert(sortedRows(shadow) === sortedRows(shadowOff))
  }

  test("HAVING and DISTINCT shapes ride the rewrite for free") {
    val child = mvSession()
    val li = Tables.lineitem(child, sf)
    // HAVING: the filter sits ABOVE the aggregate, so the rewrite fires
    // on the Aggregate underneath and the having-filter applies to the
    // folded outputs unchanged.
    val having = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 10)
    assert(scanTables(having) === Set(MvPhases.mvTable(sf)), scanTables(having))
    val havingOff = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 10)
    assert(sortedRows(having) === sortedRows(havingOff))
    // DISTINCT over dimensions is an Aggregate with no aggregate calls
    // — grouping keys fold, so the distinct answers from the rollup's
    // handful of cells without touching the fact table.
    val distinct = li.select("l_returnflag", "l_linestatus").distinct()
    assert(scanTables(distinct) === Set(MvPhases.mvTable(sf)), scanTables(distinct))
    val distinctOff = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_linestatus").distinct()
    assert(sortedRows(distinct) === sortedRows(distinctOff))
  }

  test("non-subsumed shapes bail to the fact scan") {
    val child = mvSession()
    val li = Tables.lineitem(child, sf)
    // (a) an aggregate over a column the rollup has no partial for
    val a = li.groupBy("l_returnflag")
      .agg(sum(col("l_tax").cast("decimal(18,4)")).as("sum_tax"))
    assert(scanTables(a) === Set("lineitem"), scanTables(a))
    // (b) a predicate on a non-dimension column (does not commute
    // through the partials)
    val b = li.filter(col("l_quantity") >= 45.0)
      .groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
    assert(scanTables(b) === Set("lineitem"), scanTables(b))
    // (c) a grouping key the rollup does not carry
    val c = li.groupBy("l_suppkey").agg(count(lit(1)).as("cnt"))
    assert(scanTables(c) === Set("lineitem"), scanTables(c))
    // (d) DISTINCT aggregates are not foldable from partials
    val d = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_linestatus")).as("nd"))
    assert(scanTables(d) === Set("lineitem"), scanTables(d))
  }

  test("q256: COUNT(col) and the deterministic-average idiom fold from the rollup; native Average refuses") {
    val on = SparkEntry.queries("q256_mv_avg_rewrite")(spark, sf)
    assert(scanTables(on) === Set(MvPhases.mvTable(sf)), scanTables(on))

    val off = CatalogRules.sessionWith(spark, Nil)
    val offDf = Tables.lineitem(off, sf)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(col("l_quantity")).as("cnt_qty"),
        (sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
          / count(col("l_quantity"))).as("avg_qty"),
        (sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double")
          / count(col("l_extendedprice"))).as("avg_price"))
    assert(scanTables(offDf) === Set("lineitem"))
    assert(on.schema === offDf.schema)
    assert(sortedRows(on) === sortedRows(offDf))

    // Native Average accumulates doubles in float order — no decimal
    // partial reproduces it bit for bit, so it must NOT fold.
    val child = mvSession()
    val nativeAvg = Tables.lineitem(child, sf)
      .groupBy("l_returnflag")
      .agg(avg(col("l_quantity")).as("avg_qty"))
    assert(scanTables(nativeAvg) === Set("lineitem"), scanTables(nativeAvg))
  }

  test("q251 companion: folded rollup == from-scratch rollup, and the rewrite serves from it unchanged") {
    val li = Tables.lineitem(spark, sf)
    val uid = col("l_orderkey") * 8 + col("l_linenumber")
    val folded = MvPhases.fold(
      MvPhases.partials(li.filter(uid % 2 === 0)), li.filter(uid % 2 === 1))
    val scratch = MvPhases.partials(li)
    // names + types pinned; nullability differs by construction (the
    // fold's cnt is a SUM, nullable) and is erased by the parquet
    // round-trip the stored artifact lives behind.
    assert(folded.schema.map(f => (f.name, f.dataType))
      === scratch.schema.map(f => (f.name, f.dataType)))
    assert(sortedRows(folded) === sortedRows(scratch))
  }

  test("q259: conf-only MV rewrite reads only the rollup; FK-join shape needs the declared-exact conf; malformed defs fail loudly") {
    import graft.queries.StatsPhases
    val on = SparkEntry.queries("q259_mv_conf_rewrite")(spark, sf)
    assert(scanTables(on) === Set(MvPhases.mvTable(sf)), scanTables(on))

    // FK-join conf face: without the declared-exact conf the proof is
    // missing and the fact scan survives; with it, rollup + dim.
    MvPhases.ensureStoredSk(spark, sf)
    val n = Tables.supplier(spark, sf).count()
    def joined(s: org.apache.spark.sql.SparkSession) =
      Tables.lineitem(s, sf)
        .join(Tables.supplier(s, sf), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("cnt"))
    val noProof = CatalogRules.sessionWith(spark, Seq(ConfMvRewriteRule),
      ConfMvRewriteRule.DefsConf -> MvPhases.mvDefSkConf(sf))
    assert(scanTables(joined(noProof)).contains("lineitem"),
      scanTables(joined(noProof)))
    val supPath = CatalogRules.normalizePath(graft.Tables.path(sf, "supplier"))
    val declared = CatalogRules.sessionWith(spark, Seq(ConfMvRewriteRule),
      ConfMvRewriteRule.DefsConf -> MvPhases.mvDefSkConf(sf),
      ConfMvRewriteRule.ExactConf ->
        s"supplier:$n:path=$supPath:s_suppkey=$n")
    assert(scanTables(joined(declared)) === Set(MvPhases.skTable(sf), "supplier"),
      scanTables(joined(declared)))
    // a PATHLESS declaration parses but can never fire a proof — the
    // deployer must say which table the counts are about
    val pathless = CatalogRules.sessionWith(spark, Seq(ConfMvRewriteRule),
      ConfMvRewriteRule.DefsConf -> MvPhases.mvDefSkConf(sf),
      ConfMvRewriteRule.ExactConf -> s"supplier:$n:s_suppkey=$n")
    assert(scanTables(joined(pathless)).contains("lineitem"),
      scanTables(joined(pathless)))
    // a declaration about ANOTHER directory's same-named supplier proves
    // nothing about this plan's dim
    val foreignPath = CatalogRules.normalizePath(
      graft.Tables.path("/root/testdata/sf0.01", "supplier"))
    val foreign = CatalogRules.sessionWith(spark, Seq(ConfMvRewriteRule),
      ConfMvRewriteRule.DefsConf -> MvPhases.mvDefSkConf(sf),
      ConfMvRewriteRule.ExactConf ->
        s"supplier:$n:path=$foreignPath:s_suppkey=$n")
    assert(scanTables(joined(foreign)).contains("lineitem"),
      scanTables(joined(foreign)))
    // conf-declared rows match the programmatic-catalog rewrite
    val prog = CatalogRules.sessionWith(spark, Nil)
    CatalogRules.installRules(prog,
      Seq(MvRewriteRule(Seq(MvPhases.mvDefSk(prog, sf)),
        StatsPhases.collected(spark, sf))))
    assert(sortedRows(joined(declared)) === sortedRows(joined(prog)))

    // malformed def / missing rollup table: loud, never a silent no-op
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    val bad = CatalogRules.sessionWith(spark, Seq(ConfMvRewriteRule),
      ConfMvRewriteRule.DefsConf -> "table=does_not_exist;base=lineitem;dims=a:a;measures=count:::cnt")
    val e = intercept[Exception] {
      Tables.lineitem(bad, sf).groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt")).queryExecution.optimizedPlan
    }
    assert(causes(e).exists(c => c.isInstanceOf[IllegalArgumentException] &&
      c.getMessage.contains("does not exist")), e.toString)
    val bad2 = CatalogRules.sessionWith(spark, Seq(ConfMvRewriteRule),
      ConfMvRewriteRule.DefsConf -> "garbage")
    val e2 = intercept[Exception] {
      Tables.lineitem(bad2, sf).groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt")).queryExecution.optimizedPlan
    }
    assert(causes(e2).exists(_.isInstanceOf[IllegalArgumentException]), e2.toString)
  }

  test("composite MV join rewrite: a two-dim rollup answers a join on the column PAIR when the tuple is proven unique; per-column stats prove nothing") {
    import CatalogRules.{CatalogStats, StatProvenance, TableStat}
    val dir = java.nio.file.Files.createTempDirectory("compmv").toString
    val li = Tables.lineitem(spark, sf)
    // the composite-keyed dim (unique only as a PAIR) and a rollup at
    // the same two-column grain
    li.select(col("l_suppkey").as("sf_suppkey"),
        col("l_returnflag").as("sf_flag")).distinct()
      .withColumn("label", concat_ws("-", col("sf_suppkey"), col("sf_flag")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/suppflag.parquet")
    li.groupBy("l_suppkey", "l_returnflag")
      .agg(count(lit(1)).as("cnt"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/rollup2.parquet")
    val dimN = spark.read.parquet(s"$dir/suppflag.parquet").count()
    val compSf = CatalogRules.compositeKey(Seq("sf_suppkey", "sf_flag"))
    val proven = CatalogStats(Map(
      "suppflag" -> TableStat(dimN, Map(compSf -> dimN),
        StatProvenance.Exact,
        Some(CatalogRules.normalizePath(s"$dir/suppflag.parquet")))))
    def mv(s: org.apache.spark.sql.SparkSession) = MvDef(
      baseTable = "lineitem",
      dims = Map("l_suppkey" -> "l_suppkey", "l_returnflag" -> "l_returnflag"),
      measures = Seq(MvMeasure("count", "", None, "cnt")),
      mvPlan = s.read.parquet(s"$dir/rollup2.parquet")
        .queryExecution.analyzed,
      basePath = Some(CatalogRules.normalizePath(
        graft.Tables.path(sf, "lineitem"))))
    def text(s: org.apache.spark.sql.SparkSession) =
      Tables.lineitem(s, sf)
        .join(s.read.parquet(s"$dir/suppflag.parquet"),
          col("l_suppkey") === col("sf_suppkey") &&
            col("l_returnflag") === col("sf_flag"))
        .groupBy("label").agg(count(lit(1)).as("cnt"))
    val child = CatalogRules.sessionWith(spark, Nil)
    CatalogRules.installRules(child, Seq(MvRewriteRule(Seq(mv(child)), proven)))
    val on = text(child)
    assert(scanTables(on) === Set("rollup2", "suppflag"), scanTables(on))
    val off = CatalogRules.sessionWith(spark, Nil)
    assert(sortedRows(on) === sortedRows(text(off)))
    // the same dim claimed unique per COLUMN (each truthfully non-unique
    // column ndv < rows would refuse anyway — claim dimN to isolate the
    // tuple requirement): the proof must not accept per-column evidence
    val perCol = CatalogStats(Map(
      "suppflag" -> TableStat(dimN,
        Map("sf_suppkey" -> dimN, "sf_flag" -> dimN),
        StatProvenance.Exact,
        Some(CatalogRules.normalizePath(s"$dir/suppflag.parquet")))))
    val child2 = CatalogRules.sessionWith(spark, Nil)
    CatalogRules.installRules(child2,
      Seq(MvRewriteRule(Seq(mv(child2)), perCol)))
    assert(scanTables(text(child2)).contains("lineitem"),
      scanTables(text(child2)))
  }

  test("exactstats publish round-trip: parseExact(confExact(…)) == collected(…), and malformed paths fail loudly") {
    import graft.queries.StatsPhases
    val conf = StatsPhases.confExact(spark, sf)
    val parsed = ConfMvRewriteRule.parseExact(conf)
    val collected = StatsPhases.collected(spark, sf).tables
    assert(parsed === collected,
      "the ANALYZE publisher and the conf parser are two spellings of " +
        "one catalog — they must agree entry for entry, paths included")
    intercept[IllegalArgumentException] {
      ConfMvRewriteRule.parseExact("supplier:10:path=/a:b:c:s=10")
    }
  }

  test("q257 companion: additive retract == scratch, all-deleted groups drop, underflow raises") {
    val li = Tables.lineitem(spark, sf)
    val uid = col("l_orderkey") * 8 + col("l_linenumber")
    val victim = li.agg(min("l_suppkey")).head().getLong(0)
    val isDeleted = col("l_suppkey") === victim || uid % 4 === 3
    val retracted = MvPhases.foldRetractSk(
      MvPhases.partialsSk(li), li.filter(isDeleted))
    val scratch = MvPhases.partialsSk(li.filter(!isDeleted))
    assert(sortedRows(retracted) === sortedRows(scratch))
    // the all-deleted group is GONE, not a zero row
    assert(retracted.filter(col("l_suppkey") === victim).count() === 0)
    // retracting rows that were never folded in must raise, not serve
    // impossible (negative-count) state
    val bad = MvPhases.foldRetractSk(
      MvPhases.partialsSk(li.filter(uid % 2 === 0)), li)
    val e = intercept[Exception] { bad.collect() }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("retract underflow"))), e.toString)
  }

  test("q258 companion: touched cells recompute, untouched cells pass through VERBATIM from the stored artifact") {
    val li = Tables.lineitem(spark, sf)
    val uid = col("l_orderkey") * 8 + col("l_linenumber")
    val isDeleted = col("l_returnflag") === "R" ||
      (col("l_returnflag") === "A" && uid % 4 === 3)
    val stored = MvPhases.partials(li)
    val maintained = MvPhases.deleteMaintain(
      stored, li.filter(isDeleted), li.filter(!isDeleted))
    // whole-table equality with the from-scratch rebuild
    assert(sortedRows(maintained)
      === sortedRows(MvPhases.partials(li.filter(!isDeleted))))
    // untouched ('N') cells are the STORED rows, bit for bit — the
    // anti-join pass-through, not a recompute that happens to agree
    assert(sortedRows(maintained.filter(col("l_returnflag") === "N"))
      === sortedRows(stored.filter(col("l_returnflag") === "N")))
    // fully-deleted ('R') cells are gone
    assert(maintained.filter(col("l_returnflag") === "R").count() === 0)
  }

  test("delete maintenance is NULL-SAFE on dim keys: a null-keyed delete recomputes its cell instead of serving pre-delete state") {
    // groupBy makes a null dim value a cell like any other, so the
    // maintenance joins must match it: under plain equality a deleted
    // null-keyed row touches NEITHER the anti-join (stale stored cell
    // retained verbatim) nor the recompute semi-join (no replacement) —
    // the rollup silently serves pre-delete state for the null group.
    val uid = col("l_orderkey") * 8 + col("l_linenumber")
    val li = Tables.lineitem(spark, sf).withColumn("l_returnflag",
      when(uid % 5 === 0, lit(null)).otherwise(col("l_returnflag")))
    val isDeleted = col("l_returnflag").isNull && uid % 2 === 0
    val stored = MvPhases.partials(li)
    val maintained = MvPhases.deleteMaintain(
      stored, li.filter(isDeleted), li.filter(!isDeleted))
    // whole-table equality with the from-scratch rebuild — includes the
    // null-keyed cells, which MUST have recomputed
    assert(sortedRows(maintained)
      === sortedRows(MvPhases.partials(li.filter(!isDeleted))))
    // and the null cell is NOT the stale stored row
    assert(sortedRows(maintained.filter(col("l_returnflag").isNull))
      !== sortedRows(stored.filter(col("l_returnflag").isNull)))
    // untouched (non-null) cells still pass through verbatim
    assert(sortedRows(maintained.filter(col("l_returnflag") === "N"))
      === sortedRows(stored.filter(col("l_returnflag") === "N")))
  }

  test("narrowExact guard: an all-null input group stores a null partial without raising") {
    // The overflow guard distinguishes accumulator overflow (total null
    // over a POSITIVE non-null count -> raise) from a legitimately-null
    // all-null-input group (count 0 -> null passes through): a rollup
    // over a sparse measure must build, not crash.
    val li = Tables.lineitem(spark, sf).withColumn("l_quantity",
      when(col("l_returnflag") === "N", lit(null)).otherwise(col("l_quantity")))
    val cells = MvPhases.partials(li)
    val nCells = cells.filter(col("l_returnflag") === "N").collect()
    assert(nCells.nonEmpty)
    assert(nCells.forall(_.isNullAt(cells.schema.fieldIndex("sum_qty"))))
  }

  test("conf defs cache: steady-state planning reuses resolved defs; a rebuilt rollup invalidates") {
    MvPhases.ensureStored(spark, sf)
    val conf = MvPhases.mvDefConf(sf)
    val a = ConfMvRewriteRule.cachedDefs(conf, spark)
    val b = ConfMvRewriteRule.cachedDefs(conf, spark)
    assert(a eq b, "repeat invocations must reuse the resolved defs")
    MvPhases.buildStored(spark, sf)
    // r21: the version stamp is TTL-memoized (~500 ms) so fixed-point
    // batches pay one stat call per table per query, not per rule
    // invocation — a rebuild therefore invalidates at the NEXT stamp
    // refresh, not instantly. Sleep past the TTL; the freshness
    // contract is "next query re-resolves", the same class as Spark's
    // own file-listing caches.
    Thread.sleep(600)
    val c = ConfMvRewriteRule.cachedDefs(conf, spark)
    assert(!(a eq c), "a dropped-and-recreated rollup must re-resolve")
  }

  test("q275: expression dims compose with the FK-join shape — the hourly-by-entity report reads (hour x user) cells + the live dim, fact scan gone; no proof, no rewrite; same rows") {
    import org.apache.spark.sql.functions.expr
    val on = SparkEntry.queries("q275_mv_computed_join")(spark, sf)
    assert(scanTables(on) === Set(MvPhases.tsuTable(sf), "customer"),
      scanTables(on))
    def text(s: org.apache.spark.sql.SparkSession) =
      Tables.eventsTsNs(s, sf)
        .join(Tables.customer(s, sf), col("user_id") === col("c_custkey"))
        .groupBy(
          expr(graft.operators.Resample.floorDivSql("ts", MvPhases.HourNs))
            .as("hour_idx"),
          col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,4)")).cast("double")
            .as("sum_value"))
    val off = CatalogRules.sessionWith(spark, Nil)
    val offDf = text(off)
    assert(scanTables(offDf) === Set("events", "customer"))
    assert(on.schema === offDf.schema)
    assert(sortedRows(on) === sortedRows(offDf))
    // the uniqueness proof composes with the computed path: without
    // the c_custkey Exact entry the join shape stands down
    MvPhases.ensureStoredTsU(spark, sf)
    val noProof = CatalogRules.sessionWith(spark, Nil)
    CatalogRules.installRules(noProof,
      Seq(MvRewriteRule(Seq(MvPhases.mvDefTsU(noProof, sf)))))
    assert(scanTables(text(noProof)) === Set("events", "customer"))
    // freshness face: an arrival batch folds cell-wise == from-scratch
    val ev = Tables.eventsTsNs(spark, sf)
    val folded = MvPhases.foldTsU(
      MvPhases.partialsTsU(ev.filter(col("event_id") % 2 === 0)),
      ev.filter(col("event_id") % 2 === 1))
    val scratch = MvPhases.partialsTsU(ev)
    assert(folded.schema.map(f => (f.name, f.dataType))
      === scratch.schema.map(f => (f.name, f.dataType)))
    assert(sortedRows(folded) === sortedRows(scratch))
    // the computed shape peels a CHAIN too (events >< customer ><
    // nation, hourly by nation): cells + BOTH live dims, fact gone
    import graft.queries.StatsPhases
    val st = StatsPhases.collected(spark, sf)
    val chainS = CatalogRules.sessionWith(spark, Nil)
    CatalogRules.installRules(chainS,
      Seq(MvRewriteRule(Seq(MvPhases.mvDefTsU(chainS, sf)), st)))
    def chainText(s: org.apache.spark.sql.SparkSession) =
      Tables.eventsTsNs(s, sf)
        .join(Tables.customer(s, sf), col("user_id") === col("c_custkey"))
        .join(Tables.nation(s, sf), col("c_nationkey") === col("n_nationkey"))
        .groupBy(
          expr(graft.operators.Resample.floorDivSql("ts", MvPhases.HourNs))
            .as("hour_idx"),
          col("n_name"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,4)")).cast("double")
            .as("sum_value"))
    val chained = chainText(chainS)
    assert(scanTables(chained) ===
      Set(MvPhases.tsuTable(sf), "customer", "nation"), scanTables(chained))
    val offS = CatalogRules.sessionWith(spark, Nil)
    assert(sortedRows(chained) === sortedRows(chainText(offS)))
  }

  test("q276: a date_trunc('hour') spelling serves from the floorDiv hour rollup through the declared ALT canonical; a different width keeps the event scan; same rows") {
    import org.apache.spark.sql.functions.{date_trunc, expr, timestamp_micros, unix_micros}
    val on = SparkEntry.queries("q276_mv_date_trunc")(spark, sf)
    assert(scanTables(on) === Set(MvPhases.tsTable(sf)), scanTables(on))
    def text(s: org.apache.spark.sql.SparkSession, unit: String) =
      Tables.eventsTsNs(s, sf)
        .groupBy(
          date_trunc(unit, timestamp_micros(expr("ts div 1000")))
            .as("hour_start"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,4)")).cast("double")
            .as("sum_value"))
        .select(unix_micros(col("hour_start")).as("hour_us"),
          col("event_type"), col("cnt"), col("sum_value"))
    val off = CatalogRules.sessionWith(spark, Nil)
    val offDf = text(off, "hour")
    assert(scanTables(offDf) === Set("events"))
    assert(on.schema === offDf.schema)
    assert(sortedRows(on) === sortedRows(offDf))
    // a DIFFERENT truncation width canonicalizes differently, matches
    // no declared alt, and correctly keeps the fact scan — hour cells
    // cannot answer a minute report
    MvPhases.ensureStoredTs(spark, sf)
    val child = CatalogRules.sessionWith(spark, Nil)
    CatalogRules.installRules(child,
      Seq(MvRewriteRule(Seq(MvPhases.mvDefTs(child, sf)))))
    assert(scanTables(text(child, "minute")) === Set("events"))
    // conf face: the alt rides the published grammar (exprdimalts)
    val conf = CatalogRules.sessionWith(spark, Seq(ConfMvRewriteRule),
      ConfMvRewriteRule.DefsConf -> MvPhases.mvDefTsConf(spark, sf))
    val viaConf = text(conf, "hour")
    assert(scanTables(viaConf) === Set(MvPhases.tsTable(sf)),
      scanTables(viaConf))
    assert(sortedRows(viaConf) === sortedRows(offDf))
    // an aggregate OVER the bucket expression refuses outright: no
    // stored measure folds count(<bucket>), and the grouping-scalar
    // pre-map must never reach inside an aggregate call (it would
    // silently count CELLS instead of rows)
    val aggOverBucket = Tables.eventsTsNs(child, sf)
      .groupBy(col("event_type"))
      .agg(count(date_trunc("hour", timestamp_micros(expr("ts div 1000"))))
        .as("cnt_h"))
    assert(scanTables(aggOverBucket) === Set("events"),
      scanTables(aggOverBucket))
    // alternate spellings work under GROUPING SETS too: the Expand's
    // per-set slot rebuilds the date_trunc value from the bucket
    def rollupText(s: org.apache.spark.sql.SparkSession) =
      Tables.eventsTsNs(s, sf)
        .rollup(
          date_trunc("hour", timestamp_micros(expr("ts div 1000")))
            .as("hour_start"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(unix_micros(col("hour_start")).as("hour_us"),
          col("event_type"), col("cnt"))
    val rolled = rollupText(child)
    assert(scanTables(rolled) === Set(MvPhases.tsTable(sf)),
      scanTables(rolled))
    assert(sortedRows(rolled) === sortedRows(rollupText(off)))
  }

  test("q280: aggregate navigation peels a DIM CHAIN — the snowflake report reads cells + both live dims, fact scan gone; one unproven dim stands the whole chain down; same rows") {
    import graft.queries.StatsPhases
    val on = SparkEntry.queries("q280_mv_chain")(spark, sf)
    assert(scanTables(on) ===
      Set(MvPhases.skTable(sf), "supplier", "nation"), scanTables(on))
    def text(s: org.apache.spark.sql.SparkSession) =
      Tables.lineitem(s, sf)
        .join(Tables.supplier(s, sf), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.nation(s, sf), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
            .as("sum_qty"))
    val off = CatalogRules.sessionWith(spark, Nil)
    val offDf = text(off)
    assert(scanTables(offDf) === Set("lineitem", "supplier", "nation"))
    assert(on.schema === offDf.schema)
    assert(sortedRows(on) === sortedRows(offDf))
    // one unproven dim (nation's entry dropped) stands the WHOLE chain
    // down — a half-proven chain must not half-fire
    MvPhases.ensureStoredSk(spark, sf)
    val st = StatsPhases.collected(spark, sf)
    val noNation = CatalogRules.CatalogStats(st.tables - "nation")
    val half = CatalogRules.sessionWith(spark, Nil)
    CatalogRules.installRules(half,
      Seq(MvRewriteRule(Seq(MvPhases.mvDefSk(half, sf)), noNation)))
    assert(scanTables(text(half)) === Set("lineitem", "supplier", "nation"))
    // grouping sets compose with the chain (the Expand path shares the
    // peel): ROLLUP subtotals over the snowflake serve from cells +
    // both live dims
    val proven = CatalogRules.sessionWith(spark, Nil)
    CatalogRules.installRules(proven,
      Seq(MvRewriteRule(Seq(MvPhases.mvDefSk(proven, sf)), st)))
    def rollupText(s: org.apache.spark.sql.SparkSession) =
      Tables.lineitem(s, sf)
        .join(Tables.supplier(s, sf), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.nation(s, sf), col("s_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
            .as("sum_qty"))
    val rolled = rollupText(proven)
    assert(scanTables(rolled) ===
      Set(MvPhases.skTable(sf), "supplier", "nation"), scanTables(rolled))
    assert(sortedRows(rolled) === sortedRows(rollupText(off)))
  }

  test("name-shadowing dim refuses (r21): an aliasing Project on the dim side stands the MV join rewrite down even when the alias NAME carries a unique-proven stat") {
    import graft.queries.StatsPhases
    MvPhases.ensureStoredSk(spark, sf)
    val st = StatsPhases.collected(spark, sf)
    val on = CatalogRules.sessionWith(spark, Nil)
    CatalogRules.installRules(on,
      Seq(MvRewriteRule(Seq(MvPhases.mvDefSk(on, sf)), st)))
    // supplier's NON-unique s_nationkey renamed to the proven-unique
    // key's name: tableOf + the name-keyed ndv + path all pass; only
    // the verbatim-leaf guard sees the alias. Firing would multiply
    // cells per duplicate dim key.
    def shadowText(s: org.apache.spark.sql.SparkSession) =
      Tables.lineitem(s, sf)
        .join(Tables.supplier(s, sf)
            .select(col("s_nationkey").as("s_suppkey"), col("s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
            .as("sum_qty"))
    // stood down: the fact scan survives
    assert(scanTables(shadowText(on)).contains("lineitem"),
      scanTables(shadowText(on)))
    // the verbatim spelling still serves from cells + the live dim
    def verbatimText(s: org.apache.spark.sql.SparkSession) =
      Tables.lineitem(s, sf)
        .join(Tables.supplier(s, sf).select(col("s_suppkey"), col("s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
            .as("sum_qty"))
    assert(scanTables(verbatimText(on)) ===
      Set(MvPhases.skTable(sf), "supplier"), scanTables(verbatimText(on)))
    val off = CatalogRules.sessionWith(spark, Nil)
    assert(sortedRows(shadowText(on)) === sortedRows(shadowText(off)))
  }

  test("q279: the window('1 hour') spelling serves from the hour rollup — struct rebuilt per cell, TimeWindow's injected null guards mapped to the bucket; a sliding window keeps the event scan; same rows") {
    import org.apache.spark.sql.functions.{expr, timestamp_micros, unix_micros, window}
    val on = SparkEntry.queries("q279_mv_window_spelling")(spark, sf)
    assert(scanTables(on) === Set(MvPhases.tsTable(sf)), scanTables(on))
    def text(s: org.apache.spark.sql.SparkSession) =
      Tables.eventsTsNs(s, sf)
        .groupBy(
          window(timestamp_micros(expr("ts div 1000")), "1 hour"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,4)")).cast("double")
            .as("sum_value"))
        .select(unix_micros(col("window.start")).as("hour_us"),
          col("event_type"), col("cnt"), col("sum_value"))
    val off = CatalogRules.sessionWith(spark, Nil)
    val offDf = text(off)
    assert(scanTables(offDf) === Set("events"))
    assert(on.schema === offDf.schema)
    assert(sortedRows(on) === sortedRows(offDf))
    // a SLIDING window (1h every 30min) is NOT a bijection of the hour
    // bucket — each event lands in two windows; nothing is declared
    // for that shape and the event scan correctly survives
    MvPhases.ensureStoredTs(spark, sf)
    val child = CatalogRules.sessionWith(spark, Nil)
    CatalogRules.installRules(child,
      Seq(MvRewriteRule(Seq(MvPhases.mvDefTs(child, sf)))))
    val sliding = Tables.eventsTsNs(child, sf)
      .groupBy(
        window(timestamp_micros(expr("ts div 1000")), "1 hour", "30 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    assert(scanTables(sliding) === Set("events"), scanTables(sliding))
    // conf face: the winus alt + its guard set ride the published
    // grammar
    val conf = CatalogRules.sessionWith(spark, Seq(ConfMvRewriteRule),
      ConfMvRewriteRule.DefsConf -> MvPhases.mvDefTsConf(spark, sf))
    val viaConf = text(conf)
    assert(scanTables(viaConf) === Set(MvPhases.tsTable(sf)),
      scanTables(viaConf))
    assert(sortedRows(viaConf) === sortedRows(offDf))
  }

  test("the wide-fixture MV def serves the WIDE events dir from cells and REFUSES the original dir (basePath pins which events it summarizes)") {
    import graft.queries.WidePhases
    val wd = WidePhases.ensureBuilt(spark, sf)
    MvPhases.ensureStoredTsWide(spark, sf)
    val child = CatalogRules.sessionWith(spark, Nil)
    CatalogRules.installRules(child,
      Seq(MvRewriteRule(Seq(MvPhases.mvDefTsWide(child, sf)))))
    def text(s: org.apache.spark.sql.SparkSession, dir: String) =
      Tables.eventsTsNs(s, dir)
        .filter(col("ts") >= lit(473712L * MvPhases.HourNs))
        .groupBy(
          expr(graft.operators.Resample.floorDivSql("ts", MvPhases.HourNs))
            .as("hour_idx"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast("decimal(18,4)")).cast("double")
            .as("sum_value"))
    // the wide dir is served from the wide rollup's cells (the q269w
    // bench pair's rule side — this pin is what makes its 2x+ margin a
    // REWRITE win, not a different query)
    val served = text(child, wd)
    assert(scanTables(served) === Set(MvPhases.tsTableWide(sf)),
      scanTables(served))
    // ...and the ORIGINAL dir still scans events: a def over the wide
    // copy must never answer another directory's same-named table,
    // even though the leaf-form wide `ts` also canonicalizes
    // differently than the normalizing loader's
    val narrow = text(child, sf)
    assert(scanTables(narrow).contains("events"), scanTables(narrow))
    // served == scratch over the wide fixture, row for row
    val off = CatalogRules.sessionWith(spark, Nil)
    assert(sortedRows(served) === sortedRows(text(off, wd)))
  }

  test("min/max fold and the count fold is non-null-typed") {
    val child = mvSession()
    val df = Tables.lineitem(child, sf)
      .groupBy("l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_extendedprice")).as("max_price"))
    assert(scanTables(df) === Set(MvPhases.mvTable(sf)), scanTables(df))
    val off = Tables.lineitem(spark, sf)
      .groupBy("l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_extendedprice")).as("max_price"))
    assert(df.schema("cnt").dataType === off.schema("cnt").dataType)
    assert(sortedRows(df) === sortedRows(off))
  }
}
