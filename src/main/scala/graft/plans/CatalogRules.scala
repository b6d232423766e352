package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Expression, EqualTo, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Filter, HintInfo, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Catalyst optimizer rules that ENACT the stored-statistics layer's
  * decisions inside the planner — the serving seam the stats queries
  * (q229–q243) collect evidence for. The reference has no optimizer at
  * all (SURVEY.md §4: "Optimizer: none"); these rules are the extension
  * surface's answer to "what is a stats catalog FOR": q239 reads the
  * catalog to cost, q241 reads it to CHOOSE a join order — these rules
  * make Catalyst itself read it, so the choice lands in the physical
  * plan without any query rewrite by the user.
  *
  * All three rules are pure plan-to-plan functions over PUBLIC Catalyst
  * APIs, registered per-session through
  * `spark.experimental.extraOptimizations` (the public user-rule hook,
  * running as the final optimizer batch — after Spark's own hint
  * resolution and predicate pushdown, so what they decide is what the
  * planner sees). [[CatalogRules.sessionWith]] scopes them to a child
  * session: rule state is a handful of collected catalog rows (KBs — the
  * q239 "cost every query from KBs" seam), and the parent session's
  * planning is untouched.
  *
  * Design contract shared by all three:
  *  - SEMANTICS-PRESERVING: only join hints, inner-join association
  *    order (with a restoring projection), and AND-chain order change —
  *    never the result.
  *  - NO-OP WITHOUT EVIDENCE: a join side that is not a recognizable
  *    single-table scan, a missing catalog row, an existing user hint, a
  *    predicate the estimator cannot cost — each makes the rule leave
  *    the plan alone rather than guess.
  *  - IDEMPOTENT: extraOptimizations run under the optimizer's fixpoint
  *    driver; every rewrite disables its own trigger (a set hint, an
  *    already-minimal order, an already-sorted chain).
  */
object CatalogRules {

  /** How a catalog entry was produced — the trust grade rules read
    * before USING a stat as a proof rather than a cost. Ordering
    * decisions (join order, broadcast, conjunct order) accept either
    * grade: a wrong estimate miscosts but can never change rows.
    * PROOFS — [[MvRewriteRule]]'s dim-key-uniqueness check, whose
    * failure mode is doubled partials, i.e. wrong rows — accept only
    * [[StatProvenance.Exact]]: an HLL catalog can satisfy ndv == rows
    * by estimation error. The DEFAULT on [[TableStat]] is Approx, the
    * fail-safe direction: a collector that forgets to tag loses a
    * rewrite, never a result; claiming Exact is an explicit act
    * reserved for counting collectors (StatsPhases' countDistinct). */
  sealed trait StatProvenance
  object StatProvenance {
    case object Exact extends StatProvenance
    case object Approx extends StatProvenance
  }

  /** Per-table catalog slice: base row count and per-column ndv — the
    * exact shape StatsPhases persists (tbl, key, n, ndv) — plus the
    * trust metadata proofs need: [[provenance]] (counted vs sketched)
    * and, when the collector recorded it, the table's root [[path]].
    * The path closes the name-aliasing seam: rules identify scans by
    * parquet basename ([[tableOf]]), so `a/lineitem.parquet` and
    * `b/lineitem.parquet` alias; a recorded path lets a PROOF refuse a
    * same-named table from another directory (for ordering rules the
    * alias only miscosts, so they stay name-keyed — the conf-published
    * catalog form carries no paths). */
  final case class TableStat(
      rows: Long,
      ndv: Map[String, Long],
      provenance: StatProvenance = StatProvenance.Approx,
      path: Option[String] = None)

  /** The collected catalog a rule plans from. KBs by construction: one
    * row per (table, join key), never data. */
  final case class CatalogStats(tables: Map[String, TableStat]) {
    def rows(t: String): Option[Long] = tables.get(t).map(_.rows)
    def ndv(t: String, c: String): Option[Long] =
      tables.get(t).flatMap(_.ndv.get(c))
  }

  /** The base table behind a join side, when the side is a plain scan
    * pipeline: Project/Filter chains over ONE file relation whose root
    * path is `<table>.parquet`. Anything else (joins, aggregates,
    * unions, aliased projections below) returns None — the catalog's
    * grain is base tables, and a rule must not cost what it cannot
    * name. Filters above the scan make the base row count an
    * OVERESTIMATE of the side's true size; for the broadcast decision
    * that is the safe direction (a side only qualifies as small when
    * even its unfiltered table is small).
    */
  @scala.annotation.tailrec
  def tableOf(plan: LogicalPlan): Option[String] = plan match {
    case p: Project => tableOf(p.child)
    case f: Filter => tableOf(f.child)
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.map(_.getName).distinct.toSeq match {
            case Seq(one) if one.endsWith(".parquet") =>
              Some(one.stripSuffix(".parquet"))
            case _ => None
          }
        case _ => None
      }
    case _ => None
  }

  /** The FULL root path (scheme-stripped URI path) of the single file
    * relation behind a scan pipeline — [[tableOf]]'s identity, without
    * the basename collapse. Proof-grade checks compare this against a
    * recorded path so two directories' same-named tables cannot alias. */
  @scala.annotation.tailrec
  def scanPath(plan: LogicalPlan): Option[String] = plan match {
    case p: Project => scanPath(p.child)
    case f: Filter => scanPath(f.child)
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.map(_.toUri.getPath).distinct.toSeq match {
            case Seq(one) => Some(one)
            case _ => None
          }
        case _ => None
      }
    case _ => None
  }

  /** The leaf file relation behind a scan pipeline — the node
    * [[tableOf]]/[[scanPath]] name. Both walkers skip ANY Project,
    * including aliasing ones, which is fine for naming but NOT for a
    * uniqueness proof: a dim subtree like `SELECT n_regionkey AS
    * n_nationkey FROM nation` would pass a name-keyed ndv check for a
    * column that is not the one actually joined. Proof-grade callers
    * pair the name with [[verbatimLeafOutput]] over the attributes they
    * are about to trust. */
  @scala.annotation.tailrec
  def leafRelation(plan: LogicalPlan): Option[LogicalRelation] = plan match {
    case p: Project => leafRelation(p.child)
    case f: Filter => leafRelation(f.child)
    case lr: LogicalRelation => Some(lr)
    case _ => None
  }

  /** True iff every attribute is a VERBATIM output of the leaf relation
    * behind `plan` (exprId membership — an alias introduced by a skipped
    * Project has a different exprId and fails). The guard that closes
    * the name-shadowing hole: a stats entry proves uniqueness of a leaf
    * COLUMN, so the attribute the join actually keys on must BE that
    * leaf column, not a same-named alias of another. */
  def verbatimLeafOutput(
      plan: LogicalPlan,
      attrs: Seq[org.apache.spark.sql.catalyst.expressions.Attribute]): Boolean =
    leafRelation(plan).exists(lr => attrs.forall(lr.outputSet.contains))

  /** Normalize a loader-side `dir/table.parquet` string to the same
    * scheme-stripped form [[scanPath]] emits, so a collector can record
    * a comparable path without constructing a plan. */
  def normalizePath(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** A child session with `rules` installed as extraOptimizations plus
    * any conf overrides — rule scoping without touching the caller's
    * session (newSession shares the SparkContext, the warehouse catalog,
    * and the builder-time options; optimizer rules and runtime confs set
    * here live and die with the child). The cast is to the classic
    * (JVM-local) session, the only kind this engine constructs;
    * a Connect deployment would install the same rules server-side via
    * `spark.sql.extensions` + `injectOptimizerRule` instead.
    */
  def sessionWith(
      spark: SparkSession,
      rules: Seq[Rule[LogicalPlan]],
      confs: (String, String)*): SparkSession = {
    val child = spark.newSession()
    installRules(child, rules)
    child.conf.set("spark.sql.shuffle.partitions",
      spark.conf.get("spark.sql.shuffle.partitions"))
    confs.foreach { case (k, v) => child.conf.set(k, v) }
    child
  }

  /** (Re)install extraOptimizations on an existing session — for rules
    * whose construction needs the session itself (e.g. [[MvRewriteRule]]
    * resolves the rollup's read plan against the session it will rewrite
    * in, so the session must exist before the rule can). */
  def installRules(
      session: SparkSession, rules: Seq[Rule[LogicalPlan]]): Unit =
    session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental.extraOptimizations = rules.toList

  /** System-R equi-join output estimate |L||R| / max(ndv_L, ndv_R) — the
    * q231/q239/q241 formula, BigInt so no scale overflows it. */
  private[plans] def joinEstimate(
      nL: Long, ndvL: Long, nR: Long, ndvR: Long): BigInt =
    BigInt(nL) * BigInt(nR) / BigInt(math.max(1L, math.max(ndvL, ndvR)))

  /** The catalog key for a (possibly composite) column set: one column
    * is itself; several join SORTED under `+` — order-insensitive, so
    * `ON a.x = b.x AND a.y = b.y` and its swapped spelling meet the
    * same ANALYZE entry. `+` is in no TPC-H-ish identifier and in none
    * of the conf grammars' separators, so composite keys travel through
    * `spark.graft.joinorder.stats` / `spark.graft.mv.exactstats`
    * unescaped. The collector computes the entry as
    * `countDistinct(colA, colB, …)` (distinct fully-NON-NULL tuples —
    * rows with any null key are excluded, which for a uniqueness PROOF
    * is the conservative direction: null-keyed rows can only make
    * ndv < rows, never a false ndv == rows). */
  def compositeKey(cols: Seq[String]): String =
    if (cols.lengthCompare(1) == 0) cols.head else cols.sorted.mkString("+")

  /** The catalog key for a COMPUTED grain component — `GROUP BY
    * floorDiv(ts, w)`-style expressions the eager-aggregation gate
    * must price (q277): a short hex digest of the expression's
    * leaf-resolved [[MvRewriteRule.canonicalKey]] canonical, prefixed
    * so it can never collide with a real column name. Digesting keeps
    * the key free of every conf-grammar separator (a canonical is a
    * SQL rendering full of them) and composable through
    * [[compositeKey]]'s `+` join; the collector derives the SAME
    * canonical from a probe plan built with the query text
    * (groupingCanonicals — the q266 no-drift device), so the ANALYZE
    * entry and the rewrite-time lookup cannot diverge. */
  def exprKey(canonical: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    "expr$" + md.digest(canonical.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString
  }

  /** The full decision layer in its COMPOSITION order — the order is a
    * contract, not a style choice: rewrites that change plan SHAPE must
    * run before rules that pin STRATEGY, because the hint-setting rule
    * marks joins and every shape rule treats an existing hint as user
    * intent and stands down. Concretely, per fixpoint iteration:
    *
    *  1. [[MvRewriteRule]] — may remove the fact scan entirely; must see
    *     joins un-hinted (q252's shape requires `JoinHint.NONE`).
    *  2. [[EagerAggregationRule]] — after the MV rule (a STORED rollup
    *     beats an on-the-fly partial aggregate; once the MV fires, the
    *     rollup scan is not a cataloged base and this rule stands
    *     down), before the strategy rules for the same hint reason.
    *  3. [[CatalogJoinOrderRule]] — re-associates chains; same hint
    *     requirement.
    *  4. [[ConjunctReorderRule]] — filter-local, order-independent of
    *     the join rules.
    *  5. [[CatalogBroadcastRule]] — LAST: hints whatever joins survived
    *     the rewrites (including the rewritten ones whose sides it can
    *     still cost). Iteration 2 is then a fixpoint: every shape rule
    *     sees hints and stands down, the hint rule sees its own hints.
    *
    * Installing them in another order is safe (the rows can never
    * change — every rule is semantics-preserving alone) but can cost
    * rewrites: a hinted join is invisible to the shape rules.
    */
  def standardRules(
      stats: CatalogStats,
      mvs: Seq[MvDef] = Nil,
      selectivity: Option[org.apache.spark.sql.catalyst.expressions.Expression => Option[Double]] = None)
      : Seq[Rule[LogicalPlan]] =
    Seq(MvRewriteRule(mvs, stats), EagerAggregationRule(stats),
      // selectivity feeds BOTH the conjunct ORDER and (default-on since
      // r19) the join-order rule's effective base sizes — System-R's
      // other half: a 3%-filtered fact should not be costed huge. The
      // decision then tracks the actual numbers, so it can change with
      // data scale; that scale-dependence is the feature (q262), and a
      // deployment pinning plans across environments opts out by
      // passing selectivity = None.
      CatalogJoinOrderRule(stats, selectivity)) ++
      selectivity.map(ConjunctReorderRule(_)).toSeq :+
      CatalogBroadcastRule(stats.tables.map { case (t, s) => t -> s.rows })
}

/** Broadcast-side choice from the stored catalog: an inner equi-join
  * whose two sides are recognizable base-table scans gets a BROADCAST
  * hint on the side whose CATALOG row count is (a) at most
  * `maxBroadcastRows` and (b) at least `minRatio`x smaller than the
  * other side. This is the decision
  * `spark.sql.autoBroadcastJoinThreshold` makes from file SIZE at
  * planning time and AQE re-makes from observed shuffle sizes at
  * runtime; the catalog face makes it from ANALYZE statistics — the
  * classical System-R input — so it holds even where file size misleads
  * (compression skew) and before any runtime evidence exists. At 100 TB
  * the stake is the difference between shuffling the fact table and
  * shipping a KB-scale dim to every executor.
  *
  * Leaves the plan alone when: either side already carries a user hint
  * (user intent outranks statistics), a side is not a single-table
  * scan, a catalog row is missing, or neither side is decisively
  * smaller. Idempotent: the hint it sets disables its own trigger.
  */
final case class CatalogBroadcastRule(
    rows: Map[String, Long],
    maxBroadcastRows: Long = 100000L,
    minRatio: Long = 4L) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner, _, JoinHint(None, None)) =>
      val nl = CatalogRules.tableOf(l).flatMap(rows.get)
      val nr = CatalogRules.tableOf(r).flatMap(rows.get)
      // Ratio test in BigInt: with a conf-raised maxBroadcastRows a
      // Long product b * minRatio can overflow negative and pass the
      // comparison — hinting a multi-billion-row broadcast (executor
      // OOM). joinEstimate already follows the same discipline.
      (nl, nr) match {
        case (Some(a), Some(b))
            if b <= maxBroadcastRows && BigInt(a) >= BigInt(b) * minRatio =>
          j.copy(hint = JoinHint(None, Some(HintInfo(Some(BROADCAST)))))
        case (Some(a), Some(b))
            if a <= maxBroadcastRows && BigInt(b) >= BigInt(a) * minRatio =>
          j.copy(hint = JoinHint(Some(HintInfo(Some(BROADCAST))), None))
        case _ => j
      }
  }
}

/** The config-only deployment form of [[CatalogBroadcastRule]]:
  * injected once through `GraftExtensions.injectOptimizerRule`, so a
  * deployment that enables the engine purely by config
  * (`spark.sql.extensions=graft.functions.GraftExtensions`) turns on
  * catalog-driven broadcasts by setting ONE runtime conf —
  *
  * {{{
  * spark.graft.broadcast.rows = "lineitem:6000000000,supplier:10000000"
  * spark.graft.broadcast.maxRows = "100000000"   // optional
  * spark.graft.broadcast.minRatio = "4"          // optional
  * }}}
  *
  * — the serving shape for a real cluster, where the ANALYZE job that
  * maintains the stored catalog publishes these values and queries pick
  * them up without any code. Confs are read per optimizer invocation
  * from the ACTIVE session (`Rule.conf`), so different sessions on one
  * context can carry different catalogs. With the conf absent or empty
  * the rule is a strict no-op — every existing session pays nothing.
  * A malformed numeric conf fails the query loudly (a wrong catalog is
  * a caller bug, not something to guess around).
  */
object ConfCatalogBroadcastRule extends Rule[LogicalPlan] {
  val RowsConf = "spark.graft.broadcast.rows"
  val MaxRowsConf = "spark.graft.broadcast.maxRows"
  val RatioConf = "spark.graft.broadcast.minRatio"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val spec = conf.getConfString(RowsConf, "")
    if (spec.trim.isEmpty) plan
    else {
      val rows = spec.split(",").iterator.map(_.trim).filter(_.nonEmpty)
        .map { kv =>
          kv.split(":") match {
            case Array(t, n) => t.trim -> n.trim.toLong
            case _ => throw new IllegalArgumentException(
              s"$RowsConf entries must be table:rows — got '$kv'")
          }
        }.toMap
      CatalogBroadcastRule(rows,
        conf.getConfString(MaxRowsConf, "100000").toLong,
        conf.getConfString(RatioConf, "4").toLong).apply(plan)
    }
  }
}

/** The config-only deployment form of [[CatalogJoinOrderRule]] — the
  * same serving seam as [[ConfCatalogBroadcastRule]]: injected once via
  * `spark.sql.extensions=graft.functions.GraftExtensions`, it turns on
  * catalog-driven join ordering when ONE runtime conf publishes the
  * (rows, per-key ndv) catalog —
  *
  * {{{
  * spark.graft.joinorder.stats =
  *   "lineitem:6000000000:l_orderkey=1500000000;orders:1500000000:o_orderkey=1500000000,o_custkey=100000000;customer:100000000:c_custkey=100000000"
  * }}}
  *
  * — `;` between tables, each `table:rows:col=ndv[,col=ndv…]`. Read per
  * optimizer invocation from the active session, strict no-op when
  * unset, loud failure on a malformed string (a wrong catalog is a
  * caller bug, not something to guess around). The published stats are
  * ORDERING-grade (TableStat's default Approx provenance): this rule
  * never uses them as a proof, so a sketch-maintained publisher is
  * fine.
  */
object ConfCatalogJoinOrderRule extends Rule[LogicalPlan] {
  val StatsConf = "spark.graft.joinorder.stats"

  /** Opt-in (default false): discount each base's catalog count by the
    * estimated selectivity of the filters above its scan, built from
    * the conjunct rule's published histogram/MCV confs — the q262
    * filter-aware ordering, by config. Deliberately opt-in on the CONF
    * face even though the programmatic standardRules stack passes its
    * estimator through by default (r19): a conf-deployed catalog pins
    * plans across environments, and scale-dependent ordering (the
    * feature) is exactly what such a deployment may not want — the
    * deployer flips ONE conf to get it. */
  val UseSelectivityConf = "spark.graft.joinorder.useSelectivity"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val spec = conf.getConfString(StatsConf, "")
    if (spec.trim.isEmpty) plan
    else {
      val sel =
        if (!conf.getConfString(UseSelectivityConf, "false").toBoolean) None
        else {
          val hs = conf.getConfString(ConfConjunctReorderRule.HistsConf, "")
          val ms = conf.getConfString(ConfConjunctReorderRule.McvsConf, "")
          if (hs.trim.isEmpty && ms.trim.isEmpty) None
          else Some(ConjunctReorderRule.estimator(
            ConfConjunctReorderRule.parseHists(hs),
            ConfConjunctReorderRule.parseMcvs(ms)))
        }
      CatalogJoinOrderRule(
        CatalogRules.CatalogStats(parse(spec)), sel).apply(plan)
    }
  }

  private[plans] def parse(spec: String): Map[String, CatalogRules.TableStat] =
    spec.split(";").iterator.map(_.trim).filter(_.nonEmpty).map { entry =>
      entry.split(":") match {
        case Array(t, n, cols) =>
          val ndv = cols.split(",").iterator.map(_.trim).filter(_.nonEmpty)
            .map { kv =>
              kv.split("=") match {
                case Array(c, d) => c.trim -> d.trim.toLong
                case _ => throw new IllegalArgumentException(
                  s"$StatsConf ndv entries must be col=ndv — got '$kv'")
              }
            }.toMap
          t.trim -> CatalogRules.TableStat(n.trim.toLong, ndv)
        case _ => throw new IllegalArgumentException(
          s"$StatsConf entries must be table:rows:col=ndv[,col=ndv…] — " +
            s"got '$entry'")
      }
    }.toMap
}

/** Join-order choice from the stored catalog — q241's decision, ENACTED
  * and generalized: a left-deep chain of inner equi-joins over up to
  * [[CatalogJoinOrderRule.MaxChain]] cataloged base tables is rebuilt
  * in the GREEDY System-R order — start from the join pair with the
  * smallest predicted output, then repeatedly attach the connectable
  * base whose predicted result is smallest, carrying the running
  * cardinality with the standard ndv-preservation assumption
  * (ndv of a key inside an intermediate = min(base ndv, intermediate
  * size) — q241's documented second-join formula). The intermediates a
  * multi-join materializes (and shuffles) are the dominant cost at
  * scale; q241 measured the fixture 3-chain's orders at 60k vs 15k
  * rows — this rule makes Catalyst build the 15k plan from the 60k
  * query text, and on the 4-chain (q247) starts from the
  * dimension-dimension pair the written text joins LAST.
  *
  * Scope guards keep the rewrite provably output-preserving: every
  * join must be Inner + single-EqualTo + hint-free, every base a
  * recognizable cataloged scan, every condition a connected edge
  * (greedy never forms a cross join — if no unused condition touches
  * the tree, the rule bails). The rebuilt tree reuses the SAME
  * resolved condition expressions over the SAME relation nodes;
  * pruning projections between steps restore what column pruning had
  * done on the old shape, and a final projection restores the original
  * output order (association changes child output concatenation;
  * parents reference attributes, but positional consumers like Union
  * must see the exact original sequence). Deterministic (stable minBy,
  * BigInt arithmetic) and idempotent: greedy over its own output picks
  * the same order and returns the node untouched.
  */
final case class CatalogJoinOrderRule(
    stats: CatalogRules.CatalogStats,
    selectivity: Option[Expression => Option[Double]] = None)
    extends Rule[LogicalPlan] with PredicateHelper {
  import CatalogJoinOrderRule.MaxChain

  /** Strip the attribute-only pruning Project that ColumnPruning (or a
    * previous run of this rule) leaves between nested joins, so the
    * chain pattern is visible. */
  private def underPrune(p: LogicalPlan): LogicalPlan = p match {
    case Project(pl, j: Join) if pl.forall(_.isInstanceOf[AttributeReference]) => j
    case other => other
  }

  /** A join condition usable as a chain edge: a conjunction whose
    * every conjunct is an EqualTo — one equality (the common case) or a
    * COMPOSITE key (`ON a.x = b.x AND a.y = b.y`, the
    * delta-vs-snapshot / multi-part-PK join). Anything else — a range
    * term, an OR — is not an equi edge and breaks the chain shape. */
  private def asEqs(cond: Expression): Option[Seq[EqualTo]] = {
    val cs = splitConjunctivePredicates(cond)
    val eqs = cs.collect { case e: EqualTo => e }
    if (eqs.length == cs.length && eqs.nonEmpty) Some(eqs) else None
  }

  /** Flatten a left-deep inner-equi chain: bases left-to-right, conds
    * innermost-first (cond k joined base k+1 onto the tree; each cond
    * is reused VERBATIM when the tree is rebuilt). A subtree that
    * breaks the shape is kept whole as an (uncostable) base, which
    * makes the greedy pass bail cleanly. */
  private def chain(j: Join): (Seq[LogicalPlan], Seq[Expression]) = j match {
    case Join(l, r, Inner, Some(c), JoinHint(None, None))
        if asEqs(c).isDefined =>
      underPrune(l) match {
        case lj: Join =>
          val (bs, cs) = chain(lj)
          if (cs.isEmpty) (Seq(l, r), Seq(c)) // inner join not chain-shaped
          else (bs :+ r, cs :+ c)
        case base => (Seq(base, r), Seq(c))
      }
    case _ => (Seq(j), Seq.empty)
  }

  // transformDown: the outermost join sees (and reorders) the whole
  // chain in one decision; already-greedy sub-chains below then no-op.
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case top @ Join(_, _, Inner, Some(c), JoinHint(None, None))
        if asEqs(c).isDefined =>
      val (bases, conds) = chain(top)
      if (conds.size < 2 || bases.size > MaxChain) top
      else greedyOrder(top, bases, conds).getOrElse(top)
  }

  /** The filter conjuncts riding a base's scan pipeline (the same
    * prune/filter chain [[CatalogRules.tableOf]] sees through). */
  private def filtersOf(p: LogicalPlan): Seq[Expression] = p match {
    case Project(_, c) => filtersOf(c)
    case Filter(cond, c) => splitConjunctivePredicates(cond) ++ filtersOf(c)
    case _ => Nil
  }

  /** A base's effective row count: its catalog count times the
    * estimated pass-fraction of every COSTABLE filter conjunct above
    * its scan. IsNotNull and uncostable conjuncts contribute 1.0 (the
    * safe overestimate — note the semantic split: the conjunct-ORDER
    * estimator prices IsNotNull at 0 because it is the cheapest test
    * to EVALUATE, but as a SELECTIVITY a null guard passes ~all rows).
    * Without an estimator this is exactly the catalog count — the
    * blind q241 behavior ([[CatalogRules.standardRules]] passes its
    * selectivity estimator through since r19 — filter-aware ordering
    * default-on; callers wanting scale-stable plan pins pass None). */
  private def effRows(base: LogicalPlan, catalogRows: Long): BigInt = {
    val sel = selectivity match {
      case None => 1.0
      case Some(est) => filtersOf(base).map {
        case _: IsNotNull => 1.0
        case e => est(e).getOrElse(1.0)
      }.product
    }
    BigInt(math.max(1L, math.round(catalogRows * sel)))
  }

  private def greedyOrder(
      top: Join, bases: Seq[LogicalPlan], conds: Seq[Expression]): Option[LogicalPlan] = {
    val n = bases.size
    // Catalog lookups per base; any miss disqualifies the whole chain.
    val tables = bases.map(CatalogRules.tableOf)
    if (tables.exists(_.isEmpty)) return None
    val rows = tables.map(_.flatMap(stats.rows))
    if (rows.exists(_.isEmpty)) return None
    // Effective (filter-aware when an estimator is supplied) sizes;
    // a key's ndv can never exceed the rows that survive the filter.
    val eff = bases.zip(rows).map { case (b, r) => effRows(b, r.get) }
    // A (possibly composite) key's ndv under the ANALYZE catalog's
    // composite-key convention; a composite without its counted entry
    // is uncostable — per-column ndvs cannot be combined soundly
    // (independence would OVERestimate a correlated key's ndv and
    // underprice the join).
    def ndv(base: Int, cols: Seq[String]): Option[Long] =
      tables(base).flatMap(t =>
        stats.ndv(t, CatalogRules.compositeKey(cols)))

    // Each condition as an edge (baseA, colsA, baseB, colsB): every
    // conjunct of a composite condition must link the SAME two bases.
    final case class Edge(
        ci: Int, ia: Int, ca: Seq[String], ib: Int, cb: Seq[String])
    val edges = conds.zipWithIndex.map { case (c, ci) =>
      val pairs = asEqs(c).get.map { eq =>
        (eq.left, eq.right) match {
          case (la: AttributeReference, ra: AttributeReference) =>
            val ia = bases.indexWhere(_.outputSet.contains(la))
            val ib = bases.indexWhere(_.outputSet.contains(ra))
            if (ia < 0 || ib < 0 || ia == ib) return None
            (ia, la.name, ib, ra.name)
          case _ => return None
        }
      }
      val (i0, _, j0, _) = pairs.head
      val oriented = pairs.map {
        case (`i0`, x, `j0`, y) => (x, y)
        case (`j0`, y, `i0`, x) => (x, y)
        case _ => return None // a third base inside one condition
      }
      val (ca, cb) = (oriented.map(_._1), oriented.map(_._2))
      if (ndv(i0, ca).isEmpty || ndv(j0, cb).isEmpty) return None
      Edge(ci, i0, ca, j0, cb)
    }

    // Seed: the edge with the smallest predicted pair join (stable min).
    def pairEst(e: Edge): BigInt = {
      val (na, nb) = (eff(e.ia), eff(e.ib))
      val da = BigInt(ndv(e.ia, e.ca).get) min na
      val db = BigInt(ndv(e.ib, e.cb).get) min nb
      na * nb / (da max db max BigInt(1))
    }
    val seed = edges.minBy(pairEst)
    var treeCard = pairEst(seed)
    val inTree = scala.collection.mutable.Set(seed.ia, seed.ib)
    val used = scala.collection.mutable.Set(seed.ci)
    // (condIdx, newBaseIdx) in greedy attach order.
    val attach = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    while (used.size < edges.size) {
      val cands = edges.filter(e =>
        !used(e.ci) && (inTree(e.ia) ^ inTree(e.ib)))
      if (cands.isEmpty) return None // disconnected: would be a cross join
      def attachEst(e: Edge): BigInt = {
        val (ti, tc, ni, nc) =
          if (inTree(e.ia)) (e.ia, e.ca, e.ib, e.cb) else (e.ib, e.cb, e.ia, e.ca)
        val ndvTree = BigInt(ndv(ti, tc).get) min treeCard
        val ndvNew = BigInt(ndv(ni, nc).get) min eff(ni)
        treeCard * eff(ni) / (ndvTree max ndvNew max BigInt(1))
      }
      val best = cands.minBy(attachEst)
      treeCard = attachEst(best)
      val newBase = if (inTree(best.ia)) best.ib else best.ia
      inTree += newBase; used += best.ci
      attach += ((best.ci, newBase))
    }

    // Written order = seed (0,1) on cond 0, then conds 1..n-2 attaching
    // bases 2..n-1. If greedy reproduces it, leave the node untouched.
    val writtenSeed = seed.ci == 0 && Set(seed.ia, seed.ib) == Set(0, 1)
    val writtenAttach = attach.zipWithIndex.forall {
      case ((ci, nb), k) => ci == k + 1 && nb == k + 2 }
    if (writtenSeed && writtenAttach) return None

    // Rebuild left-deep in greedy order; seed sides keep original
    // relative base order for determinism.
    val (sl, sr) =
      if (seed.ia < seed.ib) (seed.ia, seed.ib) else (seed.ib, seed.ia)
    var tree: LogicalPlan =
      Join(bases(sl), bases(sr), Inner, Some(conds(seed.ci)), JoinHint.NONE)
    attach.zipWithIndex.foreach { case ((ci, nb), k) =>
      // Prune the running tree to what the remaining conditions and the
      // original output still need (restores ColumnPruning's effect on
      // the new shape — optimization already ran, nothing re-prunes).
      val remaining = attach.drop(k).map { case (c, _) => conds(c) }
      val needed = top.outputSet ++
        remaining.foldLeft(conds(ci).references)(_ ++ _.references)
      val treeP =
        if (tree.output.forall(needed.contains)) tree
        else Project(tree.output.filter(needed.contains), tree)
      tree = Join(treeP, bases(nb), Inner, Some(conds(ci)), JoinHint.NONE)
    }
    Some(Project(top.output, tree))
  }
}

object CatalogJoinOrderRule {
  /** Greedy is O(chain²) in plan nodes — cheap — but a very long chain
    * is a shape this narrow left-deep rewriter hasn't been argued
    * against; bail past this. */
  val MaxChain = 8
}

/** The config-only deployment form of [[ConjunctReorderRule]] —
  * completes the "enable by config on a real cluster" story for the
  * whole decision layer: the ANALYZE job that maintains the stored
  * histogram/MCV catalogs publishes them as two runtime confs and
  * every query planned in the session gets selective-first AND chains
  * with no code installed —
  *
  * {{{
  * spark.graft.conjunct.hists =
  *   "l_quantity:1.0:50.0:100|98|101|…;l_extendedprice:900.0:105000.0:…"
  * spark.graft.conjunct.mcvs =
  *   "l_suppkey:600000:10000:1=70,2=65,…"
  * }}}
  *
  * — `;` between columns; a hist entry is `col:mn:mx:c0|c1|…` (the
  * q232 equi-width cells), an MCV entry `col:n:ndv:v=cnt[,v=cnt…]`
  * (the q243 stat; optional — without it equality conjuncts keep the
  * chain as written, the rule's usual no-evidence stance). Read per
  * optimizer invocation, strict no-op with both confs unset, loud
  * failure on a malformed string.
  */
object ConfConjunctReorderRule extends Rule[LogicalPlan] {
  val HistsConf = "spark.graft.conjunct.hists"
  val McvsConf = "spark.graft.conjunct.mcvs"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val hs = conf.getConfString(HistsConf, "")
    val ms = conf.getConfString(McvsConf, "")
    if (hs.trim.isEmpty && ms.trim.isEmpty) plan
    else ConjunctReorderRule(ConjunctReorderRule.estimator(
      parseHists(hs), parseMcvs(ms))).apply(plan)
  }

  private[plans] def parseHists(
      spec: String): Map[String, ConjunctReorderRule.ColumnHist] =
    spec.split(";").iterator.map(_.trim).filter(_.nonEmpty).map { entry =>
      entry.split(":") match {
        case Array(c, mn, mx, cells) =>
          val counts = cells.split("\\|").iterator.map(_.trim)
            .filter(_.nonEmpty).map(_.toLong).toVector
          if (counts.isEmpty) throw new IllegalArgumentException(
            s"$HistsConf entry '$entry' has no cells")
          c.trim -> ConjunctReorderRule.ColumnHist(
            mn.trim.toDouble, mx.trim.toDouble, counts)
        case _ => throw new IllegalArgumentException(
          s"$HistsConf entries must be col:mn:mx:c0|c1|… — got '$entry'")
      }
    }.toMap

  private[plans] def parseMcvs(
      spec: String): Map[String, ConjunctReorderRule.ColumnMcv] =
    spec.split(";").iterator.map(_.trim).filter(_.nonEmpty).map { entry =>
      entry.split(":") match {
        case Array(c, n, ndv, pairs) =>
          val top = pairs.split(",").iterator.map(_.trim).filter(_.nonEmpty)
            .map { kv =>
              kv.split("=") match {
                // canonical key: "1", "1.0" and a string value all land
                // where the probe side's literal rendering lands
                case Array(v, cnt) =>
                  ConjunctReorderRule.ColumnMcv.key(v.trim) -> cnt.trim.toLong
                case _ => throw new IllegalArgumentException(
                  s"$McvsConf value entries must be v=cnt — got '$kv'")
              }
            }.toMap
          c.trim -> ConjunctReorderRule.ColumnMcv(
            n.trim.toLong, ndv.trim.toLong, top)
        case _ => throw new IllegalArgumentException(
          s"$McvsConf entries must be col:n:ndv:v=cnt[,v=cnt…] — " +
            s"got '$entry'")
      }
    }.toMap
}

/** AND-chain evaluation order from stored histograms: conjuncts of a
  * Filter are reordered most-selective-first (null guards, which are
  * both the cheapest test and a precondition of the comparisons, keep
  * estimate 0 and stay in front). Spark evaluates a conjunction
  * left-to-right with short-circuit inside whole-stage codegen, so on
  * scan survivors every row rejected by the first conjunct never pays
  * the rest — at 100 TB of scan output the CPU difference between
  * testing a 1%-pass predicate or a 99%-pass predicate first is the
  * filter's whole cost. Predicate pushdown is untouched (row-group
  * pruning extracts conjuncts by membership, not order; physical
  * planning runs after this rule).
  *
  * Only fires when EVERY conjunct is costable from the supplied
  * estimator (a chain with one opaque predicate is left alone — a
  * partial sort could move the opaque one past a cheaper test), and
  * only changes the plan when the order actually differs. Ties keep
  * written order (stable sort), so the rewrite is deterministic and
  * idempotent.
  */
final case class ConjunctReorderRule(est: Expression => Option[Double])
    extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) =>
      val cs = splitConjunctivePredicates(cond)
      if (cs.lengthCompare(2) < 0) f
      else {
        val es = cs.map(est)
        if (es.exists(_.isEmpty)) f
        else {
          val sorted = cs.zip(es.map(_.get))
            .sortBy(_._2)(Ordering.Double.TotalOrdering).map(_._1)
          if (sorted == cs) f else Filter(sorted.reduceLeft(And(_, _)), child)
        }
      }
  }
}

object ConjunctReorderRule {

  /** One column's equi-width histogram, collected for the estimator —
    * the q232 stat in serving form (buckets+2 doubles, KBs). */
  final case class ColumnHist(mn: Double, mx: Double, counts: Vector[Long]) {
    val total: Long = math.max(1L, counts.sum)
    private val buckets = counts.length
    private val width = (mx - mn) / buckets

    /** Estimated fraction of non-null rows with value >= v: full
      * buckets above v's cell plus uniform interpolation inside it —
      * the q233 rule. Ordering-grade (feeds a sort, not a result). */
    def geFraction(v: Double): Double =
      if (v <= mn) 1.0
      else if (v > mx) 0.0
      else {
        val idx = math.min(buckets - 1, ((v - mn) / width).toInt)
        val above = counts.drop(idx + 1).sum
        val hi = mn + (idx + 1) * width
        val partial = math.max(0.0, math.min(1.0, (hi - v) / width))
        (above + partial * counts(idx)) / total.toDouble
      }
  }

  /** One column's MCV equality stat in serving form — the q243 stat
    * (top-k values by exact count + the two scalars the tail split
    * needs), k+2 numbers per column, KBs. Values are held under
    * [[ColumnMcv.key]]'s CANONICAL string form so one stat type serves
    * numeric and string columns alike (numeric values render through
    * Double.toString on both the collection and the probe side, so
    * `1`, `1L` and `1.0` all meet at "1.0"; strings are themselves). */
  final case class ColumnMcv(n: Long, ndv: Long, top: Map[String, Long]) {
    private val mass: Long = top.values.sum

    /** Estimated fraction of rows equal to the canonical key — the
      * Postgres-style split (q243's rule): an MCV member costs its
      * exact count; anything else gets the uniform remainder
      * `(n - mcv_mass) div (ndv - k)`. Heavy hitters exact, tail
      * spread. Ordering-grade (feeds a sort, not a result). */
    def eqFraction(k: String): Double = {
      val cnt = top.getOrElse(k,
        if (ndv > top.size) math.max(0L, (n - mass) / (ndv - top.size))
        else 0L)
      cnt.toDouble / math.max(1L, n).toDouble
    }
  }

  object ColumnMcv {
    /** Canonicalize a raw value spelling: anything numeric lands on
      * Double.toString's rendering, anything else is itself. Every
      * producer (stored catalog, conf string) and consumer (literal
      * probe) goes through this, so the spellings cannot drift. */
    def key(raw: String): String =
      raw.toDoubleOption.map(_.toString).getOrElse(raw)
  }

  /** A literal's canonical MCV key: numerics through Double.toString
    * (where the stored catalog's values also land), strings as
    * themselves, anything else — null included — uncostable. */
  private def litKey(l: Literal): Option[String] =
    num(l).map(_.toString).orElse(l.value match {
      // through key(), so a numeric-LOOKING string literal meets a
      // numeric-looking stored string value at the same spelling
      case s: org.apache.spark.unsafe.types.UTF8String =>
        Some(ColumnMcv.key(s.toString))
      case _ => None
    })

  private def num(l: Literal): Option[Double] = l.value match {
    case null => None
    case d: java.lang.Double => Some(d)
    case f: java.lang.Float => Some(f.toDouble)
    case i: java.lang.Integer => Some(i.toDouble)
    case j: java.lang.Long => Some(j.toDouble)
    case s: java.lang.Short => Some(s.toDouble)
    case b: java.lang.Byte => Some(b.toDouble)
    case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
    case _ => None
  }

  /** Estimator over a set of per-column histograms plus (optionally)
    * per-column MCV lists: range comparisons against literals
    * interpolate the histogram; EQUALITY comparisons cost from the MCV
    * list (exact for heavy hitters, uniform remainder for the tail —
    * without an MCV entry an equality keeps the whole chain as
    * written, the r17 gap); null guards cost 0 so they sort first
    * (cheapest test, precondition of the rest — histogram or not: a
    * bare IsNotNull needs no distribution to be the right thing to
    * evaluate first, and the optimizer infers them onto join keys the
    * histograms never cover); anything else is uncostable -> None ->
    * the chain stays as written.
    */
  def estimator(
      hists: Map[String, ColumnHist],
      mcvs: Map[String, ColumnMcv] = Map.empty): Expression => Option[Double] = {
    case IsNotNull(_: AttributeReference) =>
      Some(0.0)
    case EqualTo(a: AttributeReference, l: Literal) =>
      mcvs.get(a.name).zip(litKey(l)).map { case (m, k) => m.eqFraction(k) }
    case EqualTo(l: Literal, a: AttributeReference) =>
      mcvs.get(a.name).zip(litKey(l)).map { case (m, k) => m.eqFraction(k) }
    // IN-list: the sum of the members' equality fractions (distinct
    // values are disjoint events), capped at 1 — costable only when
    // EVERY member is a literal the MCV stat can key.
    case org.apache.spark.sql.catalyst.expressions.In(a: AttributeReference, list)
        if list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
      mcvs.get(a.name).flatMap { m =>
        val keys = list.map(l => litKey(l.asInstanceOf[Literal]))
        if (keys.exists(_.isEmpty)) None
        else Some(math.min(1.0, keys.flatten.distinct.map(m.eqFraction).sum))
      }
    case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
      hists.get(a.name).zip(num(l)).map { case (h, v) => h.geFraction(v) }
    case GreaterThan(a: AttributeReference, l: Literal) =>
      hists.get(a.name).zip(num(l)).map { case (h, v) => h.geFraction(v) }
    case LessThan(a: AttributeReference, l: Literal) =>
      hists.get(a.name).zip(num(l)).map { case (h, v) => 1.0 - h.geFraction(v) }
    case LessThanOrEqual(a: AttributeReference, l: Literal) =>
      hists.get(a.name).zip(num(l)).map { case (h, v) => 1.0 - h.geFraction(v) }
    case _ => None
  }
}
