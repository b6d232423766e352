package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Cast, Coalesce, EqualTo, Expression, KnownNotNull, Literal, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DataType

/** Materialized-view (rollup) rewrite — aggregate navigation: an
  * aggregate query over a base table is answered from a STORED rollup
  * whenever the rollup subsumes it — grouping keys a subset of the
  * rollup's dimensions, filters touching dimensions only, and every
  * aggregate foldable from the stored partials (SUM from partial sums,
  * COUNT(*) from partial counts via SUM, MIN/MAX from partial
  * MIN/MAX). At 100 TB this is the difference between scanning the
  * fact table and reading a dimension-cardinality-sized artifact the
  * ingest pipeline already maintains; the rewrite gives it to every
  * query WITHOUT the query knowing the rollup exists — the same
  * serving seam as the stats catalog (collect once, answer from KBs),
  * one level up: not the plan, the data.
  *
  * Output-identical by construction: the rewritten Aggregate re-emits
  * the ORIGINAL output attribute ids (aliases reconstructed with the
  * original exprIds, original scalar wrappers like the final
  * cast-to-double kept around the swapped aggregate call), and every
  * swap is checked type-equal before it is accepted — a rollup whose
  * measure widths drift from the query's produces a clean bail, never
  * a changed result type. COUNT folds through
  * `KnownNotNull(coalesce(sum(cnt), 0))` so the empty-input global
  * aggregate keeps COUNT's value (0, not null) and non-null type.
  *
  * Bails whole-query on anything it cannot PROVE subsumed: an
  * aggregate over a non-measure column, DISTINCT or FILTER clauses, a
  * predicate touching a non-dimension column, a grouping expression
  * that is not a plain dimension attribute, a base scan it cannot
  * name. Idempotent: the rewritten query scans the rollup, whose
  * relation no longer names the base table.
  */
final case class MvRewriteRule(
    mvs: Seq[MvDef],
    stats: CatalogRules.CatalogStats = CatalogRules.CatalogStats(Map.empty))
    extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg @ Aggregate(ge, ae, child, None) =>
      mvs.view.flatMap(rewrite(agg, ge, ae, child, _)).headOption.getOrElse(agg)
  }

  /** Strip pruning Projects and collect Filter conjuncts down to the
    * base scan. */
  @scala.annotation.tailrec
  private def collectScan(
      p: LogicalPlan,
      filters: Seq[Expression]): Option[(Seq[Expression], LogicalPlan)] =
    p match {
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        collectScan(c, filters)
      case Filter(cond, c) =>
        collectScan(c, filters ++ splitConjunctivePredicates(cond))
      case leaf => Some((filters, leaf))
    }

  /** The dim side of a join-shaped match: its (reused-verbatim) plan,
    * its join-key attribute, and the BASE column the rollup carries the
    * key under. */
  private case class DimSide(plan: LogicalPlan, dimKey: AttributeReference,
      baseKeyName: String)

  private def rewrite(
      agg: Aggregate,
      ge: Seq[Expression],
      ae: Seq[NamedExpression],
      child: LogicalPlan,
      mv: MvDef): Option[LogicalPlan] = {
    val (topFilters, leaf) = collectScan(child, Nil).get
    val mvOut = mv.mvPlan.output
    def mvAttr(name: String): Option[Attribute] = mvOut.find(_.name == name)
    // A rollup whose declared columns are missing from its own plan is a
    // broken MvDef, not a non-subsumed query.
    if (!mv.dims.values.forall(mvAttr(_).isDefined)) return None

    // Shape: the base scan alone, or base JOIN dim on a rollup-carried
    // key whose uniqueness on the dim side the STATS CATALOG proves
    // (ndv == rows ⇒ each rollup cell matches at most one dim row, so
    // partials pass through the join unchanged — the FK-join form of
    // aggregate navigation). Without the proof, or with the key not a
    // rollup dimension, the join shape bails.
    //
    // TRUST BOUNDARY: unlike every other check here (structural, on
    // the plan itself), the uniqueness proof is only as sound as the
    // catalog. It must come from EXACT counts (StatsPhases' ANALYZE
    // artifact) — an approximate catalog (q248's HLL ndv) can satisfy
    // ndv == rows by estimation error, and a duplicate dim key would
    // then double partials. Same trust class as a declared FK/PK
    // constraint in a warehouse; exact-count catalogs make it sound.
    val (baseFilters, aboveFilters, dimOpt) = leaf match {
      case scan if CatalogRules.tableOf(scan).contains(mv.baseTable) =>
        (topFilters, Nil: Seq[Expression], None)
      case Join(l, r, Inner, Some(c: EqualTo), JoinHint(None, None)) =>
        val (lf, ls) = collectScan(l, Nil).get
        val (rf, rs) = collectScan(r, Nil).get
        val lBase = CatalogRules.tableOf(ls).contains(mv.baseTable)
        val rBase = CatalogRules.tableOf(rs).contains(mv.baseTable)
        if (lBase == rBase) return None // both or neither: not this shape
        val (bSide, bFilters, dSide, dScan) =
          if (lBase) (l, lf, r, rs) else (r, rf, l, ls)
        val dimTable = CatalogRules.tableOf(dScan).getOrElse(return None)
        val (bk, dk) = (c.left, c.right) match {
          case (x: AttributeReference, y: AttributeReference) =>
            if (bSide.outputSet.contains(x) && dSide.outputSet.contains(y)) (x, y)
            else if (bSide.outputSet.contains(y) && dSide.outputSet.contains(x)) (y, x)
            else return None
          case _ => return None
        }
        if (!mv.dims.contains(bk.name)) return None
        val provenUnique = (stats.rows(dimTable), stats.ndv(dimTable, dk.name)) match {
          case (Some(n), Some(d)) => n == d
          case _ => false
        }
        if (!provenUnique) return None
        (bFilters, topFilters, Some(DimSide(dSide, dk, bk.name)))
      case _ => return None
    }
    val dimOut = dimOpt.map(_.plan.outputSet)
      .getOrElse(org.apache.spark.sql.catalyst.expressions.AttributeSet.empty)
    val allowed = mv.mvPlan.outputSet ++ dimOut
    def isBaseDim(a: Attribute): Boolean =
      !dimOut.contains(a) && mv.dims.contains(a.name)

    // Remap BASE dimension attributes onto the rollup; dim-side
    // attributes survive verbatim (their subtree is reused).
    def remap(e: Expression): Expression = e.transform {
      case a: AttributeReference if isBaseDim(a) => mvAttr(mv.dims(a.name)).get
    }
    // Base-side filters must be base-dim-only (they commute with the
    // rollup's group-by); filters above the join may mix base dims and
    // dim-side columns.
    val mvBaseFilters = baseFilters.map { f =>
      if (!f.references.forall(a => isBaseDim(a))) return None
      remap(f)
    }
    val mvAboveFilters = aboveFilters.map { f =>
      if (!f.references.forall(a => dimOut.contains(a) || isBaseDim(a))) return None
      remap(f)
    }

    // Aggregate list: base grouping attrs re-emitted from the rollup
    // under their ORIGINAL exprIds, dim-side attrs kept verbatim,
    // aggregate calls swapped measure-for-partial with the scalar
    // wrapping (casts etc.) kept.
    val newAe: Seq[NamedExpression] = ae.map {
      case a: AttributeReference if dimOut.contains(a) => a
      case a: AttributeReference if isBaseDim(a) =>
        Alias(mvAttr(mv.dims(a.name)).get, a.name)(exprId = a.exprId)
      case al @ Alias(a: AttributeReference, _) if dimOut.contains(a) => al
      case al @ Alias(a: AttributeReference, name) if isBaseDim(a) =>
        Alias(mvAttr(mv.dims(a.name)).get, name)(exprId = al.exprId)
      case al: Alias =>
        var ok = true
        val swapped = al.child.transform {
          // Guarded to BASE-referencing calls: transform recurses into
          // replacements, and a swapped call (now over rollup attrs)
          // must not be re-matched as if it were a query aggregate. A
          // dim-side-referencing aggregate reaches swapAggregate and is
          // refused there (no partial can fold it).
          case aggE: AggregateExpression
              if aggE.references.isEmpty ||
                !aggE.references.subsetOf(mv.mvPlan.outputSet) =>
            swapAggregate(aggE, mv, mvAttr) match {
              case Some(e) => e
              case None => ok = false; aggE
            }
        }
        if (!ok) return None
        // Everything left outside the swapped calls must already live
        // in the rollup or the reused dim subtree — a stray base
        // attribute means this alias isn't foldable from partials.
        if (!swapped.references.subsetOf(allowed)) return None
        Alias(swapped, al.name)(exprId = al.exprId)
      case _ => return None
    }

    val newGe: Seq[Expression] = ge.map {
      case a: AttributeReference if dimOut.contains(a) => a
      case a: AttributeReference if isBaseDim(a) => mvAttr(mv.dims(a.name)).get
      case _ => return None
    }

    val mvBase =
      if (mvBaseFilters.isEmpty) mv.mvPlan
      else Filter(mvBaseFilters.reduceLeft(And(_, _)), mv.mvPlan)
    val joined = dimOpt match {
      case None => mvBase
      case Some(d) =>
        Join(mvBase, d.plan, Inner,
          Some(org.apache.spark.sql.catalyst.expressions.EqualTo(
            mvAttr(mv.dims(d.baseKeyName)).get, d.dimKey)),
          JoinHint.NONE)
    }
    val newChild =
      if (mvAboveFilters.isEmpty) joined
      else Filter(mvAboveFilters.reduceLeft(And(_, _)), joined)
    Some(Aggregate(newGe, newAe, newChild, None))
  }

  /** One aggregate call folded onto the rollup's partial column. The
    * replacement must be TYPE-equal to the original or the swap is
    * refused (the caller then bails the whole query). */
  private def swapAggregate(
      aggE: AggregateExpression,
      mv: MvDef,
      mvAttr: String => Option[Attribute]): Option[Expression] = {
    if (aggE.isDistinct || aggE.filter.isDefined) return None
    def measure(func: String, src: String, cast: Option[DataType]) =
      mv.measures.find(m =>
        m.func == func && m.srcCol == src && m.castTo == cast)
        .flatMap(m => mvAttr(m.mvCol))
    val swapped: Option[Expression] = aggE.aggregateFunction match {
      case Sum(inner, _) =>
        (inner match {
          case a: AttributeReference => measure("sum", a.name, None)
          case c: Cast => c.child match {
            case a: AttributeReference => measure("sum", a.name, Some(c.dataType))
            case _ => None
          }
          case _ => None
        }).map(m => aggE.copy(aggregateFunction = Sum(m)))
      case cnt: Count if cnt.children.forall(_.foldable) =>
        measure("count", "", None).map(m =>
          KnownNotNull(Coalesce(Seq(
            aggE.copy(aggregateFunction = Sum(m)),
            Literal(0L)))))
      case Min(a: AttributeReference) =>
        measure("min", a.name, None).map(m =>
          aggE.copy(aggregateFunction = Min(m)))
      case Max(a: AttributeReference) =>
        measure("max", a.name, None).map(m =>
          aggE.copy(aggregateFunction = Max(m)))
      case _ => None
    }
    swapped.filter(_.dataType == aggE.dataType)
  }
}

/** One rollup's contract: the base table it summarizes, its dimension
  * columns (base name -> rollup name), the measures it stores, and the
  * resolved plan that reads it. `castTo` records the exact cast the
  * query applies inside SUM (the engine's DECIMAL-accumulation
  * discipline), so a sum only folds onto a partial that accumulated
  * the same way — measure identity is (function, source column, cast),
  * never just a name.
  */
final case class MvDef(
    baseTable: String,
    dims: Map[String, String],
    measures: Seq[MvMeasure],
    mvPlan: LogicalPlan)

final case class MvMeasure(
    func: String,
    srcCol: String,
    castTo: Option[DataType],
    mvCol: String)
