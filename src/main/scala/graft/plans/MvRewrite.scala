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
    case agg @ Aggregate(ge, ae,
        expand: org.apache.spark.sql.catalyst.plans.logical.Expand, None) =>
      mvs.view.flatMap(rewriteExpand(ge, ae, expand, _))
        .headOption.getOrElse(agg)
    case agg @ Aggregate(ge, ae, child, None) =>
      mvs.view.flatMap(mv => rewrite(agg, ge, ae, child, mv)
          .orElse(rewriteComputed(ge, ae, child, mv)))
        .headOption.getOrElse(agg)
  }

  /** EXPRESSION dimensions — time-bucketed (and other computed-key)
    * rollups, the most common materialized view in practice: the query
    * groups by an EXPRESSION over base columns (Catalyst pulls it into
    * a computed Project below the Aggregate, and the loader itself may
    * add computed normalization columns, e.g. the engine's int64-ns
    * event-time seam), and the rollup stores the bucket as a plain
    * column. Attributes resolve back to leaf-level expressions through
    * the collected alias definitions; a grouping attribute whose
    * RESOLVED form canonicalizes equal to a declared [[MvExprDim]]
    * remaps onto the rollup's bucket column. Matching is canonical =
    * syntactic-modulo-exprIds — the standard production-MV equivalence;
    * a differently-written-but-equivalent bucket expression correctly
    * keeps the fact scan.
    *
    * Tried only after the attribute-dims path declines (a plan with no
    * computed projections never reaches here with different behavior).
    * Composes with the FK-join device (q275): the walked-to leaf may
    * be `base JOIN dim` on a rollup-carried plain-dim key proven
    * unique (Exact + counted tuple + recorded path — the q252 trust
    * boundary verbatim), the base side defs-walked on its own (the
    * loader's computed normalization lives below the join); partials
    * pass through the join unchanged for the single-join reason, so an
    * hourly-report-by-entity reads (bucket x fk) cells joined to the
    * live dim — the fact scan is gone and dim attributes stay
    * un-denormalized. Also matches declared ALTERNATE spellings of a
    * bucket dimension (q276, [[MvAltDim]]): `date_trunc('hour', …)` is
    * a bijection of the floorDiv hour bucket, so the same cells serve
    * it with the grouping value rebuilt per cell.
    *
    * Bails on: any filter whose RESOLVED form touches a non-plain-dim
    * column (a raw-timestamp predicate does not commute with bucket
    * grain unless bucket-aligned, which this rule does not prove), any
    * aggregate whose resolved inputs are not verbatim leaf columns,
    * non-deterministic anything, and every refusal the flat path has.
    */
  private def rewriteComputed(
      ge: Seq[Expression],
      ae: Seq[NamedExpression],
      child: LogicalPlan,
      mv: MvDef): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeSet, ExprId}
    if (mv.exprDims.isEmpty) return None
    if (ge.exists(!_.deterministic) || ae.exists(!_.deterministic)) return None
    val mvOut = mv.mvPlan.output
    def mvAttr(name: String): Option[Attribute] = mvOut.find(_.name == name)
    if (!mv.dims.values.forall(mvAttr(_).isDefined)) return None
    if (!mv.exprDims.forall(d => mvAttr(d.mvCol).isDefined)) return None

    // Defs-aware walk to the leaf; the leaf is the raw base relation
    // (flat shape) or — q275, the computed shape COMPOSED with the
    // q252/q270 join device — base JOIN dim on a rollup-carried key
    // proven unique, where the base side gets its OWN defs walk (the
    // loader's computed normalization lives below the join).
    val (filters0, leaf0, defs0) =
      MvRewriteRule.collectDefs(child, Nil, Map.empty)
    val (leaf, factFilters, midFilters, defs, steps) = leaf0 match {
      case scan if MvRewriteRule.baseMatches(mv, scan) =>
        (scan, Nil: Seq[Expression], Nil: Seq[Expression], defs0,
          Nil: List[ChainDim])
      case j: Join =>
        // the proven CHAIN (q280), defs-walked: the loader's computed
        // normalization lives below the join, so chain keys resolve to
        // leaf form before the rollup-dimension check
        val (bScan, bf, mid, st, bDefs) =
          peelChain(j, mv, 0, defsWalk = true).getOrElse(return None)
        if (st.isEmpty) return None
        (bScan, bf, mid, defs0 ++ bDefs, st)
      case _ => return None
    }
    val leafOut = leaf.outputSet
    val dimOut = steps.map(_.plan.outputSet)
      .foldLeft(AttributeSet.empty)(_ ++ _)
    val allowed = mv.mvPlan.outputSet ++ dimOut
    def res(e: Expression): Expression = MvRewriteRule.resolve(e, defs)

    // Grouping attrs -> expressions over the rollup (or the verbatim
    // dim subtree): dim-side attrs pass through the rejoin; plain leaf
    // dims remap by name; computed expressions match a declared
    // exprDim canonical — or one of its declared ALTERNATE spellings
    // (q276), whose value is rebuilt per cell from the bucket column
    // (type-checked: the rebuilt expression must restore the query's
    // exact grouping type).
    val dimMap = scala.collection.mutable.Map.empty[ExprId, Expression]
    ge.foreach {
      case a: AttributeReference if dimOut.contains(a) => // verbatim
      case a: AttributeReference =>
        res(a) match {
          case b: AttributeReference
              if leafOut.contains(b) && mv.dims.contains(b.name) =>
            dimMap(a.exprId) = mvAttr(mv.dims(b.name)).get
          case computed =>
            val canon = MvRewriteRule.canonicalKey(computed)
            mv.exprDims.find(_.canonical == canon) match {
              case Some(d) => dimMap(a.exprId) = mvAttr(d.mvCol).get
              case None =>
                val alt = mv.exprDims.iterator.flatMap(d =>
                  d.alts.collect {
                    case al if al.canonical == canon =>
                      MvAltRebuild.expr(al.rebuild, mvAttr(d.mvCol).get)
                  }).nextOption()
                // nullability-normalized on both sides: the rebuilt
                // value's field nullability follows the stored
                // column's, which may differ benignly from the query
                // expression's inferred one (a struct's knownnullable
                // wrappers etc.); names and types must still match
                // exactly
                alt.filter(e =>
                  MvRewriteRule.nullNormalized(e.dataType) ==
                    MvRewriteRule.nullNormalized(computed.dataType)) match {
                  case Some(e) => dimMap(a.exprId) = e
                  case None => return None
                }
            }
        }
      case _ => return None
    }

    // Filters: fact-side conjuncts (below the join, or everything in
    // the flat shape) must map provably — plain dims, expression-dim
    // comparisons, or bucket-ALIGNED source ranges (the
    // mapComputedFilter classes) — after dropping the optimizer's
    // inferred null guards where a sibling comparison implies them.
    // Above-join conjuncts may also mix dim-side columns, kept
    // verbatim with base references remapped as plain dims. Anything
    // else bails the whole query.
    def mapOne(f: Expression): Option[Expression] =
      if (dimOut.isEmpty || !f.references.exists(dimOut.contains))
        mapComputedFilter(f, mv, mvAttr, leafOut)
      else if (!f.deterministic) None
      else if (!f.references.forall(a => dimOut.contains(a) ||
          (leafOut.contains(a) && mv.dims.contains(a.name)))) None
      else Some(f.transform {
        case a: AttributeReference if !dimOut.contains(a) =>
          mvAttr(mv.dims(a.name)).get
      })
    val mvAboveFilters =
      dropImpliedNullGuards((filters0 ++ midFilters).map(res))
        .map(f => mapOne(f).getOrElse(return None))
    val mvFactFilters = dropImpliedNullGuards(factFilters.map(res)).map { f =>
      mapComputedFilter(f, mv, mvAttr, leafOut).getOrElse(return None)
    }

    // Aggregate list: dim-side attrs verbatim, grouping attrs
    // re-emitted under their original ids, calls swapped
    // measure-for-partial on their RESOLVED form — with the guard that
    // a matched source column is a VERBATIM leaf column (a computed
    // alias sharing a base column's name must never match its
    // measure). A dim-side-referencing aggregate reaches swapAggregate
    // and is refused there (no partial can fold it).
    val newAe: Seq[NamedExpression] = ae.map {
      case a: AttributeReference if dimOut.contains(a) => a
      case a: AttributeReference if dimMap.contains(a.exprId) =>
        Alias(dimMap(a.exprId), a.name)(exprId = a.exprId)
      case al @ Alias(a: AttributeReference, _) if dimOut.contains(a) => al
      case al @ Alias(a: AttributeReference, name) if dimMap.contains(a.exprId) =>
        Alias(dimMap(a.exprId), name)(exprId = al.exprId)
      case al: Alias =>
        var ok = true
        // Scalars over GROUPING dimensions survive project-collapse
        // (e.g. the unix_micros edge cast folded into the aggregate
        // list): pre-map dimMap'd attributes onto their rollup
        // expressions BEFORE resolution, so only genuinely-unmapped
        // references reach the leaf checks below. NEVER inside an
        // aggregate call: count(<grouping attr>) pre-mapped to an mv
        // expression would dodge the swap guard and silently aggregate
        // CELLS instead of rows — agg inputs stay raw, resolve to leaf
        // form, and either match a stored measure or refuse.
        def preMap(e: Expression): Expression = e match {
          case aggE: AggregateExpression => aggE
          case a: AttributeReference if dimMap.contains(a.exprId) =>
            dimMap(a.exprId)
          case other => other.mapChildren(preMap)
        }
        val resolved = res(preMap(al.child))
        if (resolved.collectFirst {
            case a: AttributeReference
                if !leafOut.contains(a) && !dimOut.contains(a) &&
                  !mv.mvPlan.outputSet.contains(a) => a
          }.isDefined) return None // something neither leaf/dim nor inlined
        val swapped = resolved.transform {
          case aggE: AggregateExpression
              if aggE.references.isEmpty ||
                !aggE.references.subsetOf(mv.mvPlan.outputSet) =>
            swapAggregate(aggE, mv, mvAttr) match {
              case Some(e) => e
              case None => ok = false; aggE
            }
        }
        if (!ok) return None
        if (!swapped.references.subsetOf(allowed)) return None
        Alias(swapped, al.name)(exprId = al.exprId)
      case _ => return None
    }
    val newGe: Seq[Expression] = ge.map {
      case a: AttributeReference if dimOut.contains(a) => a
      case a: AttributeReference => dimMap(a.exprId)
    }
    val mvBase =
      if (mvFactFilters.isEmpty) mv.mvPlan
      else Filter(mvFactFilters.reduceLeft(And(_, _)), mv.mvPlan)
    val joined = rejoinChain(mvBase, steps, mv, mvAttr)
    val newChild =
      if (mvAboveFilters.isEmpty) joined
      else Filter(mvAboveFilters.reduceLeft(And(_, _)), joined)
    Some(Aggregate(newGe, newAe, newChild, None))
  }

  /** Attributes reachable from `e` through an unbroken chain of
    * null-intolerant nodes — a null in any of them nulls the whole
    * expression (the same walk Catalyst's own constraint inference
    * uses to ADD isnotnull guards from comparisons). */
  private def nullIntolerantAttrs(e: Expression): Set[Attribute] = e match {
    case a: Attribute => Set(a)
    case _ if e.nullIntolerant =>
      e.children.flatMap(nullIntolerantAttrs).toSet
    case _ => Set.empty
  }

  /** Drop IsNotNull conjuncts IMPLIED by a sibling null-rejecting
    * comparison over the same attribute: InferFiltersFromConstraints
    * derives exactly such guards FROM the comparisons (a comparison
    * whose operand is null-intolerant in `a` already drops every
    * null-`a` row, so `isnotnull(a) AND cmp == cmp`). The guard itself
    * — typically over the bucket source's raw leaf column, not a dim —
    * is not a provable cell predicate, so keeping it would needlessly
    * bail the whole rewrite. EqualNullSafe is NOT null-rejecting and
    * never implies a guard. */
  private def dropImpliedNullGuards(fs: Seq[Expression]): Seq[Expression] = {
    import org.apache.spark.sql.catalyst.expressions.{BinaryComparison, EqualNullSafe, IsNotNull}
    fs.filter {
      case IsNotNull(a: Attribute) =>
        !fs.exists {
          case _: EqualNullSafe => false
          case c: BinaryComparison => nullIntolerantAttrs(c).contains(a)
          case _ => false
        }
      case _ => true
    }
  }

  /** Map one RESOLVED filter conjunct onto the rollup, or None when it
    * cannot be PROVEN to commute with the rollup grain. Three provable
    * classes, tried in order:
    *
    *  1. plain-dim-only: references are all leaf columns the rollup
    *     stores as dimensions — remap attribute-for-column (commutes
    *     because the rollup groups by exactly those values).
    *  2. a comparison between a declared EXPRESSION dimension (by
    *     canonical match) and a literal — the stored column holds the
    *     expression's value per cell, so the predicate transfers
    *     verbatim, any comparison operator.
    *  3. a bucket-ALIGNED range on a declared bucket's SOURCE:
    *     floorDiv(src, w) is monotone with floorDiv(k*w, w) == k, so
    *       src >= k*w  <=>  bucket >= k     src < k*w  <=>  bucket < k
    *     EXACTLY when the literal is a multiple of the width; `>`/`<=`
    *     normalize through +1 on the integral source (src > v <=>
    *     src >= v+1). A misaligned literal selects PART of a bucket —
    *     unprovable from cells — and correctly bails the whole query.
    */
  private def mapComputedFilter(
      f: Expression,
      mv: MvDef,
      mvAttr: String => Option[Attribute],
      leafOut: org.apache.spark.sql.catalyst.expressions.AttributeSet)
      : Option[Expression] = {
    import org.apache.spark.sql.catalyst.expressions.{BinaryComparison, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
    import org.apache.spark.sql.types.LongType
    if (!f.deterministic) return None
    if (f.references.forall(a =>
        leafOut.contains(a) && mv.dims.contains(a.name)))
      return Some(f.transform {
        case a: AttributeReference => mvAttr(mv.dims(a.name)).get
      })
    def exprDimCol(e: Expression): Option[Attribute] = {
      val canon = MvRewriteRule.canonicalKey(e)
      mv.exprDims.find(_.canonical == canon)
        .flatMap(d => mvAttr(d.mvCol)).filter(_.dataType == e.dataType)
    }
    def bucketCol(e: Expression): Option[(Attribute, Long)] =
      if (e.dataType != LongType) None
      else {
        val canon = MvRewriteRule.canonicalKey(e)
        mv.exprDims.iterator.flatMap(d => d.bucket
            .filter(b => b.srcCanonical == canon && b.width > 0)
            .flatMap(b => mvAttr(d.mvCol).filter(_.dataType == LongType)
              .map(_ -> b.width)))
          .nextOption()
      }
    def longLit(l: Literal): Option[Long] = l.value match {
      case i: java.lang.Integer => Some(i.toLong)
      case j: java.lang.Long => Some(j)
      case s: java.lang.Short => Some(s.toLong)
      case b: java.lang.Byte => Some(b.toLong)
      case _ => None
    }
    def aligned(v: Long, w: Long): Option[Long] =
      if (v % w == 0) Some(v / w) else None
    def succ(v: Long): Option[Long] =
      if (v == Long.MaxValue) None else Some(v + 1)
    def ge(e: Expression, v: Long): Option[Expression] =
      bucketCol(e).flatMap { case (c, w) =>
        aligned(v, w).map(k => GreaterThanOrEqual(c, Literal(k)))
      }
    def lt(e: Expression, v: Long): Option[Expression] =
      bucketCol(e).flatMap { case (c, w) =>
        aligned(v, w).map(k => LessThan(c, Literal(k)))
      }
    f match {
      // class 2: predicate directly on the bucket expression
      case cmp @ BinaryComparison(e, l: Literal) if exprDimCol(e).isDefined =>
        Some(cmp.withNewChildren(Seq(exprDimCol(e).get, l)))
      case cmp @ BinaryComparison(l: Literal, e) if exprDimCol(e).isDefined =>
        Some(cmp.withNewChildren(Seq(l, exprDimCol(e).get)))
      // class 3: aligned ranges on the bucket's source (both literal
      // orientations; >/<= normalized through +1 first)
      case GreaterThanOrEqual(e, l: Literal) =>
        longLit(l).flatMap(ge(e, _))
      case GreaterThan(e, l: Literal) =>
        longLit(l).flatMap(succ).flatMap(ge(e, _))
      case LessThan(e, l: Literal) =>
        longLit(l).flatMap(lt(e, _))
      case LessThanOrEqual(e, l: Literal) =>
        longLit(l).flatMap(succ).flatMap(lt(e, _))
      case GreaterThanOrEqual(l: Literal, e) => // v >= src  <=>  src <= v
        longLit(l).flatMap(succ).flatMap(lt(e, _))
      case GreaterThan(l: Literal, e) =>       // v > src   <=>  src < v
        longLit(l).flatMap(lt(e, _))
      case LessThan(l: Literal, e) =>          // v < src   <=>  src > v
        longLit(l).flatMap(succ).flatMap(ge(e, _))
      case LessThanOrEqual(l: Literal, e) =>   // v <= src  <=>  src >= v
        longLit(l).flatMap(ge(e, _))
      // class 4: a null guard on the bucket's SOURCE — or a declared
      // total equivalent (MvAltDim.guards: the isnotnull conjuncts
      // Spark's TimeWindow injects) — maps to a null guard on the
      // bucket column: the bucket chain is null-intolerant and total
      // over its source, so the two reject exactly the same rows (and
      // the cells' null-bucket cell, which aggregates exactly the
      // null-source rows).
      case org.apache.spark.sql.catalyst.expressions.IsNotNull(e) =>
        val canon = MvRewriteRule.canonicalKey(e)
        mv.exprDims.iterator.flatMap { d =>
          d.bucket.filter(b => b.srcCanonical == canon ||
              d.alts.exists(_.guards.contains(canon)))
            .flatMap(_ => mvAttr(d.mvCol))
        }.nextOption().map(
          org.apache.spark.sql.catalyst.expressions.IsNotNull(_))
      case _ => None
    }
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

  /** One peeled dim of a CHAINED join-shaped match (q280): its
    * (reused-verbatim) plan and key pairs oriented (chain side ->
    * dim), where the chain-side key is either a rollup dimension NAME
    * (Left — remapped onto the mv column in the rebuilt condition) or
    * an INNER dim's attribute (Right — kept verbatim: a snowflake
    * step keys off an earlier dim's column, which never needs to be a
    * rollup dimension). */
  private case class ChainDim(plan: LogicalPlan,
      keys: Seq[(Either[String, AttributeReference], AttributeReference)])

  /** The q252 uniqueness proof for one dim scan: Exact provenance, the
    * (possibly composite) key counted unique as a TUPLE, and the
    * recorded path matching the scan — a pathless Exact stat could
    * alias a same-named dim from another directory. */
  private def provenUniqueDim(
      dScan: LogicalPlan,
      dks: Seq[AttributeReference]): Boolean =
    CatalogRules.tableOf(dScan) match {
      case Some(dimTable) => stats.tables.get(dimTable) match {
        case Some(ts) =>
          ts.provenance == CatalogRules.StatProvenance.Exact &&
            // Verbatim-leaf guard (r21, the name-shadowing hole): the ndv
            // entry proves uniqueness of the LEAF column named dk.name, so
            // dk must BE that leaf output — an aliasing Project skipped by
            // collectScan/collectDefs (e.g. `n_regionkey AS n_nationkey`)
            // would otherwise pass the proof for a different, non-unique
            // column and silently duplicate partials.
            CatalogRules.verbatimLeafOutput(dScan, dks) &&
            ts.ndv.get(CatalogRules.compositeKey(dks.map(_.name)))
              .contains(ts.rows) &&
            ts.path.exists(p => CatalogRules.scanPath(dScan).contains(p))
        case None => false
      }
      case None => false
    }

  /** Peel a join CHAIN toward `mv`'s base scan (q280 — shared by the
    * flat, Expand, and COMPUTED shapes): at each level one side
    * continues toward the base and the other is that step's dim, whose
    * chain-side key is a rollup dimension (Left) or an inner dim's
    * column (Right — the snowflake arm). Every step carries its own
    * [[provenUniqueDim]] proof; one unproven dim fails the whole peel.
    * A dim that itself base-matches refuses (the ambiguous self-join
    * shape). `defsWalk` selects the side walk: attr-only (the flat
    * shapes) or defs-collecting (the computed shape, whose loader
    * normalization lives below the join — a chain key then RESOLVES
    * through the collected defs to its leaf column before the
    * rollup-dimension check). Returns (base scan, filters under the
    * base, filters at the join levels, steps inner-to-outer, the
    * chain side's accumulated defs). */
  private def peelChain(
      plan: LogicalPlan,
      mv: MvDef,
      depth: Int,
      defsWalk: Boolean = false)
      : Option[(LogicalPlan, Seq[Expression], Seq[Expression],
          List[ChainDim],
          Map[org.apache.spark.sql.catalyst.expressions.ExprId, Expression])] = {
    import org.apache.spark.sql.catalyst.expressions.AttributeSet
    if (depth > 8) return None
    val (fs, scan, levelDefs) =
      if (defsWalk) MvRewriteRule.collectDefs(plan, Nil, Map.empty)
      else {
        val (f, s) = collectScan(plan, Nil).get
        (f, s, Map.empty[
          org.apache.spark.sql.catalyst.expressions.ExprId, Expression])
      }
    scan match {
      case s if MvRewriteRule.baseMatches(mv, s) =>
        Some((s, fs, Nil, Nil, levelDefs))
      case Join(l, r, Inner, Some(c), JoinHint(None, None))
          if splitConjunctivePredicates(c).forall(_.isInstanceOf[EqualTo]) =>
        def attempt(chainSide: LogicalPlan, dimSide: LogicalPlan)
            : Option[(LogicalPlan, Seq[Expression], Seq[Expression],
                List[ChainDim],
                Map[org.apache.spark.sql.catalyst.expressions.ExprId,
                  Expression])] = {
          val dScan =
            if (defsWalk) MvRewriteRule.collectDefs(dimSide, Nil, Map.empty)._2
            else collectScan(dimSide, Nil).get._2
          if (MvRewriteRule.baseMatches(mv, dScan)) return None
          peelChain(chainSide, mv, depth + 1, defsWalk).flatMap {
            case (bScan, bf, mid, inner, innerDefs) =>
              val allDefs = levelDefs ++ innerDefs
              val innerDimOut = inner.map(_.plan.outputSet)
                .foldLeft(AttributeSet.empty)(_ ++ _)
              val keys = splitConjunctivePredicates(c).map {
                case EqualTo(x: AttributeReference, y: AttributeReference) =>
                  val oriented =
                    if (chainSide.outputSet.contains(x) &&
                        dimSide.outputSet.contains(y)) Some((x, y))
                    else if (chainSide.outputSet.contains(y) &&
                        dimSide.outputSet.contains(x)) Some((y, x))
                    else None
                  oriented.flatMap { case (ck, dk) =>
                    if (innerDimOut.contains(ck))
                      Some((Right(ck): Either[String, AttributeReference], dk))
                    else MvRewriteRule.resolve(ck, allDefs) match {
                      case b: AttributeReference
                          if bScan.outputSet.contains(b) &&
                            mv.dims.contains(b.name) =>
                        Some((Left(b.name)
                          : Either[String, AttributeReference], dk))
                      case _ => None
                    }
                  }
                case _ => None
              }
              if (keys.exists(_.isEmpty)) None
              else {
                val ks = keys.map(_.get)
                if (!provenUniqueDim(dScan, ks.map(_._2))) None
                else Some((bScan, bf, mid ++ fs,
                  inner :+ ChainDim(dimSide, ks), allDefs))
              }
          }
        }
        attempt(l, r).orElse(attempt(r, l))
      case _ => None
    }
  }

  /** Rebuild the peeled chain over the rollup, innermost dim first:
    * rollup-dimension keys remap onto the mv columns; snowflake keys
    * ride verbatim (their dim's subtree is already below in the
    * fold). */
  private def rejoinChain(
      base: LogicalPlan,
      steps: Seq[ChainDim],
      mv: MvDef,
      mvAttr: String => Option[Attribute]): LogicalPlan =
    steps.foldLeft(base) { (acc, d) =>
      Join(acc, d.plan, Inner,
        Some(d.keys.map {
          case (Left(bkName), dk) =>
            org.apache.spark.sql.catalyst.expressions.EqualTo(
              mvAttr(mv.dims(bkName)).get, dk): Expression
          case (Right(innerAttr), dk) =>
            org.apache.spark.sql.catalyst.expressions.EqualTo(
              innerAttr, dk): Expression
        }.reduceLeft(And(_, _))),
        JoinHint.NONE)
    }

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
    // Non-determinism anywhere in the query breaks the rewrite's
    // output-identical contract outright: a rand()-style filter has NO
    // attribute references, so it vacuously passes the dim-only
    // reference checks below and would be remapped onto the rollup —
    // filtering rollup CELLS instead of base ROWS. Same for a
    // non-deterministic aggregate or grouping expression: partials
    // cannot reproduce a per-row draw. Mirrors Catalyst's own
    // pushdown guards: deterministic-only, bail otherwise.
    if (ge.exists(!_.deterministic) || ae.exists(!_.deterministic)) return None
    def baseMatches(scan: LogicalPlan): Boolean =
      MvRewriteRule.baseMatches(mv, scan)

    // Shape: the base scan alone, or base JOIN dim on a rollup-carried
    // key whose uniqueness on the dim side the STATS CATALOG proves
    // (ndv == rows ⇒ each rollup cell matches at most one dim row, so
    // partials pass through the join unchanged — the FK-join form of
    // aggregate navigation). Without the proof, or with the key not a
    // rollup dimension, the join shape bails.
    //
    // TRUST BOUNDARY — enforced in types, not prose: the uniqueness
    // proof accepts only a TableStat whose provenance is Exact
    // (StatsPhases' counting ANALYZE). An approximate catalog (q248's
    // HLL ndv) can satisfy ndv == rows by estimation error, and a
    // duplicate dim key would then double partials; Approx is the
    // TableStat DEFAULT, so a collector that forgets to claim its
    // grade loses the rewrite, never the result. When the stat also
    // records the dim table's path, the scanned dim must live there —
    // a same-named dim from another directory proves nothing about
    // THIS plan's rows (MvRewriteSpec pins both refusals).
    // Peel the join CHAIN (q280 — base JOIN dim1 JOIN dim2 …, each dim
    // proven unique, one unproven dim stands the whole rewrite down):
    // partials pass through EVERY step unchanged for the single-join
    // reason, applied per step ([[peelChain]]).
    val (baseFilters, aboveFilters, steps) = leaf match {
      case scan if baseMatches(scan) =>
        (topFilters, Nil: Seq[Expression], Nil: List[ChainDim])
      case j: Join =>
        val (_, bf, mid, st, _) = peelChain(j, mv, 0).getOrElse(return None)
        if (st.isEmpty) return None
        (bf, mid ++ topFilters, st)
      case _ => return None
    }
    val dimOut = steps.map(_.plan.outputSet)
      .foldLeft(
        org.apache.spark.sql.catalyst.expressions.AttributeSet.empty)(_ ++ _)
    val allowed = mv.mvPlan.outputSet ++ dimOut
    def isBaseDim(a: Attribute): Boolean =
      !dimOut.contains(a) && mv.dims.contains(a.name)

    // Remap BASE dimension attributes onto the rollup; dim-side
    // attributes survive verbatim (their subtree is reused).
    def remap(e: Expression): Expression = e.transform {
      case a: AttributeReference if isBaseDim(a) => mvAttr(mv.dims(a.name)).get
    }
    // Base-side filters must be DETERMINISTIC and base-dim-only (they
    // then commute with the rollup's group-by); filters above the join
    // may mix base dims and dim-side columns. The determinism check is
    // load-bearing, not hygiene: rand() < 0.01 has no references, so
    // the dim-only check alone passes it vacuously — remapped onto the
    // rollup it would sample CELLS instead of ROWS.
    val mvBaseFilters = baseFilters.map { f =>
      if (!f.deterministic) return None
      if (!f.references.forall(a => isBaseDim(a))) return None
      remap(f)
    }
    val mvAboveFilters = aboveFilters.map { f =>
      if (!f.deterministic) return None
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
    val joined = rejoinChain(mvBase, steps, mv, mvAttr)
    val newChild =
      if (mvAboveFilters.isEmpty) joined
      else Filter(mvAboveFilters.reduceLeft(And(_, _)), joined)
    Some(Aggregate(newGe, newAe, newChild, None))
  }

  /** GROUPING SETS / ROLLUP / CUBE navigation — the Expand shape:
    * Catalyst plans `GROUP BY ROLLUP(a, b)` as
    * `Aggregate(a', b', gid, Expand(projections, output, scan))` where
    * the Expand emits one copy of each row per grouping set (dims
    * re-aliased to FRESH attributes, nulled per set, plus a gid
    * literal) and MEASURE columns pass through verbatim. The rollup
    * substitutes at the scan exactly as in the flat shape — aggregate
    * calls swap measure-for-partial, and the Expand's pass-through
    * slots carry the needed PARTIAL columns instead of the raw
    * measures (cell counts re-sum to set totals for the same reason
    * partials fold at all). Grouping attributes and gid keep their
    * fresh exprIds, so the parent Aggregate needs no surgery beyond
    * the same call swaps. At 100 TB this answers an N-set report
    * (classically N fact scans' worth of work in one Expand) from N
    * copies of the rollup's handful of cells.
    *
    * Bails — beyond everything the flat shape refuses — when any
    * Expand slot is not exactly (a) a pass-through base attribute,
    * (b) a per-set choice between ONE base dimension and null, or
    * (c) a literal (the gid), or when a grouping expression references
    * anything but the fresh expanded attributes.
    */
  private def rewriteExpand(
      ge: Seq[Expression],
      ae: Seq[NamedExpression],
      expand: org.apache.spark.sql.catalyst.plans.logical.Expand,
      mv: MvDef): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.expressions.AttributeSet
    if (ge.exists(!_.deterministic) || ae.exists(!_.deterministic)) return None
    val mvOut = mv.mvPlan.output
    def mvAttr(name: String): Option[Attribute] = mvOut.find(_.name == name)
    if (!mv.dims.values.forall(mvAttr(_).isDefined)) return None
    // A broken/conf-declared def whose exprdims mvCol is missing must
    // stand down here exactly as rewriteComputed does — the slotDim
    // path below calls mvAttr(d.mvCol).get on a canonical match.
    if (!mv.exprDims.forall(d => mvAttr(d.mvCol).isDefined)) return None

    // Defs-aware walk (the q266 machinery): computed projections below
    // the Expand — including a computed grouping expression the rollup
    // stores as a plain bucket column, and the loader's own normalized
    // columns — resolve back to leaf form instead of blocking the
    // match. The walked-to node is then the raw base relation (flat
    // shape) or base JOIN dim on a rollup-carried key proven unique
    // (q270 — grouping sets COMPOSE with the q252 join shape: the
    // Expand multiplies (cell, dim) rows per set instead of fact rows,
    // and partials fold for the same two reasons composed — cell
    // partials re-aggregate per set, and each cell matches at most one
    // dim row so the join passes them through unchanged).
    val (filters, leaf0, defs) =
      MvRewriteRule.collectDefs(expand.child, Nil, Map.empty)
    def res(e: Expression): Expression = MvRewriteRule.resolve(e, defs)
    // The join shape under the Expand peels the same proven CHAIN as
    // the flat shape (q280): each step's q252 proof (Exact + counted —
    // possibly composite — key + path), snowflake keys verbatim,
    // mid-chain filters joining the above-filter pool.
    val (leaf, factFilters, midFilters, steps) = leaf0 match {
      case scan if MvRewriteRule.baseMatches(mv, scan) =>
        (scan, Nil: Seq[Expression], Nil: Seq[Expression],
          Nil: List[ChainDim])
      case j: Join =>
        val (bScan, bf, mid, st, _) =
          peelChain(j, mv, 0).getOrElse(return None)
        if (st.isEmpty) return None
        (bScan, bf, mid, st)
      case _ => return None
    }
    val leafOut = leaf.outputSet
    val dimOut = steps.map(_.plan.outputSet)
      .foldLeft(AttributeSet.empty)(_ ++ _)

    // Filters above the join (or all filters, flat shape): provable
    // classes only (mapComputedFilter); a conjunct mixing in dim-side
    // attributes keeps them verbatim (the dim subtree is reused) with
    // base references remapped as plain dims. Fact-side filters below
    // the join map under the same provable classes. The optimizer's
    // inferred null guards drop where a sibling comparison implies
    // them.
    def mapOne(f: Expression): Option[Expression] =
      if (dimOut.isEmpty || !f.references.exists(dimOut.contains))
        mapComputedFilter(f, mv, mvAttr, leafOut)
      else if (!f.deterministic) None
      else if (!f.references.forall(a => dimOut.contains(a) ||
          (leafOut.contains(a) && mv.dims.contains(a.name)))) None
      else Some(f.transform {
        case a: AttributeReference if !dimOut.contains(a) =>
          mvAttr(mv.dims(a.name)).get
      })
    val mvAboveFilters =
      dropImpliedNullGuards((filters ++ midFilters).map(res))
        .map(f => mapOne(f).getOrElse(return None))
    val mvFilters = dropImpliedNullGuards(factFilters).map { f =>
      mapComputedFilter(f, mv, mvAttr, leafOut).getOrElse(return None)
    }

    // Classify each Expand slot.
    val out = expand.output
    val projs = expand.projections
    if (projs.isEmpty || projs.exists(_.length != out.length)) return None
    val isPassThrough: Seq[Boolean] = out.indices.map { i =>
      out(i).isInstanceOf[AttributeReference] && projs.forall { p =>
        p(i) match {
          case a: AttributeReference => a.exprId == out(i).exprId
          case _ => false
        }
      }
    }
    // Every non-pass-through slot must mix only ONE dimension and
    // null/int literals across the sets (the expanded-dim / gid form);
    // the dimension is either a plain leaf dim (by resolved name) or a
    // computed expression matching a declared MvExprDim canonical —
    // either way it maps to one rollup column, recorded per slot.
    val freshSlots = out.indices.filterNot(isPassThrough)
    val slotDim = scala.collection.mutable.Map.empty[Int, Expression]
    freshSlots.foreach { i =>
      val dims = projs.map(_(i)).collect { case a: AttributeReference => a }
      if (dims.map(_.exprId).distinct.length > 1) return None
      dims.headOption.foreach { a =>
        if (dimOut.contains(a)) slotDim(i) = a // dim-side attr: verbatim
        else res(a) match {
          case b: AttributeReference
              if leafOut.contains(b) && mv.dims.contains(b.name) =>
            slotDim(i) = mvAttr(mv.dims(b.name)).get
          case computed =>
            val canon = MvRewriteRule.canonicalKey(computed)
            mv.exprDims.find(_.canonical == canon) match {
              case Some(d) => slotDim(i) = mvAttr(d.mvCol).get
              case None =>
                // a declared ALTERNATE spelling (q276/q279) works under
                // the Expand exactly as in the flat shape: the slot's
                // per-set value rebuilds from the bucket column (the
                // nulling literals are typed and need no surgery)
                val alt = mv.exprDims.iterator.flatMap(d =>
                  d.alts.collect {
                    case al if al.canonical == canon =>
                      MvAltRebuild.expr(al.rebuild, mvAttr(d.mvCol).get)
                  }).nextOption()
                alt.filter(e =>
                  MvRewriteRule.nullNormalized(e.dataType) ==
                    MvRewriteRule.nullNormalized(computed.dataType)) match {
                  case Some(e) => slotDim(i) = e
                  case None => return None
                }
            }
        }
      }
      projs.map(_(i)).foreach {
        case _: AttributeReference => ()
        case l: Literal => () // null per set, or the gid
        case _ => return None
      }
    }
    val freshOut = AttributeSet(freshSlots.map(out))

    // Swap the aggregate calls measure-for-partial on their RESOLVED
    // form (the flat shape's machinery); fresh expanded attributes pass
    // through. Anything that resolves to a non-leaf expression outside
    // the fresh slots is not foldable.
    val newAe: Seq[NamedExpression] = ae.map {
      case a: AttributeReference if freshOut.contains(a) => a
      case al @ Alias(a: AttributeReference, _) if freshOut.contains(a) => al
      case al: Alias =>
        var ok = true
        val resolved = al.child.transform {
          case a: AttributeReference if !freshOut.contains(a) => res(a)
        }
        if (resolved.collectFirst {
            case a: AttributeReference
                if !freshOut.contains(a) && !leafOut.contains(a) => a
          }.isDefined) return None
        val swapped = resolved.transform {
          case aggE: AggregateExpression
              if aggE.references.isEmpty ||
                !aggE.references.subsetOf(mv.mvPlan.outputSet ++ freshOut) =>
            swapAggregate(aggE, mv, mvAttr) match {
              case Some(e) => e
              case None => ok = false; aggE
            }
        }
        if (!ok) return None
        if (!swapped.references.subsetOf(mv.mvPlan.outputSet ++ freshOut))
          return None
        Alias(swapped, al.name)(exprId = al.exprId)
      case _ => return None
    }
    // Grouping must ride the fresh expanded attributes only.
    ge.foreach {
      case a: AttributeReference if freshOut.contains(a) => ()
      case _ => return None
    }

    // The rollup columns the swapped calls need become the Expand's
    // new pass-through slots (stable order for determinism).
    val needed: Seq[Attribute] = {
      val refs = AttributeSet(newAe.flatMap(_.references)) -- freshOut
      mvOut.filter(refs.contains)
    }
    if (needed.isEmpty) return None
    val freshIdx = freshSlots
    val newOutput: Seq[Attribute] = needed ++ freshIdx.map(out)
    val newProjections: Seq[Seq[Expression]] = projs.map { p =>
      (needed: Seq[Expression]) ++ freshIdx.map { i =>
        p(i) match {
          case _: AttributeReference => slotDim(i) // plain or expr dim
          case l: Literal => l
          case other => other // unreachable: slot shape checked above
        }
      }
    }
    val mvBase =
      if (mvFilters.isEmpty) mv.mvPlan
      else Filter(mvFilters.reduceLeft(And(_, _)), mv.mvPlan)
    val joined = rejoinChain(mvBase, steps, mv, mvAttr)
    val expandChild =
      if (mvAboveFilters.isEmpty) joined
      else Filter(mvAboveFilters.reduceLeft(And(_, _)), joined)
    val newExpand = org.apache.spark.sql.catalyst.plans.logical.Expand(
      newProjections, newOutput, expandChild)
    Some(Aggregate(ge, newAe, newExpand, None))
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
      // COUNT(col) — non-null count — folds onto a stored per-column
      // count partial exactly like COUNT(*) onto cnt (cell partials
      // counted non-nulls; their sum is the total; empty input keeps
      // COUNT's 0-not-null contract via the same coalesce). This is
      // also the denominator of the engine's deterministic-average
      // idiom sum(cast(x as decimal))/count(x), so AVG-shaped queries
      // fold without any Average-specific surgery — and native
      // Average(x) deliberately does NOT fold: Spark computes it as a
      // float-order-dependent double sum, which no decimal partial can
      // reproduce bit-for-bit.
      case Count(Seq(a: AttributeReference)) =>
        measure("count", a.name, None).map(m =>
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

object MvRewriteRule {
  import org.apache.spark.sql.catalyst.expressions.ExprId

  /** The base-table identity is a parquet BASENAME (tableOf), so two
    * directories' same-named tables alias; when the MvDef records the
    * rollup's true base path, a scan from any OTHER path must not be
    * answered from this rollup (wrong data, not just wrong cost).
    * The matched node must be the RAW relation itself: tableOf
    * descends through any Project, but the rewrite's dim matching is
    * by NAME, and a computed projection that shadows a dim's name
    * (e.g. `upper(l_linestatus) AS l_returnflag`) must never be
    * mistaken for the dim — callers' scan walks stop at the first
    * computed Project, so requiring a LogicalRelation here closes
    * that hole (spec-pinned); computed pipelines go through the
    * exprId-resolving [[MvRewriteRule.collectDefs]] path instead. */
  private[plans] def baseMatches(mv: MvDef, scan: LogicalPlan): Boolean =
    scan.isInstanceOf[
      org.apache.spark.sql.execution.datasources.LogicalRelation] &&
      CatalogRules.tableOf(scan).contains(mv.baseTable) &&
      mv.basePath.forall(p => CatalogRules.scanPath(scan).contains(p))

  /** Walk a Project/Filter pipeline down to its leaf, collecting filter
    * conjuncts AND the alias definitions of every COMPUTED projection
    * (Catalyst pulls complex grouping expressions into a Project below
    * the Aggregate, and loaders may add computed normalization columns
    * — e.g. the int64-ns event-time seam). Unlike the attr-only walk,
    * this one never bails on a computed Project: the defs let callers
    * RESOLVE any attribute back to its leaf-level expression. */
  private[plans] def collectDefs(
      p: LogicalPlan,
      filters: Seq[Expression],
      defs: Map[ExprId, Expression])
      : (Seq[Expression], LogicalPlan, Map[ExprId, Expression]) = p match {
    case Project(pl, c) if pl.forall(e =>
        e.isInstanceOf[AttributeReference] || e.isInstanceOf[Alias]) =>
      val d2 = defs ++ pl.collect { case a: Alias => a.exprId -> a.child }
      collectDefs(c, filters, d2)
    case Filter(cond, c) =>
      // conjuncts resolve lazily at the caller through the final defs
      collectDefs(c, filters ++ splitConj(cond), defs)
    case leaf => (filters, leaf, defs)
  }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitConj(l) ++ splitConj(r)
    case other => Seq(other)
  }

  /** Inline every computed-alias definition recursively, so the result
    * references only leaf attributes (acyclic by plan construction). */
  private[plans] def resolve(
      e: Expression, defs: Map[ExprId, Expression]): Expression =
    e.transformUp {
      case a: AttributeReference if defs.contains(a.exprId) =>
        resolve(defs(a.exprId), defs)
    }

  /** Canonical, exprId-free spelling of an expression — attribute
    * identity reduces to NAME, everything else to Catalyst's `.sql`
    * rendering. Two plans that resolve the same written expression
    * over the same leaf columns canonicalize equal, which is exactly
    * the (syntactic, like every production MV matcher) equivalence the
    * expression-dimension match needs. */
  def canonicalKey(e: Expression): String =
    e.transform {
      case a: AttributeReference =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(a.name)
    }.sql

  /** The type with every nullability flag forced true, recursively —
    * for alt-spelling type checks, where field NAMES and types must
    * match exactly but inferred nullability may differ benignly
    * between a query expression and a cell rebuild. */
  private[plans] def nullNormalized(
      dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(dataType = nullNormalized(f.dataType), nullable = true)))
      case a: ArrayType =>
        a.copy(elementType = nullNormalized(a.elementType), containsNull = true)
      case m: MapType => m.copy(keyType = nullNormalized(m.keyType),
        valueType = nullNormalized(m.valueType), valueContainsNull = true)
      case other => other
    }
  }

  /** The leaf-resolved canonicals of every IsNotNull conjunct under
    * the plan's first Aggregate — how MvPhases derives an alternate
    * spelling's declared guard set ([[MvAltDim.guards]]) from the SAME
    * probe plan its canonical comes from, so the declared guards and
    * the ones the optimizer actually injects cannot drift. */
  def filterGuardCanonicals(plan: LogicalPlan): Seq[String] =
    plan.collectFirst { case a: Aggregate =>
      val (filters, _, defs) = collectDefs(a.child, Nil, Map.empty)
      filters.collect {
        case org.apache.spark.sql.catalyst.expressions.IsNotNull(e) =>
          canonicalKey(resolve(e, defs))
      }
    }.getOrElse(Nil).distinct

  /** The canonical keys of a probe plan's computed grouping dimensions,
    * leaf-resolved — how MvPhases derives an MvExprDim's canonical from
    * the SAME machinery the rewrite matches with, so the two cannot
    * drift. Returns grouping-attr-name -> canonical. */
  def groupingCanonicals(plan: LogicalPlan): Map[String, String] =
    plan.collectFirst { case a: Aggregate =>
      val (_, _, defs) = collectDefs(a.child, Nil, Map.empty)
      a.groupingExpressions.collect {
        case at: AttributeReference if defs.contains(at.exprId) =>
          at.name -> canonicalKey(resolve(at, defs))
      }.toMap
    }.getOrElse(Map.empty)

}

/** The config-only deployment form of [[MvRewriteRule]] — the last
  * decision-layer rule to gain one, completing "enable the whole layer
  * by config": a deployment that injects `GraftExtensions` turns on
  * aggregate navigation by publishing the rollup CONTRACTS as a
  * runtime conf —
  *
  * {{{
  * spark.graft.mv.defs =
  *   "table=graft_mv_li_x;base=lineitem;basePath=/data/lineitem.parquet;dims=l_returnflag:l_returnflag,l_linestatus:l_linestatus;measures=count:::cnt~sum:l_quantity:decimal(18,4):sum_qty~min:l_quantity::min_qty"
  * spark.graft.mv.exactstats =                                    // optional
  *   "supplier:10000:path=/data/supplier.parquet:s_suppkey=10000"
  * }}}
  *
  * — defs separated by `|`; within a def, `key=value` pairs separated
  * by `;` (keys: table, base, basePath?, dims, measures); dims are
  * `base:mv` pairs joined by `,`; measures are `func:src:cast:mvCol`
  * tuples joined by `~` (src/cast empty where not applicable; cast is
  * a DDL type string). The rollup's read plan is resolved against the
  * ACTIVE session's catalog per invocation — a def naming a missing
  * table fails the query loudly, like every malformed graft conf.
  *
  * `spark.graft.mv.exactstats` (the join-order grammar plus an
  * optional `path=` field) is the DECLARED-CONSTRAINT trust channel:
  * entries are tagged [[CatalogRules.StatProvenance.Exact]], which is
  * what entitles the FK-join rewrite's uniqueness proof to fire.
  * Publishing it is the same act — and the same responsibility — as
  * declaring a PRIMARY KEY to a warehouse: the engine enforces
  * everything it can structurally, and trusts exactly what the
  * deployer declared. The declaration must say WHICH table it is
  * about: proofs require the `path=` field to match the scanned dim's
  * root (table identity is otherwise a parquet basename, and dir A's
  * declared PK must never vouch for dir B's same-named table) — a
  * pathless entry parses but can never fire a proof. Without the
  * conf, join-shaped rewrites stand down (the fail-safe Approx
  * default).
  */
object ConfMvRewriteRule extends Rule[LogicalPlan] {
  val DefsConf = "spark.graft.mv.defs"
  val ExactConf = "spark.graft.mv.exactstats"

  /** Resolved-defs cache: parsing the conf string is cheap, but
    * resolving every rollup's READ PLAN (tableExists + analysis + file
    * listing) per optimizer invocation is not — and fixed-point batches
    * invoke a rule several times per query. Keyed by the SESSION
    * OBJECT through a weak identity map (r19 ADVICE: an
    * identityHashCode string can collide with a GC'd session and serve
    * MvDefs resolved against the dead one), then by (spec, each named
    * table's catalog createTime + storage-location mtime): a changed
    * conf, a new session, a dropped-and-recreated rollup (saveAsTable
    * stamps a fresh createTime), or an in-place INSERT OVERWRITE (same
    * createTime, new directory mtime — the stale-file-listing case)
    * all miss and re-resolve — keeping the loud failure on first
    * resolution — while steady-state planning reuses the resolved
    * plans. Bounded per session: cleared wholesale past a small size
    * (stale versions of one key otherwise accumulate forever). The
    * weak key does NOT collect on its own — cached MvDefs hold
    * resolved plans that reference the session — so the OUTER map is
    * bounded too ([[MaxCachedSessions]]). */
  private val defsCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      java.util.concurrent.ConcurrentHashMap[
        (String, Seq[(String, Long, Long)]), Seq[MvDef]]]())

  /** Outer-map session bound (r21, ADVICE): a cached MvDef holds a
    * resolved LogicalRelation, which strongly references its
    * SparkSession — so a WeakHashMap VALUE reaches back to its own weak
    * KEY and the entry can never be collected. Rather than break the
    * reference chain (SoftReference wrappers trade the leak for
    * GC-pressure nondeterminism), bound the session count and clear
    * WHOLESALE past it: re-resolution after a clear is the already-paid
    * cache-miss path, and 16 concurrently-live sessions is far past
    * anything the engine constructs. */
  private val MaxCachedSessions = 16

  /** Sub-second TTL memo of the per-table version stamp (r21, ADVICE):
    * fixed-point batches invoke the rule several times per QUERY, and
    * each stamp read is one getFileStatus per named table — pure local
    * metadata here, but a round-trip RPC per rule invocation on remote
    * filesystems. Within the TTL the stamp is reused, so steady-state
    * planning pays at most ~one stat call per table per query; a
    * concurrent INSERT OVERWRITE landing inside the 500 ms window is
    * caught by the next query's re-stamp (the same freshness class as
    * the file-listing caches Spark itself keeps). Values hold no
    * session reference, so the weak key actually collects. */
  private val StampTtlNs = 500L * 1000L * 1000L
  private val stampMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      (Long, String, Seq[(String, Long, Long)])]())

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val spec = conf.getConfString(DefsConf, "")
    if (spec.trim.isEmpty) plan
    else {
      val session = org.apache.spark.sql.SparkSession.active
      val stats = CatalogRules.CatalogStats(
        parseExact(conf.getConfString(ExactConf, "")))
      MvRewriteRule(cachedDefs(spec, session), stats).apply(plan)
    }
  }

  /** The `table=` names in spec order — a light string scan, no
    * resolution; the version stamp reads only catalog METADATA. */
  private def tableNames(spec: String): Seq[String] =
    spec.split("\\|").iterator.map(_.trim).filter(_.nonEmpty).map { block =>
      block.split(";").iterator.map(_.trim)
        .collectFirst { case p if p.startsWith("table=") =>
          p.stripPrefix("table=").trim }
        .getOrElse(throw new IllegalArgumentException(
          s"$DefsConf def is missing required key 'table' in '$block'"))
    }.toSeq

  private[plans] def cachedDefs(
      spec: String,
      session: org.apache.spark.sql.SparkSession): Seq[MvDef] = {
    val versions = {
      val memoed = stampMemo.get(session)
      if (memoed != null && memoed._2 == spec &&
          System.nanoTime() - memoed._1 < StampTtlNs) memoed._3
      else {
        val fresh = tableNames(spec).map { t =>
          val ident = session.sessionState.sqlParser.parseTableIdentifier(t)
          if (!session.sessionState.catalog.tableExists(ident))
            throw new IllegalArgumentException(
              s"$DefsConf names rollup table '$t' which does not exist " +
                "in the session catalog")
          val meta = session.sessionState.catalog.getTableMetadata(ident)
          // The storage dir's mtime folds the DATA version into the stamp:
          // an INSERT OVERWRITE replaces files without touching createTime,
          // and a resolved read plan captures a file listing. One
          // getFileStatus per table per stamp refresh — metadata-priced,
          // TTL-memoized above.
          val locMtime = meta.storage.locationUri.map { uri =>
            val p = new org.apache.hadoop.fs.Path(uri)
            try p.getFileSystem(session.sessionState.newHadoopConf())
              .getFileStatus(p).getModificationTime
            catch { case _: java.io.FileNotFoundException => 0L }
          }.getOrElse(0L)
          (t, meta.createTime, locMtime)
        }
        stampMemo.put(session, (System.nanoTime(), spec, fresh))
        fresh
      }
    }
    val perSession = defsCache.synchronized {
      if (defsCache.size() > MaxCachedSessions) defsCache.clear()
      var m = defsCache.get(session)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[
          (String, Seq[(String, Long, Long)]), Seq[MvDef]]()
        defsCache.put(session, m)
      }
      m
    }
    if (perSession.size > 64) perSession.clear()
    perSession.computeIfAbsent((spec, versions),
      _ => parseDefs(spec, session))
  }

  private[plans] def parseDefs(
      spec: String,
      session: org.apache.spark.sql.SparkSession): Seq[MvDef] =
    spec.split("\\|").iterator.map(_.trim).filter(_.nonEmpty).map { block =>
      val kv = block.split(";").iterator.map(_.trim).filter(_.nonEmpty).map { p =>
        p.split("=", 2) match {
          case Array(k, v) => k.trim -> v.trim
          case _ => throw new IllegalArgumentException(
            s"$DefsConf def entries must be key=value — got '$p'")
        }
      }.toMap
      def req(k: String): String = kv.getOrElse(k,
        throw new IllegalArgumentException(
          s"$DefsConf def is missing required key '$k' in '$block'"))
      val dims = req("dims").split(",").iterator.map(_.trim)
        .filter(_.nonEmpty).map { d =>
          d.split(":") match {
            case Array(b, m) => b.trim -> m.trim
            case _ => throw new IllegalArgumentException(
              s"$DefsConf dims must be base:mv pairs — got '$d'")
          }
        }.toMap
      val measures = req("measures").split("~").iterator.map(_.trim)
        .filter(_.nonEmpty).map { m =>
          m.split(":", -1) match {
            case Array(func, src, cast, mvCol) =>
              MvMeasure(func.trim, src.trim,
                Some(cast.trim).filter(_.nonEmpty)
                  .map(org.apache.spark.sql.types.DataType.fromDDL),
                mvCol.trim)
            case _ => throw new IllegalArgumentException(
              s"$DefsConf measures must be func:src:cast:mvCol — got '$m'")
          }
        }.toSeq
      // EXPRESSION dims ride the conf as base64(canonical):mvCol pairs
      // joined by `~`, optionally extended to
      // base64(canonical):mvCol:base64(srcCanonical):width for a
      // declared floorDiv BUCKET decomposition (q269's aligned-range
      // serving) — the canonicals are machine-derived SQL renderings
      // (MvRewriteRule.groupingCanonicals on a probe plan) full of the
      // grammar's own separators, so they travel encoded; base64's
      // alphabet contains no `:`/`~`/`;`, keeping the parse exact.
      def dec(b64: String): String =
        try new String(
          java.util.Base64.getDecoder.decode(b64.trim), "UTF-8")
        catch { case _: IllegalArgumentException =>
          throw new IllegalArgumentException(
            s"$DefsConf exprdims canonical must be base64 — got '$b64'")
        }
      val exprDims = kv.get("exprdims").toSeq.flatMap { spec =>
        spec.split("~").iterator.map(_.trim).filter(_.nonEmpty).map { p =>
          p.split(":") match {
            case Array(b64, mvCol) =>
              MvExprDim(dec(b64), mvCol.trim)
            case Array(b64, mvCol, srcB64, width) =>
              MvExprDim(dec(b64), mvCol.trim,
                Some(MvBucket(dec(srcB64), width.trim.toLong)))
            case _ => throw new IllegalArgumentException(
              s"$DefsConf exprdims entries must be " +
                s"base64(canonical):mvCol[:base64(src):width] — got '$p'")
          }
        }.toSeq
      }
      // ALTERNATE spellings (q276/q279) ride as
      // mvCol:base64(canonical):<kind>:<usPerBucket>[:base64(guard)…]
      // entries joined by `~` under `exprdimalts=` (kind `tsus` =
      // date_trunc value, `winus` = tumbling-window struct; trailing
      // segments are the declared null-guard canonicals), attached to
      // the declared exprdim with that mvCol — an alt naming an
      // undeclared column or an unknown kind is a malformed conf and
      // fails loudly, like every graft conf.
      val exprDimsWithAlts = kv.get("exprdimalts") match {
        case None => exprDims
        case Some(spec) =>
          val alts = spec.split("~").iterator.map(_.trim)
            .filter(_.nonEmpty).map { p =>
              p.split(":") match {
                case Array(mvCol, b64, kind, us, guardB64s @ _*) =>
                  val rebuild = kind.trim match {
                    case "tsus" => MvAltRebuild.TsFromBucket(us.trim.toLong)
                    case "winus" =>
                      MvAltRebuild.WindowFromBucket(us.trim.toLong)
                    case other => throw new IllegalArgumentException(
                      s"$DefsConf exprdimalts kind must be tsus|winus — " +
                        s"got '$other'")
                  }
                  mvCol.trim -> MvAltDim(dec(b64), rebuild,
                    guardB64s.map(dec).toSeq)
                case _ => throw new IllegalArgumentException(
                  s"$DefsConf exprdimalts entries must be " +
                    "mvCol:base64(canonical):<tsus|winus>:<usPerBucket>" +
                    s"[:base64(guard)…] — got '$p'")
              }
            }.toSeq
          alts.foldLeft(exprDims) { case (dims, (mvCol, alt)) =>
            if (!dims.exists(_.mvCol == mvCol))
              throw new IllegalArgumentException(
                s"$DefsConf exprdimalts names mvCol '$mvCol' with no " +
                  "declared exprdim")
            dims.map(d =>
              if (d.mvCol == mvCol) d.copy(alts = d.alts :+ alt) else d)
          }
      }
      val table = req("table")
      if (!session.catalog.tableExists(table))
        throw new IllegalArgumentException(
          s"$DefsConf names rollup table '$table' which does not exist " +
            "in the session catalog")
      MvDef(
        baseTable = req("base"),
        dims = dims,
        measures = measures,
        mvPlan =
          org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases(
            session.table(table).queryExecution.analyzed),
        basePath = kv.get("basePath"),
        exprDims = exprDimsWithAlts)
    }.toSeq

  /** `table:rows[:path=/abs/root]:col=ndv[,col=ndv…]`, `;`-separated.
    * The optional `path=` field (third position) records which files
    * the declared counts are ABOUT, in [[CatalogRules.scanPath]] form.
    * The uniqueness proofs REQUIRE it: a pathless Exact entry parses
    * (legacy strings stay valid, and ordering decisions can still use
    * its counts) but can never fire a proof — base identity is a
    * parquet basename, so without a path `a/supplier.parquet`'s
    * declared PK would vouch for `b/supplier.parquet`'s scan. */
  private[plans] def parseExact(
      spec: String): Map[String, CatalogRules.TableStat] =
    spec.split(";").iterator.map(_.trim).filter(_.nonEmpty).map { entry =>
      val (t, n, path, cols) = entry.split(":") match {
        case Array(t, n, cols) => (t, n, None, cols)
        case Array(t, n, p, cols) if p.trim.startsWith("path=") =>
          (t, n,
            Some(CatalogRules.normalizePath(p.trim.stripPrefix("path="))),
            cols)
        case _ => throw new IllegalArgumentException(
          s"$ExactConf entries must be " +
            s"table:rows[:path=/abs/root]:col=ndv[,col=ndv…] — " +
            s"got '$entry'")
      }
      val ndv = cols.split(",").iterator.map(_.trim).filter(_.nonEmpty)
        .map { p =>
          p.split("=") match {
            case Array(c, d) => c.trim -> d.trim.toLong
            case _ => throw new IllegalArgumentException(
              s"$ExactConf ndv entries must be col=ndv — got '$p'")
          }
        }.toMap
      t.trim -> CatalogRules.TableStat(n.trim.toLong, ndv,
        provenance = CatalogRules.StatProvenance.Exact, path = path)
    }.toMap
}

/** One rollup's contract: the base table it summarizes, its dimension
  * columns (base name -> rollup name), the measures it stores, and the
  * resolved plan that reads it. `castTo` records the exact cast the
  * query applies inside SUM (the engine's DECIMAL-accumulation
  * discipline), so a sum only folds onto a partial that accumulated
  * the same way — measure identity is (function, source column, cast),
  * never just a name. `basePath` (CatalogRules.scanPath form) pins
  * WHICH `baseTable` the rollup summarizes: base identity is otherwise
  * a parquet basename, and a rollup built over dir A must never answer
  * a query scanning dir B's same-named table; None (legacy defs) keeps
  * the name-only match.
  */
final case class MvDef(
    baseTable: String,
    dims: Map[String, String],
    measures: Seq[MvMeasure],
    mvPlan: LogicalPlan,
    basePath: Option[String] = None,
    exprDims: Seq[MvExprDim] = Nil)

/** An EXPRESSION dimension: the rollup column `mvCol` stores the value
  * of `canonical` — [[MvRewriteRule.canonicalKey]]'s exprId-free
  * spelling of the grouping expression RESOLVED to leaf columns (use
  * [[MvRewriteRule.groupingCanonicals]] on a probe plan built with the
  * same query text as the rollup, so the two spellings cannot drift).
  * `bucket`, when declared, states that `canonical` is exactly
  * `floorDiv(src, width)` over the integral source expression whose
  * canonical is [[MvBucket.srcCanonical]] — the extra structure that
  * lets bucket-ALIGNED range predicates on the raw source be served
  * from cells (q269). Like the rest of the MvDef it is a declared
  * contract: the declarer promises the decomposition matches the
  * stored column (derive both from one probe, as MvPhases does).
  */
final case class MvExprDim(
    canonical: String, mvCol: String, bucket: Option[MvBucket] = None,
    alts: Seq[MvAltDim] = Nil)

/** A DERIVED alternate spelling of an expression dimension (q276): a
  * grouping expression whose canonical equals [[canonical]] groups by
  * a BIJECTION of the stored bucket column — the same cells answer it,
  * with the output value rebuilt per cell via [[rebuild]]. The
  * canonical is derived from a probe plan built with the alternate
  * query text (MvPhases — the same no-drift device as the primary
  * canonical), and the declarer promises the bijection: e.g.
  * `date_trunc('hour', timestamp_micros(ts div 1000))` equals
  * `timestamp_micros(floorDiv(ts, HourNs) * 3600e6)` exactly when `ts`
  * is µs-aligned int64 ns — which the loader contract guarantees
  * (normalizeTsNs always produces micros*1000; `div` and floorDiv
  * agree on exact divisions). A spelling with a DIFFERENT width
  * (date_trunc('minute', …)) canonicalizes differently, matches no
  * declared alt, and correctly keeps the fact scan. */
final case class MvAltDim(
    canonical: String,
    rebuild: MvAltRebuild,
    /** Canonicals of IsNotNull OPERANDS that are equivalent to a null
      * guard on the bucket itself — Spark's TimeWindow injects
      * `isnotnull(<time column>)` below the aggregate, and the bucket
      * chain is null-intolerant and TOTAL over its source (non-null in
      * ⟹ non-null out), so each such guard maps to
      * `isnotnull(<bucket column>)` on the cells. Probe-derived like
      * every canonical here (the declarer reads them off the alternate
      * query's own plan), so the declared set and the injected set
      * cannot drift. */
    guards: Seq[String] = Nil)

/** How to recover an alternate spelling's grouping VALUE from the
  * stored bucket column — a closed enum (not a function) so alt
  * declarations stay conf-serializable. */
sealed trait MvAltRebuild
object MvAltRebuild {
  /** The value is the TIMESTAMP at the bucket's start:
    * `timestamp_micros(bucket * usPerBucket)` — the date_trunc
    * spelling of a floorDiv ns bucket. */
  final case class TsFromBucket(usPerBucket: Long) extends MvAltRebuild

  /** The value is the TUMBLING-WINDOW struct over the bucket:
    * `named_struct('start', timestamp_micros(bucket * us),
    * 'end', timestamp_micros((bucket + 1) * us))` — the
    * `window(col, '1 hour')` spelling (window width == bucket width,
    * no slide, no offset — the declarer derives the alt from a probe
    * with exactly that geometry). */
  final case class WindowFromBucket(usPerBucket: Long) extends MvAltRebuild

  def expr(r: MvAltRebuild, bucketCol: Attribute): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Add, CreateNamedStruct, MicrosToTimestamp, Multiply}
    def startUs(us: Long) = MicrosToTimestamp(Multiply(bucketCol, Literal(us)))
    r match {
      case TsFromBucket(us) => startUs(us)
      case WindowFromBucket(us) =>
        CreateNamedStruct(Seq(
          Literal("start"), startUs(us),
          Literal("end"), MicrosToTimestamp(Multiply(
            Add(bucketCol, Literal(1L)), Literal(us)))))
    }
  }
}

/** The floorDiv decomposition of a bucket expression dimension:
  * `bucket = floorDiv(source, width)` where `srcCanonical` is the
  * SOURCE expression's exprId-free canonical (leaf-resolved, the same
  * machinery as [[MvExprDim.canonical]]) and `width` the bucket width
  * in the source's units. */
final case class MvBucket(srcCanonical: String, width: Long)

final case class MvMeasure(
    func: String,
    srcCol: String,
    castTo: Option[DataType],
    mvCol: String)
