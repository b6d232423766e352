package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, AttributeSet, Cast, Coalesce, Concat, EqualTo, Expression, ExprId, GreaterThan, If, IsNotNull, IsNull, KnownNotNull, Literal, NamedExpression, PredicateHelper, RaiseError}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType, StringType}

/** Eager aggregation (Yan & Larson's group-by pushdown) — the q252
  * FK-rollup rewrite WITHOUT a stored artifact: an aggregate over
  * `fact JOIN dim` whose aggregate inputs live on the fact side (and
  * whose grouping keys live on either side — dim keys pass through
  * the rejoin verbatim, fact keys join the inner grouping) is
  * rewritten to aggregate the fact to the (join key x fact-group)
  * grain FIRST, then join the (ndv-sized) partials to the dim and
  * fold:
  *
  * {{{
  * Aggregate(s_name, sum(qty), Join(lineitem, supplier, fk = pk))
  *   =>  Aggregate(s_name, sum(partial),
  *         Join(Aggregate(fk, sum(qty) AS partial, lineitem), supplier))
  * }}}
  *
  * JOIN CHAINS compose (q274): `fact ⋈ dim1 ⋈ dim2 ⋈ …` — the
  * snowflake/report shape — peels one PROVEN-unique dim at a time.
  * Each rejoin step preserves partial multiplicity for exactly the
  * single-join reason (a unique dim key matches each partial row at
  * most once, and drops exactly the partials whose fact rows the
  * original join would drop), so the proof composes step-wise: every
  * dim in the chain needs its own Exact + counted-tuple + recorded-path
  * entry, and ONE unproven dim stands the whole rewrite down. A
  * snowflake step may key off an INNER dim's column (lineitem ⋈
  * supplier ⋈ nation on s_nationkey): that key never enters the inner
  * grain — it rides the earlier rejoin — so the fact still exchanges
  * at the FACT-side-keys grain below the entire chain.
  *
  * COMPUTED grouping keys compose (q277): `GROUP BY floorDiv(ts, w)`
  * over a join — Catalyst pulls the expression into a Project below
  * the Aggregate ([[stripDefs]] collects those alias definitions, the
  * q266 machinery) — pushes the EXPRESSION into the inner aggregate's
  * grouping (re-emitted under the original exprId, so the outer plan
  * needs no surgery) when its resolved form is deterministic and
  * fact-only. The evidence gate prices the computed grain through a
  * counted ndv entry keyed by [[CatalogRules.exprKey]] over the
  * leaf-resolved canonical — the collector derives the same canonical
  * from a probe plan, so gate and query cannot drift; no entry, no
  * rewrite.
  *
  * GROUPING SETS compose (q273): `Aggregate(Expand(Join(fact, dim)))`
  * pushes the same partials below the join (or chain) and the Expand
  * multiplies (partial, dim) rows per set instead of fact rows —
  * sound for the same two reasons as the stored-rollup Expand
  * navigation: partials re-aggregate per set, and each partial row
  * matches at most one dim row.
  *
  * At 100 TB this is the difference between EXCHANGING the fact at row
  * grain (the join shuffles or probes every row, and Spark's own
  * partial aggregation only kicks in ABOVE the join) and exchanging it
  * at FK grain — the fact's contribution to the join drops from rows
  * to ndv(fk) before any data moves.
  *
  * Correctness rests on the same proof as the MV join shape: the dim
  * key must be UNIQUE (each partial row matches at most one dim row,
  * so partials pass through the join unchanged) — proven only by an
  * [[CatalogRules.StatProvenance.Exact]] catalog entry whose recorded
  * path matches the scanned dim. Fold-safety bounds the aggregate
  * menu: COUNT folds as a sum of counts, MIN/MAX through themselves,
  * SUM over INTEGRAL inputs exactly (64-bit addition is associative
  * even under wraparound — non-ANSI only, where that argument holds),
  * and SUM over DECIMAL exactly (decimal addition is associative) with
  * the partial narrowed back to the input width under a LOUD
  * raise_error guard covering BOTH silent-null paths — a narrow-cast
  * overflow AND an overflowed partial ACCUMULATOR (detected through a
  * companion non-null-input count: a null partial over a positive
  * count IS accumulator overflow, the same disambiguation as the MV
  * layer's narrowExact) — under non-ANSI eval either would otherwise
  * null the partial and the outer sum's null-ignoring fold would
  * silently DROP it, a value-level divergence no type check catches;
  * the guards turn both into loud failures instead. Deployments that
  * cannot tolerate an optimizer-introduced runtime failure surface can
  * switch the decimal fold off with
  * `spark.graft.eageragg.decimalfold=false` (COUNT/MIN/MAX/integral
  * folds keep firing; a decimal sum then stands the rewrite down).
  * SUM over double stays REFUSED: regrouping changes double addition
  * order (bit-level divergence no guard can detect).
  *
  * Evidence gate: fires only when the catalog says the fact exceeds
  * the inner-aggregate grain's counted ndv by [[minReduction]] (a fact
  * already at key grain gains nothing and pays an extra aggregate).
  * Bails — like every rule in this layer — on hints, non-inner joins,
  * non-equi conditions, unrecognized scans, DISTINCT/FILTER clauses,
  * or any expression it cannot prove foldable. Idempotent: the
  * rewritten join's fact side is an Aggregate, which is not a
  * recognizable base scan.
  */
/** The config-only deployment form of [[EagerAggregationRule]]: builds
  * its catalog from the confs the other rules already publish — the
  * join-order stats (ordering-grade, feeds the reduction gate) merged
  * with `spark.graft.mv.exactstats` (the declared-constraint channel,
  * feeds the uniqueness proof; exact entries win on collision). A
  * strict no-op with both unset; without the exact conf the proof is
  * missing and the rule stands down — publishing approx stats alone
  * can never fire a rewrite whose correctness needs a constraint.
  */
object ConfEagerAggregationRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    val jo = conf.getConfString(ConfCatalogJoinOrderRule.StatsConf, "")
    val ex = conf.getConfString(ConfMvRewriteRule.ExactConf, "")
    if (jo.trim.isEmpty && ex.trim.isEmpty) plan
    else EagerAggregationRule(CatalogRules.CatalogStats(
      ConfCatalogJoinOrderRule.parse(jo) ++
        ConfMvRewriteRule.parseExact(ex))).apply(plan)
  }
}

object EagerAggregationRule {
  /** The deployment switch for the decimal SUM fold (see class doc):
    * the only fold whose loud-guard contract can FAIL a query the
    * direct plan would complete (a partial outgrowing the input width
    * raises where the direct sum, accumulating at precision+10, may
    * not). Default on; `false` refuses decimal sums while keeping the
    * rest of the fold menu. */
  val DecimalFoldConf = "spark.graft.eageragg.decimalfold"
}

final case class EagerAggregationRule(
    stats: CatalogRules.CatalogStats,
    minReduction: Long = 4L)
    extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg @ Aggregate(ge, ae, child, None) =>
      (stripPrune(child) match {
        case ex: Expand => rewriteExpand(ge, ae, ex)
        case _ => rewrite(ge, ae, child)
      }).getOrElse(agg)
  }

  private def stripPrune(p: LogicalPlan): LogicalPlan = p match {
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      stripPrune(c)
    case other => other
  }

  /** Walk pruning AND computed Projects down to the first non-Project
    * node, collecting alias definitions (the q266 device): Catalyst's
    * PullOutGroupingExpressions puts computed grouping keys in a
    * Project below the Aggregate, and loaders add computed
    * normalization columns. Filters do NOT pass — a filter between the
    * aggregate and the join does not commute with the pushed partial
    * aggregation unless proven, and this rule does not prove it. */
  @scala.annotation.tailrec
  private def stripDefs(
      p: LogicalPlan,
      defs: Map[ExprId, Expression]): (LogicalPlan, Map[ExprId, Expression]) =
    p match {
      case Project(pl, c) if pl.forall(e =>
          e.isInstanceOf[AttributeReference] || e.isInstanceOf[Alias]) =>
        stripDefs(c, defs ++ pl.collect { case a: Alias => a.exprId -> a.child })
      case other => (other, defs)
    }

  private val integral =
    Set[org.apache.spark.sql.types.DataType](
      ByteType, ShortType, IntegerType, LongType)

  /** An eligible join (inner, hint-free, all-equality condition). */
  private def eligibleJoin(p: LogicalPlan): Option[Join] = p match {
    case j @ Join(_, _, Inner, Some(c), JoinHint(None, None))
        if splitConjunctivePredicates(c).forall(_.isInstanceOf[EqualTo]) =>
      Some(j)
    case _ => None
  }

  /** One peeled dim of the join chain: the dim subtree (reused
    * verbatim in the rejoin) and its key pairs oriented
    * (fact-chain side -> dim). A composite key is one multi-part key,
    * gated and proven as a TUPLE. A snowflake step's fact-side key may
    * live on an INNER dim (it then rides that dim's rejoin instead of
    * the inner grain). */
  private final case class ChainStep(
      dim: LogicalPlan,
      keys: Seq[(AttributeReference, AttributeReference)])

  private val maxChain = 8

  /** Peel eligible joins recursively into (fact, dim steps
    * inner-to-outer): at each level the side carrying the aggregate
    * inputs continues the chain; the other side is that step's dim.
    * The chain ends at the first non-join node — the fact, whose
    * recognizability [[gatedChain]] checks. Any ineligible join along
    * the way (hinted, outer, non-equi, keys not orientable) bails the
    * whole decomposition — the usual refuse-on-uncertainty posture. */
  private def decomposeChain(plan: LogicalPlan, aggRefs: AttributeSet)
      : Option[(LogicalPlan, List[ChainStep])] = {
    val node = stripPrune(plan)
    node match {
      case Join(left, right, Inner, Some(c), JoinHint(None, None))
          if splitConjunctivePredicates(c).forall(_.isInstanceOf[EqualTo]) =>
        val pairs = splitConjunctivePredicates(c).map {
          case EqualTo(x: AttributeReference, y: AttributeReference) => (x, y)
          case _ => return None
        }
        val (factSide, dimSide) =
          if (aggRefs.subsetOf(left.outputSet)) (left, right)
          else if (aggRefs.subsetOf(right.outputSet)) (right, left)
          else return None
        val keys = pairs.map { case (x, y) =>
          if (factSide.outputSet.contains(x) && dimSide.outputSet.contains(y))
            (x, y)
          else if (factSide.outputSet.contains(y) &&
              dimSide.outputSet.contains(x)) (y, x)
          else return None
        }
        val step = ChainStep(dimSide, keys)
        eligibleJoin(stripPrune(factSide)) match {
          case Some(_) =>
            decomposeChain(factSide, aggRefs).collect {
              case (f, steps) if steps.length < maxChain =>
                (f, steps :+ step)
            }
          case None => Some((factSide, List(step)))
        }
      case _ => None
    }
  }

  /** Evidence gate at the INNER-AGGREGATE grain — the fact-side join
    * keys plus any fact-side grouping keys (plain names; computed keys
    * under their [[CatalogRules.exprKey]] canonical), as ONE counted
    * ndv entry (per-column ndvs cannot be combined soundly, so a grain
    * without its entry stands down) — then the uniqueness proof on
    * EVERY chain step's dim key: Exact provenance + counted tuple +
    * recorded path, the q252 trust boundary verbatim per step (a
    * pathless Exact stat could alias a same-named dim from another
    * directory; one unproven dim stands the whole chain down). */
  private def gatedChain(
      fact: LogicalPlan,
      steps: Seq[ChainStep],
      innerKeyNames: Seq[String]): Boolean = {
    val factTable = CatalogRules.tableOf(fact).getOrElse(return false)
    val fStat = stats.tables.get(factTable).getOrElse(return false)
    val fkNdv = fStat.ndv
      .get(CatalogRules.compositeKey(innerKeyNames.distinct))
      .getOrElse(return false)
    if (fkNdv <= 0 || fStat.rows / fkNdv < minReduction) return false
    steps.forall { s =>
      val dks = s.keys.map(_._2)
      CatalogRules.tableOf(s.dim) match {
        case Some(dimTable) => stats.tables.get(dimTable) match {
          case Some(ts) =>
            ts.provenance == CatalogRules.StatProvenance.Exact &&
              // Verbatim-leaf guard (r21): the counted-tuple proof names
              // LEAF columns; an aliasing Project on the dim side (e.g.
              // `n_regionkey AS n_nationkey`) must stand the chain down
              // rather than borrow another column's uniqueness.
              CatalogRules.verbatimLeafOutput(s.dim, dks) &&
              ts.ndv.get(CatalogRules.compositeKey(dks.map(_.name)))
                .contains(ts.rows) &&
              ts.path.exists(p => CatalogRules.scanPath(s.dim).contains(p))
          case None => false
        }
        case None => false
      }
    }
  }

  private def dedupById(
      as: Seq[AttributeReference]): Seq[AttributeReference] =
    as.map(_.exprId).distinct.map(id => as.find(_.exprId == id).get)

  /** Rebuild the join chain over the inner partial aggregate,
    * innermost dim first — each step's fact-side key attrs are emitted
    * by the inner aggregate (fact columns) or an earlier dim's subtree
    * (snowflake keys), so the fold is well-formed by construction. */
  private def rejoin(inner: LogicalPlan, steps: Seq[ChainStep]): LogicalPlan =
    steps.foldLeft(inner) { (acc, s) =>
      Join(acc, s.dim, Inner,
        Some(s.keys.map { case (f, d) => EqualTo(f, d): Expression }
          .reduceLeft(And(_, _))),
        JoinHint.NONE)
    }

  /** Per-rewrite fold state: the partial aliases pushed over the fact
    * and the outer-side call swaps (the bounded fold menu — see the
    * class doc for each entry's associativity/loud-guard argument). */
  private final class Folds(fact: LogicalPlan) {
    val partials = scala.collection.mutable.ArrayBuffer.empty[Alias]
    private val partialIds = scala.collection.mutable.Set
      .empty[org.apache.spark.sql.catalyst.expressions.ExprId]
    var ok = true

    def partialAttrs: Seq[Attribute] = partials.toSeq.map(_.toAttribute)

    private def partial(
        f: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction,
        template: AggregateExpression): AttributeReference = {
      // a fresh resultId per partial: two partials cut from ONE
      // template (the decimal sum + its companion count) must not
      // share a result attribute inside the same physical aggregate
      val al = Alias(template.copy(aggregateFunction = f,
        resultId = NamedExpression.newExprId),
        s"__ea_p${partials.size}")()
      partials += al
      partialIds += al.exprId
      al.toAttribute.asInstanceOf[AttributeReference]
    }

    def swap(aggE: AggregateExpression): Expression = {
      // transform recurses into replacements: a call already folded
      // onto partial attributes is OURS — leave it alone. Anything
      // else referencing non-fact columns (a dim-side aggregate, whose
      // per-group multiplicity the fk-grain join would change) refuses
      // the whole rewrite below.
      if (aggE.references.nonEmpty &&
          aggE.references.forall(a => partialIds.contains(a.exprId)))
        return aggE
      if (aggE.isDistinct || aggE.filter.isDefined ||
          !aggE.references.subsetOf(fact.outputSet)) { ok = false; return aggE }
      aggE.aggregateFunction match {
        case cnt: Count if cnt.children.forall(_.foldable) =>
          val p = partial(cnt, aggE)
          KnownNotNull(Coalesce(Seq(
            aggE.copy(aggregateFunction = Sum(p)), Literal(0L))))
        case cnt @ Count(Seq(_: AttributeReference)) =>
          val p = partial(cnt, aggE)
          KnownNotNull(Coalesce(Seq(
            aggE.copy(aggregateFunction = Sum(p)), Literal(0L))))
        case s @ Sum(inner, _)
            if integral.contains(inner.dataType) && !conf.ansiEnabled =>
          // integral only: 64-bit addition is associative (even under
          // wraparound), so partial-then-total == direct, bit for bit.
          // Under ANSI the wraparound argument is void — regrouped
          // partial sums can THROW on an intermediate Long overflow
          // where the direct aggregation would not (or vice versa), a
          // throw-vs-result divergence — so the fold refuses there,
          // the rule's usual refuse-on-uncertainty posture.
          aggE.copy(aggregateFunction = Sum(partial(s, aggE)))
        case s @ Sum(inner, _)
            if inner.dataType.isInstanceOf[DecimalType] &&
              !conf.ansiEnabled &&
              conf.getConfString(
                EagerAggregationRule.DecimalFoldConf, "true") == "true" =>
          // DECIMAL folds EXACTLY (decimal addition is associative),
          // but the inner partial accumulates at Sum's widened type
          // (precision+10); narrowing it back to the input width before
          // the outer Sum keeps the result type identical to the direct
          // aggregation. BOTH silent-null paths are guarded LOUDLY,
          // mirroring the MV layer's narrowExact: (a) an fk-grain
          // partial that outgrows the input width nulls under the
          // non-ANSI cast, and (b) the partial's own precision+10
          // ACCUMULATOR can overflow to null before the cast ever runs
          // — indistinguishable, by the sum alone, from a legitimately
          // null all-null-input group, so a companion COUNT partial of
          // the same input disambiguates: null sum over a positive
          // count IS accumulator overflow. Unguarded, the outer Sum's
          // null-ignoring fold would silently DROP either case (a
          // value divergence no type check sees); the house rule is
          // that an optimizer can fail a query loudly, never change
          // its rows. This is the engine's deterministic-average idiom
          // sum(cast(x as decimal))/count(x) folding with no
          // Average-specific machinery — the two calls swap
          // independently inside the division (q271).
          val p = partial(s, aggE)
          val c = partial(Count(Seq(inner)), aggE)
          val narrowed = Cast(p, inner.dataType)
          val guarded = If(
            And(IsNull(p), GreaterThan(c, Literal(0L))),
            Cast(new RaiseError(Concat(Seq(
              Literal("eager-aggregation partial sum overflowed its " +
                s"${s.dataType.sql} accumulator over "),
              Cast(c, StringType), Literal(" non-null inputs")))),
              inner.dataType),
            If(
              And(IsNotNull(p), IsNull(narrowed)),
              Cast(new RaiseError(Concat(Seq(
                Literal("eager-aggregation partial sum overflows " +
                  s"${inner.dataType.sql}: "),
                Cast(p, StringType)))), inner.dataType),
              narrowed))
          aggE.copy(aggregateFunction = Sum(guarded))
        case m @ Min(_) =>
          aggE.copy(aggregateFunction = Min(partial(m, aggE)))
        case m @ Max(_) =>
          aggE.copy(aggregateFunction = Max(partial(m, aggE)))
        case _ => ok = false; aggE
      }
    }
  }

  private def aggRefsOf(ae: Seq[NamedExpression]): AttributeSet =
    ae.flatMap(_.collect {
      case a: AggregateExpression => a.references
    }).foldLeft(AttributeSet.empty)(_ ++ _)

  /** A grouping key's classification against the decomposed chain. */
  private sealed trait GroupKey
  private case class DimKey(a: AttributeReference) extends GroupKey
  private case class FactKey(a: AttributeReference) extends GroupKey
  /** A computed fact-side key: the original grouping attribute (whose
    * exprId the inner aggregate re-emits), its defs-resolved
    * expression (evaluable over the fact), and its catalog grain name
    * (plain column name when the alias is a pure rename, else the
    * exprKey of the fully-leaf-resolved canonical). */
  private case class ComputedKey(
      a: AttributeReference, expr: Expression, grainName: String)
      extends GroupKey

  private def rewrite(
      ge: Seq[Expression],
      ae: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = {
    if (ge.exists(!_.deterministic) || ae.exists(!_.deterministic)) return None
    val (node, defs) = stripDefs(child, Map.empty)
    def resAbove(e: Expression): Expression = MvRewriteRule.resolve(e, defs)
    // Aggregate inputs resolve through the above-join defs so computed
    // columns (a cast, a derived measure) don't block the fact-side
    // membership checks; the resolved form is what gets pushed.
    def resolveAgg(aggE: AggregateExpression): AggregateExpression =
      aggE.transform {
        case a: AttributeReference if defs.contains(a.exprId) => resAbove(a)
      }.asInstanceOf[AggregateExpression]
    val aggRefs = ae.flatMap(_.collect { case a: AggregateExpression => a })
      .map(a => resolveAgg(a).references)
      .foldLeft(AttributeSet.empty)(_ ++ _)
    if (aggRefs.isEmpty) return None // nothing to push; Distinct et al.
    val (fact, steps) = decomposeChain(node, aggRefs).getOrElse(return None)
    val dimOut = steps.map(_.dim.outputSet)
      .foldLeft(AttributeSet.empty)(_ ++ _)
    // Fact-side leaf defs, used ONLY to name a computed grain the way
    // the collector's probe does (full leaf resolution through the
    // loader's own computed columns); plan construction resolves just
    // to the join-level fact output.
    lazy val allDefs = defs ++ MvRewriteRule.collectDefs(fact, Nil, Map.empty)._3
    // Grouping keys may live on EITHER side (the full Yan-Larson
    // shape): dim-side keys pass through the rejoin verbatim;
    // fact-side keys — plain attributes or computed fact-only
    // expressions — join the inner aggregate's grouping, so the fact
    // is exchanged at the (fk x fact-group) grain, still never row
    // grain.
    val groupKeys: Seq[GroupKey] = ge.map {
      case a: AttributeReference if dimOut.contains(a) => DimKey(a)
      case a: AttributeReference if fact.outputSet.contains(a) => FactKey(a)
      case a: AttributeReference if defs.contains(a.exprId) =>
        resAbove(a) match {
          case b: AttributeReference if fact.outputSet.contains(b) =>
            ComputedKey(a, b, b.name)
          case r if r.deterministic && r.references.subsetOf(fact.outputSet) =>
            ComputedKey(a, r, CatalogRules.exprKey(
              MvRewriteRule.canonicalKey(MvRewriteRule.resolve(r, allDefs))))
          case _ => return None
        }
      case _ => return None
    }
    val factGe = groupKeys.collect { case FactKey(a) => a }
    val computedGe = groupKeys.collect { case c: ComputedKey => c }
    val factGeSet = AttributeSet(factGe)
    val computedGeSet = AttributeSet(computedGe.map(_.a))
    val factJoinKeys = steps.flatMap(_.keys.map(_._1))
      .filter(fact.outputSet.contains)
    val plainKeyCols = dedupById(factJoinKeys ++ factGe)
    val computedCols = computedGe
      .groupBy(_.a.exprId).values.map(_.head).toSeq.sortBy(_.a.exprId.id)
    val innerKeyNames = plainKeyCols.map(_.name) ++ computedCols.map(_.grainName)
    if (!gatedChain(fact, steps, innerKeyNames)) return None

    val folds = new Folds(fact)
    val passThrough = (a: Attribute) =>
      dimOut.contains(a) || factGeSet.contains(a) || computedGeSet.contains(a)
    val newAe: Seq[NamedExpression] = ae.map {
      case a: AttributeReference if passThrough(a) => a
      case al @ Alias(a: AttributeReference, _) if passThrough(a) => al
      case al: Alias =>
        val swapped = al.child.transform {
          case aggE: AggregateExpression => folds.swap(resolveAgg(aggE))
        }
        if (!folds.ok) return None
        val allowed = dimOut ++ factGeSet ++ computedGeSet ++
          AttributeSet(folds.partialAttrs)
        if (!swapped.references.subsetOf(allowed)) return None
        Alias(swapped, al.name)(exprId = al.exprId)
      case _ => return None
    }
    if (!folds.ok || folds.partials.isEmpty) return None
    // Type identity is structural here (long sums stay long, counts
    // fold to the same non-null long, min/max keep their type), but
    // assert it anyway — a silent type drift is never acceptable.
    newAe.zip(ae).foreach { case (n, o) =>
      if (n.dataType != o.dataType) return None }

    // Computed keys are re-emitted by the inner aggregate under their
    // ORIGINAL exprIds, so the outer grouping/aggregate list and the
    // rejoin need no surgery.
    val computedAliases = computedCols.map(c =>
      Alias(c.expr, c.a.name)(exprId = c.a.exprId))
    val inner = Aggregate(
      (plainKeyCols: Seq[Expression]) ++ computedAliases.map(_.child),
      (plainKeyCols: Seq[NamedExpression]) ++ computedAliases ++ folds.partials,
      fact, None)
    Some(Aggregate(ge, newAe, rejoin(inner, steps), None))
  }

  /** GROUPING SETS without a stored artifact (q273): the Expand's
    * pass-through slots carry fact columns under their source exprIds,
    * so the partials push below the join (or proven chain, q274)
    * exactly as in the flat shape; the rebuilt Expand multiplies
    * (partial, dim) rows per set, its pass-through section swapped
    * from raw fact measures to the needed partial columns. Expanded
    * (fresh) slots hold dim-side attributes (verbatim through the
    * rejoin) or fact-side grouping attributes (joined into the inner
    * grouping — the inner emits them under the same exprIds, so the
    * per-set nulling literals need no surgery).
    */
  private def rewriteExpand(
      ge: Seq[Expression],
      ae: Seq[NamedExpression],
      expand: Expand): Option[LogicalPlan] = {
    if (ge.exists(!_.deterministic) || ae.exists(!_.deterministic)) return None
    val aggRefs = aggRefsOf(ae)
    if (aggRefs.isEmpty) return None
    val (fact, steps) =
      decomposeChain(stripPrune(expand.child), aggRefs).getOrElse(return None)
    val dimOut = steps.map(_.dim.outputSet)
      .foldLeft(AttributeSet.empty)(_ ++ _)

    // Classify each Expand slot (the stored-rollup Expand machinery's
    // shape contract): pass-through slots keep one exprId across every
    // set; fresh slots mix ONE attribute with null/int literals.
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
    val freshSlots = out.indices.filterNot(isPassThrough)
    val factSlotDims =
      scala.collection.mutable.ArrayBuffer.empty[AttributeReference]
    freshSlots.foreach { i =>
      val attrs = projs.map(_(i)).collect { case a: AttributeReference => a }
      if (attrs.map(_.exprId).distinct.length > 1) return None
      attrs.headOption.foreach { a =>
        if (dimOut.contains(a)) () // rides the rejoin verbatim
        else if (fact.outputSet.contains(a)) factSlotDims += a
        else return None
      }
      projs.map(_(i)).foreach {
        case _: AttributeReference => ()
        case _: Literal => () // null per set, or the gid
        case _ => return None
      }
    }
    val freshOut = AttributeSet(freshSlots.map(out))
    // Grouping must ride the fresh expanded attributes only.
    ge.foreach {
      case a: AttributeReference if freshOut.contains(a) => ()
      case _ => return None
    }

    val factJoinKeys = steps.flatMap(_.keys.map(_._1))
      .filter(fact.outputSet.contains)
    val innerKeyCols = dedupById(factJoinKeys ++ factSlotDims.toSeq)
    if (!gatedChain(fact, steps, innerKeyCols.map(_.name))) return None

    val folds = new Folds(fact)
    val newAe: Seq[NamedExpression] = ae.map {
      case a: AttributeReference if freshOut.contains(a) => a
      case al @ Alias(a: AttributeReference, _) if freshOut.contains(a) => al
      case al: Alias =>
        val swapped = al.child.transform {
          case aggE: AggregateExpression => folds.swap(aggE)
        }
        if (!folds.ok) return None
        val allowed =
          freshOut ++ dimOut ++ AttributeSet(folds.partialAttrs)
        if (!swapped.references.subsetOf(allowed)) return None
        Alias(swapped, al.name)(exprId = al.exprId)
      case _ => return None
    }
    if (!folds.ok || folds.partials.isEmpty) return None
    newAe.zip(ae).foreach { case (n, o) =>
      if (n.dataType != o.dataType) return None }

    val inner = Aggregate(
      innerKeyCols, (innerKeyCols: Seq[NamedExpression]) ++ folds.partials,
      fact, None)
    val rejoined = rejoin(inner, steps)
    // Pass-through slots become the needed partial (and any referenced
    // dim) columns; fresh slots keep their original attr/literal mix —
    // every attribute they name is in the rejoined output (inner emits
    // the fact grouping keys verbatim, the dim subtrees their own
    // attrs).
    val needed: Seq[Attribute] = {
      val refs = AttributeSet(newAe.flatMap(_.references)) -- freshOut
      (folds.partialAttrs ++ steps.flatMap(_.dim.output)).filter(refs.contains)
    }
    if (needed.isEmpty) return None
    val newOutput: Seq[Attribute] = needed ++ freshSlots.map(out)
    val newProjections: Seq[Seq[Expression]] = projs.map { p =>
      (needed: Seq[Expression]) ++ freshSlots.map(p(_))
    }
    Some(Aggregate(ge, newAe,
      Expand(newProjections, newOutput, rejoined), None))
  }
}
