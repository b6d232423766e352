package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, AttributeSet, Cast, Coalesce, Concat, EqualTo, Expression, If, IsNotNull, IsNull, KnownNotNull, Literal, NamedExpression, PredicateHelper, RaiseError}
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
  * GROUPING SETS compose (q273): `Aggregate(Expand(Join(fact, dim)))`
  * pushes the same partials below the join and the Expand multiplies
  * (partial, dim) rows per set instead of fact rows — sound for the
  * same two reasons as the stored-rollup Expand navigation: partials
  * re-aggregate per set, and each partial row matches at most one dim
  * row.
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
  * raise_error guard — under non-ANSI eval an overflowed narrow would
  * otherwise null the partial and the outer sum's null-ignoring fold
  * would silently DROP it, a value-level divergence no type check
  * catches; the guard turns it into a loud failure instead (the same
  * contract as the MV layer's narrowExact). SUM over double stays
  * REFUSED: regrouping changes double addition order (bit-level
  * divergence no guard can detect).
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

  private val integral =
    Set[org.apache.spark.sql.types.DataType](
      ByteType, ShortType, IntegerType, LongType)

  /** An eligible join (inner, hint-free, all-equality condition) split
    * into (fact, dim, fact->dim key pairs): the fact side is where the
    * aggregate inputs live — both sides must later be recognizable
    * base scans, the fact for the gate and idempotence, the dim for
    * the proof. A composite key is one multi-part key, gated and
    * proven as a TUPLE. */
  private def eligibleJoin(p: LogicalPlan): Option[Join] = p match {
    case j @ Join(_, _, Inner, Some(c), JoinHint(None, None))
        if splitConjunctivePredicates(c).forall(_.isInstanceOf[EqualTo]) =>
      Some(j)
    case _ => None
  }

  private def decompose(join: Join, aggRefs: AttributeSet)
      : Option[(LogicalPlan, LogicalPlan,
          Seq[(AttributeReference, AttributeReference)])] = {
    val pairs = splitConjunctivePredicates(join.condition.get).map {
      case EqualTo(x: AttributeReference, y: AttributeReference) => (x, y)
      case _ => return None
    }
    val (fact, dim) =
      if (aggRefs.subsetOf(join.left.outputSet)) (join.left, join.right)
      else if (aggRefs.subsetOf(join.right.outputSet)) (join.right, join.left)
      else return None
    val keys = pairs.map { case (x, y) =>
      if (fact.outputSet.contains(x) && dim.outputSet.contains(y)) (x, y)
      else if (fact.outputSet.contains(y) && dim.outputSet.contains(x)) (y, x)
      else return None
    }
    Some((fact, dim, keys))
  }

  /** Evidence gate at the INNER-AGGREGATE grain — the (possibly
    * composite) join key plus any fact-side grouping keys, as ONE
    * counted ndv entry (per-column ndvs cannot be combined soundly, so
    * a grain without its entry stands down) — then the uniqueness
    * proof on the dim key: Exact provenance + counted tuple + recorded
    * path, the q252 trust boundary verbatim (a pathless Exact stat
    * could alias a same-named dim from another directory). */
  private def gated(
      fact: LogicalPlan,
      dim: LogicalPlan,
      innerKeyCols: Seq[AttributeReference],
      dks: Seq[AttributeReference]): Boolean = {
    val factTable = CatalogRules.tableOf(fact).getOrElse(return false)
    val fStat = stats.tables.get(factTable).getOrElse(return false)
    val fkNdv = fStat.ndv
      .get(CatalogRules.compositeKey(innerKeyCols.map(_.name).distinct))
      .getOrElse(return false)
    if (fkNdv <= 0 || fStat.rows / fkNdv < minReduction) return false
    val dimTable = CatalogRules.tableOf(dim).getOrElse(return false)
    stats.tables.get(dimTable) match {
      case Some(ts) =>
        ts.provenance == CatalogRules.StatProvenance.Exact &&
          ts.ndv.get(CatalogRules.compositeKey(dks.map(_.name)))
            .contains(ts.rows) &&
          ts.path.exists(p => CatalogRules.scanPath(dim).contains(p))
      case None => false
    }
  }

  private def dedupById(
      as: Seq[AttributeReference]): Seq[AttributeReference] =
    as.map(_.exprId).distinct.map(id => as.find(_.exprId == id).get)

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
      val al = Alias(template.copy(aggregateFunction = f),
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
            if inner.dataType.isInstanceOf[DecimalType] && !conf.ansiEnabled =>
          // DECIMAL folds EXACTLY (decimal addition is associative),
          // but the inner partial accumulates at Sum's widened type
          // (precision+10); narrowing it back to the input width before
          // the outer Sum keeps the result type identical to the direct
          // aggregation. The narrow is guarded LOUDLY: an fk-grain
          // partial that outgrows the input width raises with the value
          // in the message — under non-ANSI eval the unguarded cast
          // would null it and the outer Sum's null-ignoring fold would
          // silently DROP that partial (a value divergence no type
          // check sees); the house rule is that an optimizer can fail a
          // query loudly, never change its rows. This is the engine's
          // deterministic-average idiom sum(cast(x as decimal))/count(x)
          // folding with no Average-specific machinery — the two calls
          // swap independently inside the division (q271).
          val p = partial(s, aggE)
          val narrowed = Cast(p, inner.dataType)
          val guarded = If(
            And(IsNotNull(p), IsNull(narrowed)),
            Cast(new RaiseError(Concat(Seq(
              Literal("eager-aggregation partial sum overflows " +
                s"${inner.dataType.sql}: "),
              Cast(p, StringType)))), inner.dataType),
            narrowed)
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

  private def rewrite(
      ge: Seq[Expression],
      ae: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = {
    if (ge.exists(!_.deterministic) || ae.exists(!_.deterministic)) return None
    val join = eligibleJoin(stripPrune(child)).getOrElse(return None)
    val aggRefs = aggRefsOf(ae)
    if (aggRefs.isEmpty) return None // nothing to push; Distinct et al.
    val (fact, dim, keys) = decompose(join, aggRefs).getOrElse(return None)
    val (fks, dks) = (keys.map(_._1), keys.map(_._2))
    val dimOut = dim.outputSet
    // Grouping keys may live on EITHER side (the full Yan-Larson
    // shape): dim-side keys pass through the rejoin verbatim;
    // fact-side keys join the inner aggregate's grouping — the fact is
    // then exchanged at (fk x fact-group) grain, still never row grain.
    val factGe: Seq[AttributeReference] = ge.map {
      case a: AttributeReference if dimOut.contains(a) => null
      case a: AttributeReference if fact.outputSet.contains(a) => a
      case _ => return None
    }.filter(_ != null)
    val factGeSet = AttributeSet(factGe)
    val innerKeyCols = dedupById(fks ++ factGe)
    if (!gated(fact, dim, innerKeyCols, dks)) return None

    val folds = new Folds(fact)
    val newAe: Seq[NamedExpression] = ae.map {
      case a: AttributeReference
          if dimOut.contains(a) || factGeSet.contains(a) => a
      case al @ Alias(a: AttributeReference, _)
          if dimOut.contains(a) || factGeSet.contains(a) => al
      case al: Alias =>
        val swapped = al.child.transform {
          case aggE: AggregateExpression => folds.swap(aggE)
        }
        if (!folds.ok) return None
        val allowed =
          dimOut ++ factGeSet ++ AttributeSet(folds.partialAttrs)
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

    val inner = Aggregate(
      innerKeyCols, (innerKeyCols: Seq[NamedExpression]) ++ folds.partials,
      fact, None)
    val rejoined = Join(inner, dim, Inner,
      Some(keys.map { case (f, d) => EqualTo(f, d): Expression }
        .reduceLeft(And(_, _))),
      JoinHint.NONE)
    Some(Aggregate(ge, newAe, rejoined, None))
  }

  /** GROUPING SETS without a stored artifact (q273): the Expand's
    * pass-through slots carry fact columns under their source exprIds,
    * so the partials push below the join exactly as in the flat shape;
    * the rebuilt Expand multiplies (partial, dim) rows per set, its
    * pass-through section swapped from raw fact measures to the needed
    * partial columns. Expanded (fresh) slots hold dim-side attributes
    * (verbatim through the rejoin) or fact-side grouping attributes
    * (joined into the inner grouping — the inner emits them under the
    * same exprIds, so the per-set nulling literals need no surgery).
    */
  private def rewriteExpand(
      ge: Seq[Expression],
      ae: Seq[NamedExpression],
      expand: Expand): Option[LogicalPlan] = {
    if (ge.exists(!_.deterministic) || ae.exists(!_.deterministic)) return None
    val join = eligibleJoin(stripPrune(expand.child)).getOrElse(return None)
    val aggRefs = aggRefsOf(ae)
    if (aggRefs.isEmpty) return None
    val (fact, dim, keys) = decompose(join, aggRefs).getOrElse(return None)
    val (fks, dks) = (keys.map(_._1), keys.map(_._2))
    val dimOut = dim.outputSet

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

    val innerKeyCols = dedupById(fks ++ factSlotDims.toSeq)
    if (!gated(fact, dim, innerKeyCols, dks)) return None

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
    val rejoined = Join(inner, dim, Inner,
      Some(keys.map { case (f, d) => EqualTo(f, d): Expression }
        .reduceLeft(And(_, _))),
      JoinHint.NONE)
    // Pass-through slots become the needed partial (and any referenced
    // dim) columns; fresh slots keep their original attr/literal mix —
    // every attribute they name is in the rejoined output (inner emits
    // the fact grouping keys verbatim, the dim subtree its own attrs).
    val needed: Seq[Attribute] = {
      val refs = AttributeSet(newAe.flatMap(_.references)) -- freshOut
      (folds.partialAttrs ++ dim.output).filter(refs.contains)
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
