package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * Everything here is a PURE NARROW FILTER over a portable content hash
  * ([[TextAnalysis.portableHash32]]): no shuffle, no RNG state, full
  * whole-stage codegen — so a split is (1) reproducible across runs,
  * engines and cluster sizes, (2) stable under repartitioning (unlike
  * `df.sample`, whose per-partition RNG changes with the partition
  * layout), and (3) consistent across tables: any table keyed by the same
  * id lands on the same side of the split, which is exactly what
  * train/eval hygiene needs at 100 TB (join-free leakage prevention).
  *
  * The reference has no sampling surface (SURVEY.md §2 — ABSENT); these
  * are north-star pipeline operators.
  */
object Sampling {

  /** Bucket in [0, buckets) from the portable hash of `key` (salted so
    * different decisions draw independent buckets from the same key).
    */
  def hashBucket(key: Column, buckets: Int, salt: String = ""): Column =
    TextAnalysis.portableHash32(concat(lit(salt), key.cast("string"))) % buckets

  /** Deterministic train/val/test split label from percent bands:
    * [0,trainPct) -> train, [trainPct,trainPct+valPct) -> val, rest test.
    */
  def splitLabel(key: Column, trainPct: Int = 80, valPct: Int = 10,
      salt: String = ""): Column = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"split bands must fit in 100: train=$trainPct val=$valPct")
    val b = hashBucket(key, 100, salt)
    when(b < trainPct, lit("train"))
      .when(b < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** Keep a deterministic `percent`% of rows by key hash. */
  def hashSample(df: DataFrame, key: Column, percent: Int,
      salt: String = ""): DataFrame = {
    require(percent >= 0 && percent <= 100, s"percent out of range: $percent")
    df.filter(hashBucket(key, 100, salt) < percent)
  }

  /** Greedy per-group token-budget selection: within each `groupCol`
    * value, take rows in (scoreCol DESC, idCol ASC) order until the
    * running `tokensCol` total would exceed `budget` — the data-mixing
    * primitive a pre-training corpus runs per source ("best N tokens of
    * each source", proportions set by per-source budgets).
    *
    * Deterministic: the id tiebreak makes the order total, so the kept
    * set is unique. One shuffle (hash on the group) + one in-group sort —
    * the exact form's honest cost; parallelism is bounded by the group
    * count, so when groups are huge use [[fillTokenBudgetSharded]]
    * (exact, groups x shards parallel) or pre-thin with
    * [[stratifiedHashSample]] / a quality floor (both narrow).
    * Output keeps every input column plus `cum_tokens` (the running total
    * INCLUDING the row itself; a row larger than the remaining budget is
    * dropped along with everything after it in the group's order).
    */
  def fillTokenBudget(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      idCol: String,
      tokensCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("cum_tokens", sum(col(tokensCol).cast("long")).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Two-phase [[fillTokenBudget]] for huge groups: phase 1 splits each
    * group into `shards` deterministic sub-groups (salted on the id) and
    * budget-selects within each (group, shard) — parallelism becomes
    * groups x shards and each shard's survivor set is small (its running
    * total stops at the budget); phase 2 runs the exact selection over
    * the thinned union.
    *
    * EXACT, not approximate, by two facts about the prefix semantics:
    * (1) a row's within-shard running total is a lower bound on its
    * global one (shard competitors are a subset of group competitors),
    * so phase 1 never drops a row of the true prefix; (2) every row of
    * the true prefix precedes every dropped row in the group order
    * (anything AFTER a dropped row has an even larger global total), so
    * cutting each group at its earliest dropped position — the tiny
    * per-group `cut` aggregate, broadcast back — removes exactly the
    * rows whose thinned running total would under-count, and for
    * everything before the cut the thinned total IS the global total.
    * Equality with the one-phase form is property-tested, including
    * shards that overflow at different points.
    */
  def fillTokenBudgetSharded(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      idCol: String,
      tokensCol: String,
      budget: Long,
      shards: Int = 32): DataFrame = {
    require(shards > 0, s"shards must be positive: $shards")
    // Order key as a comparable struct: (score DESC, id ASC) == struct
    // lexicographic on (-score, id). Scores here are finite (quality in
    // [0,1]); a NaN score would order differently than the window's desc.
    def orderKey = struct((-col(scoreCol)).as("ns"), col(idCol).as("i"))
    val salted = df.withColumn("budget_shard",
      hashBucket(col(idCol), shards, salt = "budget:"))
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol), col("budget_shard"))
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val marked = salted.withColumn("shard_cum",
      sum(col(tokensCol).cast("long")).over(w1))
    val cut = marked.filter(col("shard_cum") > budget)
      .groupBy(col(groupCol)).agg(min(orderKey).as("cut"))
    val thinned = marked.filter(col("shard_cum") <= budget)
      .join(broadcast(cut), Seq(groupCol), "left")
      .filter(col("cut").isNull || orderKey < col("cut"))
      .drop("budget_shard", "shard_cum", "cut")
    fillTokenBudget(thinned, groupCol, scoreCol, idCol, tokensCol, budget)
  }

  /** Deterministic WEIGHTED sampling without replacement
    * (Efraimidis-Spirakis A-ES): each row draws u in (0,1) from the
    * portable hash of its id and competes on key = -ln(u) / weight; the
    * k smallest keys per stratum are exactly a weight-proportional
    * sample drawn without replacement — and because u is hash-derived,
    * the draw is reproducible across runs, engines, and partitionings
    * (same contract as [[hashSample]]). One shuffle (the per-stratum
    * top-k window; WindowGroupLimit keeps it a streaming top-k, not a
    * full sort retention).
    *
    * Weights must be strictly positive. The float key is ordering-only
    * and never output: cross-engine libm can differ in the last ulp, but
    * flipping an order needs two keys within one ulp — vanishing for
    * hash-derived draws.
    */
  def weightedHashSample(
      df: DataFrame,
      strataCol: Column,
      idKey: Column,
      weight: Column,
      k: Int,
      salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val u = (TextAnalysis.portableHash32(concat(lit(salt), idKey.cast("string")))
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    val key = -log(u) / weight
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol).orderBy(key.asc, idKey.asc)
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** Mixture scheduling (stride interleaving): assign every row an
    * `interleave_key` such that ascending-key order visits sources in
    * weight proportion — item i (1-based, per stratum, ordered by id)
    * lands at (i - 0.5) / weight, so a weight-2 source appears twice as
    * often as a weight-1 source at every prefix of the schedule. This is
    * the step that turns per-source curated pools into ONE training
    * order with the target mixture.
    *
    * Scale-honest on purpose: the key is EMITTED, not turned into a
    * global position — a global row_number would be a single-partition
    * window; the consumer range-partitions by the key instead (a sort,
    * the honest cost of materializing a total order, with no extra
    * coordination). Per-stratum rank + a literal CASE of weights is one
    * shuffle; the arithmetic is exact small-int division, so the key
    * reproduces bit-identically in any engine.
    */
  def mixtureInterleave(
      df: DataFrame,
      strataCol: Column,
      idCol: Column,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0): DataFrame = {
    require((defaultWeight +: weights.values.toSeq).forall(_ > 0),
      s"weights must be positive: $weights default=$defaultWeight")
    val w = weights.toSeq.sortBy(_._1).foldLeft(lit(defaultWeight)) {
      case (acc, (stratum, wt)) => when(strataCol === stratum, lit(wt)).otherwise(acc)
    }
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol).orderBy(idCol)
    df.withColumn("interleave_key",
      (row_number().over(win).cast("double") - lit(0.5)) / w)
  }

  /** [[mixtureInterleave]] at corpus scale: identical output, but the
    * per-stratum rank is the exact distributed row_number of
    * [[ShardedPrefix.globalRank]] (per-shard ranks + broadcast cumulative
    * shard counts) instead of one window partition per stratum — the
    * one-window form serializes each source through a single task.
    * Equality is property-tested (ShardedPrefixSpec). `idCol` must be
    * numeric, non-null, unique per stratum (the [[ShardedPrefix]]
    * contract; the one-window form already needed uniqueness for a
    * deterministic schedule).
    */
  def mixtureInterleaveSharded(
      df: DataFrame,
      strataCol: Column,
      idCol: Column,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0,
      shards: Int = 32): DataFrame = {
    require((defaultWeight +: weights.values.toSeq).forall(_ > 0),
      s"weights must be positive: $weights default=$defaultWeight")
    val w = weights.toSeq.sortBy(_._1).foldLeft(lit(defaultWeight)) {
      case (acc, (stratum, wt)) => when(strataCol === stratum, lit(wt)).otherwise(acc)
    }
    val keyed = df
      .withColumn("__mi_stratum", strataCol)
      .withColumn("__mi_ord", idCol)
    ShardedPrefix.globalRank(keyed, "__mi_stratum", "__mi_ord", "__mi_rank", shards)
      .withColumn("interleave_key",
        (col("__mi_rank").cast("double") - lit(0.5)) / w)
      .drop("__mi_stratum", "__mi_ord", "__mi_rank")
  }

  /** Temperature-scaled mixture weights at α = 1/2: the multilingual /
    * multi-source sampling rule w_s ∝ p_s^α (p_s = source's token share)
    * that flattens a natural-frequency mixture toward uniform, boosting
    * low-resource sources without discarding high-resource ones. α is
    * FIXED at 1/2 because IEEE-754 guarantees `sqrt` correctly rounded —
    * bit-identical across engines — while `pow(p, α)` is not, and a
    * cross-engine-reproducible weight table is the point: the weights
    * feed [[mixtureEpochPlan]]'s integer arithmetic, so two engines
    * computing the mix must agree exactly. The sqrt rides a 1e12 integer
    * fixed point (floor of an IEEE product of exact doubles), after
    * which everything is exact BIGINT math.
    *
    * p_ppm's 1e6 numerator product is guarded fail-fast (the repo's
    * silent-wrap discipline): per-source token counts past 2^63/1e6
    * (~9.2e12 tokens — a ~37 TB single source at 4 bytes/token) must
    * widen the fixed point, not wrap. One map-side-combined source
    * aggregate + two broadcast 1-row totals: sources-sized output at any
    * corpus scale, and the corpus is scanned once.
    *
    * Output: (source, tokens, p_ppm, w_ppm) — natural vs temperature-
    * scaled shares in parts-per-million (floors; non-negative inputs
    * make Spark's truncating `div` and the oracle's floor-div agree).
    */
  def temperatureWeightsSqrt(
      df: DataFrame,
      sourceCol: String = "source",
      tokens: Column): DataFrame =
    temperatureWeights(df, sourceCol, tokens, alphaNum = 1, alphaDen = 2)

  /** [[temperatureWeightsSqrt]] generalized to any dyadic temperature
    * α = k/2^m in (0, 1]: w_s ∝ p_s^α with p^(k/2^m) composed from
    * REPEATED correctly-rounded square roots — write k in binary and
    * multiply the matching nested-sqrt terms (e.g. α = 3/4 →
    * sqrt(p) * sqrt(sqrt(p))). Each sqrt is IEEE-correctly-rounded and
    * each double multiply exactly rounded, so the COMPOSITION is
    * bit-identical across engines — the same argument that pinned the
    * original at 1/2, now covering the temperature sweep an epoch
    * planner runs (α = 1/4 aggressive flattening … 1 = natural mix)
    * without ever touching the non-reproducible `pow`. Dyadic rationals
    * are dense in (0, 1], so this spans the practical temperature range
    * at cross-engine-exact precision; same fixed point, guards, and
    * sources-sized single-scan shape as the α = 1/2 form.
    */
  def temperatureWeights(
      df: DataFrame,
      sourceCol: String = "source",
      tokens: Column,
      alphaNum: Int,
      alphaDen: Int): DataFrame = {
    require(alphaDen >= 1 && (alphaDen & (alphaDen - 1)) == 0,
      s"alphaDen must be a power of two (α dyadic — see scaladoc): $alphaDen")
    require(alphaNum >= 1 && alphaNum <= alphaDen,
      s"alpha must be in (0, 1]: $alphaNum/$alphaDen")
    val guardLimit = Long.MaxValue / 1000000L
    val t = df.groupBy(sourceCol)
      .agg(sum(tokens.cast("long")).as("tokens"))
      .withColumn("tokens",
        when(col("tokens") > guardLimit, raise_error(concat(
          lit("temperatureWeightsSqrt: token count overflows the ppm " +
            "fixed point: "), col("tokens").cast("string"))))
          .otherwise(col("tokens")))
    val tot = t.agg(sum("tokens").as("__tt"))
    val p = col("tokens").cast("double") / col("__tt").cast("double")
    val s = t.crossJoin(broadcast(tot))
      .withColumn("__sc",
        floor(dyadicPow(p, alphaNum, alphaDen) * lit(1e12)).cast("long"))
    val stot = s.select("__sc").agg(sum("__sc").as("__st"))
    s.crossJoin(broadcast(stot))
      .select(col(sourceCol), col("tokens"),
        expr("(1000000 * tokens) div __tt").as("p_ppm"),
        expr("(1000000 * __sc) div __st").as("w_ppm"))
  }

  /** x^(num/den) for dyadic num/den as a fixed left-associated product of
    * nested square roots: bit i of num (i = 0 at the LSB, den = 2^m)
    * contributes the (m-i)-times-nested sqrt of x, factors multiplied in
    * DESCENDING exponent order (sqrt(x) before sqrt(sqrt(x)), …; x itself
    * when num = den). The order is part of the cross-engine contract —
    * oracle SQL must compose the identical expression.
    */
  private[graft] def dyadicPow(x: Column, num: Int, den: Int): Column = {
    val m = java.lang.Integer.numberOfTrailingZeros(den)
    val factors = (m to 0 by -1).collect {
      case i if (num & (1 << i)) != 0 =>
        (0 until (m - i)).foldLeft(x)((c, _) => sqrt(c))
    }
    factors.reduce(_ * _)
  }

  /** Mixture-epoch planning: given integer mixture weights and a total
    * token budget, how many PASSES (epochs) over each source the
    * training stream needs — the repeat-factor arithmetic behind
    * weighted pre-training mixtures, where a small high-quality source
    * is deliberately oversampled (epochs > 1) to hit its target share.
    *
    * target_s = budget * w_s div W (W = sum of weights over sources
    * PRESENT in the data, so unlisted sources default correctly);
    * epochs_s = ceil(target_s / tokens_s) capped at `maxEpochs` (the
    * repeat-degradation knob — past a few epochs, repeated data stops
    * helping). All arithmetic is integer; `budget * w_s` must fit a
    * Long (budget < 2^63 / max weight — a constraint on CONFIG, not
    * data). One map-side-combined source aggregate plus a broadcast
    * 1-row weight total: output is sources-sized at any corpus size.
    *
    * Output: (source, n_docs, tokens_src, max_id, weight, target_tokens,
    * epochs, planned_tokens) — planned = min(target, epochs * tokens_s),
    * what the cut stream will actually carry. `max_id` rides along for
    * [[mixtureEpochMaterialize]]'s epoch-major order key.
    */
  def mixtureEpochPlan(
      docs: DataFrame,
      sourceCol: String,
      idCol: String,
      tokens: Column,
      weights: Map[String, Long],
      budget: Long,
      defaultWeight: Long = 1L,
      maxEpochs: Long = 100L): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(maxEpochs > 0, s"maxEpochs must be positive: $maxEpochs")
    require((defaultWeight +: weights.values.toSeq).forall(_ >= 0),
      s"weights must be non-negative: $weights default=$defaultWeight")
    val w = weights.toSeq.sortBy(_._1).foldLeft(lit(defaultWeight)) {
      case (acc, (s, wt)) => when(col("source") === s, lit(wt)).otherwise(acc)
    }
    val per = docs
      .select(col(sourceCol).as("source"), col(idCol).cast("long").as("__id"),
        tokens.cast("long").as("__t"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("__t").as("tokens_src"),
        max("__id").as("max_id"))
      .withColumn("weight", w)
    epochPlanTail(per, budget, maxEpochs)
  }

  /** [[mixtureEpochPlan]] with DATA-DERIVED weights: the weight table
    * arrives as a (source, weight) frame — e.g. [[temperatureWeights]]'s
    * (source, w_ppm) — instead of a driver-side Map, so a
    * temperature-derived mix flows into epoch planning as ONE
    * declarative plan with no collect between the two stages. The
    * weight table is sources-sized by construction, so it rides the
    * broadcast side of a left join onto the per-source aggregate
    * (absent sources fall back to `defaultWeight`); negative weights in
    * the DATA raise at execution (the Map form validates its literal
    * weights at construction — same contract, the only place it can be
    * checked here). Identical output columns and integer arithmetic.
    *
    * `budget * weight` must fit a Long; with ppm weights that bounds
    * budget below 2^63/1e6 ~ 9.2e12 tokens — same class of CONFIG
    * constraint as the Map form, checked by the caller's choice of
    * weight scale.
    */
  def mixtureEpochPlanWeighted(
      docs: DataFrame,
      sourceCol: String,
      idCol: String,
      tokens: Column,
      weights: DataFrame,
      budget: Long,
      defaultWeight: Long = 0L,
      maxEpochs: Long = 100L): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(maxEpochs > 0, s"maxEpochs must be positive: $maxEpochs")
    require(defaultWeight >= 0, s"defaultWeight must be >= 0: $defaultWeight")
    val w = weights.select(col("source").as("__wsrc"),
      when(col("weight") < 0, raise_error(concat(
        lit("mixtureEpochPlanWeighted: negative weight for source "),
        col("source").cast("string"))))
        .otherwise(col("weight")).cast("long").as("__w"))
    val per = docs
      .select(col(sourceCol).as("source"), col(idCol).cast("long").as("__id"),
        tokens.cast("long").as("__t"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("__t").as("tokens_src"),
        max("__id").as("max_id"))
      .join(broadcast(w), col("source") === col("__wsrc"), "left")
      .withColumn("weight", coalesce(col("__w"), lit(defaultWeight)))
      .drop("__wsrc", "__w")
    epochPlanTail(per, budget, maxEpochs)
  }

  /** Shared integer epoch arithmetic over a (source, n_docs, tokens_src,
    * max_id, weight) frame — the tail of both plan forms, factored so
    * the two cannot drift.
    */
  private def epochPlanTail(
      per: DataFrame, budget: Long, maxEpochs: Long): DataFrame = {
    // Weight total over sources PRESENT in the data — a data-dependent
    // scalar, so it rides a broadcast 1-row frame, never a driver collect.
    // All-zero weights would divide by zero: fail fast on the same frame.
    val tot = per.agg(sum("weight").as("__w_total"))
      .select(
        when(col("__w_total") > 0, col("__w_total"))
          .otherwise(raise_error(lit(
            "mixtureEpochPlan: all per-source weights are zero")))
          .as("__w_total"))
    per.crossJoin(broadcast(tot))
      .withColumn("target_tokens", expr(s"${budget}L * weight div __w_total"))
      .withColumn("epochs",
        least(lit(maxEpochs),
          when(col("target_tokens") > 0 && col("tokens_src") > 0,
            expr("(target_tokens + tokens_src - 1) div tokens_src"))
            .otherwise(lit(0L))))
      .withColumn("planned_tokens",
        least(col("target_tokens"), col("epochs") * col("tokens_src")))
      .select("source", "n_docs", "tokens_src", "max_id", "weight",
        "target_tokens", "epochs", "planned_tokens")
  }

  /** Materialize the [[mixtureEpochPlan]]: repeat each source `epochs_s`
    * times in epoch-major order (epoch 1 of a source streams completely
    * before epoch 2) and cut each source's stream exactly at its token
    * target. The repeat is a narrow `sequence` explode against the
    * broadcast plan — the corpus is scanned once, never self-joined —
    * and the per-source running total is the two-phase
    * [[ShardedPrefix.exclusivePrefixSum]], so no source ever serializes
    * through a single window task. Output: input id/source/tokens plus
    * (epoch, cum_tokens), cum_tokens the running total INCLUDING the
    * row, <= target by the cut.
    *
    * Contract: ids non-negative AND small enough that
    * maxEpochs * (max_id + 1) fits a Long (both enforced — the
    * epoch-major order key is epoch * (max_id + 1) + id, which a
    * negative id would alias across epochs and an oversized id would
    * silently wrap, mis-ordering the cut), and unique per source (the
    * ShardedPrefix determinism contract).
    */
  def mixtureEpochMaterialize(
      docs: DataFrame,
      sourceCol: String,
      idCol: String,
      tokens: Column,
      weights: Map[String, Long],
      budget: Long,
      defaultWeight: Long = 1L,
      maxEpochs: Long = 100L,
      shards: Int = 32): DataFrame =
    materializeFromPlan(docs, sourceCol, idCol, tokens,
      mixtureEpochPlan(docs, sourceCol, idCol, tokens, weights,
        budget, defaultWeight, maxEpochs),
      maxEpochs, shards)

  /** [[mixtureEpochMaterialize]] with DATA-DERIVED weights — the
    * materialized consumer of [[mixtureEpochPlanWeighted]]: the
    * (source, weight) frame (e.g. [[temperatureWeightsSqrt]]'s ppm fixed
    * point) plans the epochs and the plan drives the repeat-and-cut
    * stream, all as ONE declarative job — measure the corpus, set the
    * temperature, plan the passes, and lay out the training order with
    * no driver collect anywhere between the stages. Identical output
    * columns, order keys, and cut semantics as the Map form (the two
    * share [[materializeFromPlan]], so they cannot drift).
    */
  def mixtureEpochMaterializeWeighted(
      docs: DataFrame,
      sourceCol: String,
      idCol: String,
      tokens: Column,
      weights: DataFrame,
      budget: Long,
      defaultWeight: Long = 0L,
      maxEpochs: Long = 100L,
      shards: Int = 32): DataFrame =
    materializeFromPlan(docs, sourceCol, idCol, tokens,
      mixtureEpochPlanWeighted(docs, sourceCol, idCol, tokens, weights,
        budget, defaultWeight, maxEpochs),
      maxEpochs, shards)

  /** Shared repeat-and-cut tail of both materialize forms: explode each
    * source `epochs` times against the broadcast (sources-sized) plan,
    * order epoch-major, cut at the per-source token target with the
    * two-phase sharded prefix sum. Factored so the literal-weight and
    * derived-weight faces cannot drift.
    */
  private def materializeFromPlan(
      docs: DataFrame,
      sourceCol: String,
      idCol: String,
      tokens: Column,
      plan: DataFrame,
      maxEpochs: Long,
      shards: Int): DataFrame = {
    val joined = docs
      .select(col(sourceCol).as("source"), col(idCol).cast("long").as("__id"),
        tokens.cast("long").as("tokens"))
      .join(broadcast(plan.select("source", "epochs", "target_tokens", "max_id")),
        Seq("source"))
      .filter(col("epochs") > 0)
      .withColumn("epoch", explode(expr("sequence(1L, epochs)")))
      .withColumn("__ord",
        when(col("__id") >= 0 && col("max_id") <= lit(Long.MaxValue / maxEpochs - 1L),
          (col("epoch") - 1L) * (col("max_id") + 1L) + col("__id"))
          .otherwise(raise_error(lit(
            "mixtureEpochMaterialize: ids must be non-negative and " +
              s"max_id <= Long.MaxValue/$maxEpochs - 1 (a negative id " +
              "would alias order keys across epochs; an oversized one " +
              "would wrap them silently)"))))
    ShardedPrefix.exclusivePrefixSum(
        joined, "source", "__ord", col("tokens"), "__before", shards)
      .filter(col("__before") + col("tokens") <= col("target_tokens"))
      .withColumn("cum_tokens", col("__before") + col("tokens"))
      .select(col("source"), col("__id").as(idCol), col("epoch"),
        col("tokens"), col("cum_tokens"))
  }

  /** Stratified deterministic sample: per-stratum keep-percentages, strata
    * not listed keep `defaultPercent`. The rate lookup compiles to a
    * literal CASE chain — no join, no shuffle; rates stay exact however
    * skewed the strata are (unlike `sampleBy`, which is RNG-based).
    */
  def stratifiedHashSample(
      df: DataFrame,
      strataCol: Column,
      key: Column,
      rates: Map[String, Int],
      defaultPercent: Int = 0,
      salt: String = ""): DataFrame = {
    require((defaultPercent +: rates.values.toSeq).forall(p => p >= 0 && p <= 100),
      s"percentages out of range: $rates default=$defaultPercent")
    val pct = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPercent)) {
      case (acc, (stratum, p)) => when(strataCol === stratum, lit(p)).otherwise(acc)
    }
    df.filter(hashBucket(key, 100, salt) < pct)
  }

  /** Materialize a total training order — the consumer step
    * [[mixtureInterleave]]'s docstring promises: range-partition on the
    * ordering key (sampled boundaries, a DISTRIBUTED sort) and sort
    * within partitions, so reading partitions 0..n-1 in sequence yields
    * the full schedule. `ord_partition` (the range bucket) is emitted so
    * a writer can produce one ordered shard per partition. This is the
    * honest cost of a total order at 100 TB: one range exchange, every
    * partition sorting locally in parallel — never a global
    * single-partition sort or window.
    */
  def materializeOrder(
      df: DataFrame,
      keyCol: Column,
      partitions: Int): DataFrame = {
    require(partitions > 0, s"partitions must be positive: $partitions")
    df.repartitionByRange(partitions, keyCol)
      .sortWithinPartitions(keyCol)
      .withColumn("ord_partition", spark_partition_id())
  }
}
