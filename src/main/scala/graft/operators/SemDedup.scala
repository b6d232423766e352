package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantic deduplication (SemDeDup, Abbas et al. 2023,
  * arXiv:2303.09540): cluster the embedding corpus into cells, then
  * within each cell drop every vector that has a LOWER-ID in-cell
  * neighbor with cosine >= tau — the greedy one-keeper-per-epsilon-ball
  * policy, made deterministic by the id total order (the same
  * lowest-id-canonical convention as [[Dedup]]'s exact groups and the
  * dup-graph canonicals).
  *
  * This is the embedding-space DEDUP face of the ANN family: q30/q31
  * dedup literal content (sha256 / MinHash on text), SemDeDup dedups
  * MEANING — two documents with different surface text but
  * near-identical embeddings are one training example, and the paper's
  * result is that cutting them speeds convergence at equal quality.
  *
  * DETERMINISM (the q122/q131 device end-to-end): similarity evaluates
  * on the int8 CODES ([[Quantize.int8]] — floor-shift exact, so the
  * codes are the same BIGINTs in every engine), and the dedup predicate
  * is INTEGER-EXACT: cos(a,b) >= n/d  <=>  dot > 0 AND
  * d^2*dot^2 >= n^2*|a|^2*|b|^2 — no sqrt, no division, no float
  * boundary to flap. [[graft.functions.DotProductFF]] accumulates
  * int8-code products in double, where every partial sum is an exact
  * integer (products <= 127^2 < 2^24, dims <= 64, and the squared
  * predicate's largest term d^2*dot^2 <= 400 * (64*127^2)^2 ~ 4.3e14
  * stays far under 2^53) — so the codegen'd double fold IS the BIGINT
  * fold the oracle runs. Cell assignment reuses q42's proven argmax
  * device (csim DESC, cell) over the same codes.
  *
  * Scale shape: the quadratic risk is confined INSIDE cells — the pair
  * stage is a cell-equi self-join (bucket-colocated, map-side
  * prunable), never a corpus cross product; nlist grows ~sqrt(N) so
  * expected cell population stays bounded, and a hot cell (a dense
  * semantic cluster — exactly where dups live) is the AQE skew-join
  * case. Codes are 4x smaller than the floats, so the join shuffles
  * int8 payloads. The first-`nlist` quantizer is the oracle-friendly
  * correctness face; production swaps in [[Similarity.trainedCentroids]]
  * via `centroidsOpt` — every downstream plan shape is identical
  * (the q42-vs-q85 pattern).
  */
object SemDedup {

  /** Default cell count (matches the IVF family's fixture geometry). */
  val Nlist = 16

  /** tau = [[TauNum]]/[[TauDen]] = 0.35: on the fixture's isotropic
    * random embeddings (no planted semantic dups) this sits at ~p99.2
    * of the in-cell pair-cosine distribution — 62 of 500 vectors drop,
    * so the screen genuinely cuts (the q204 threshold discipline). Real
    * embedding corpora run tau ~ 0.9+; the operating point is data-set
    * calibration, not operator semantics.
    */
  val TauNum = 7
  val TauDen = 20

  private def dotD(a: Column, b: Column): Column = Similarity.dotD(a, b)

  /** Int8 codes with their exact squared norm: (id, q, nsq). Zero-scale
    * (empty / all-zero) vectors are excluded — cosine is undefined.
    */
  private def codes(emb: DataFrame, idCol: String, embCol: String): DataFrame =
    Quantize.int8(emb, idCol, embCol)
      .filter(col("scale") > 0)
      .select(col(idCol), col("qvec").cast("array<float>").as("q"))
      .select(col(idCol), col("q"), dotD(col("q"), col("q")).as("nsq"))

  /** q42's argmax cell assignment, carrying the code and its exact
    * squared norm through: (vec_id, q, nsq, cell, csim). Broadcasts the
    * tiny centroid table, scores every code, keeps the best cell per
    * vector. Checkpointed — every caller probes it from both sides of a
    * self-join, and the prune face additionally windows over it.
    */
  private def assigned(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      nlist: Int,
      centroidsOpt: Option[DataFrame]): DataFrame = {
    require(nlist >= 1, s"nlist must be >= 1: $nlist")
    graft.functions.DotProductFF.register(emb.sparkSession)
    val c = codes(emb, idCol, embCol)
    val cents = centroidsOpt.getOrElse(
      c.filter(col(idCol) < nlist)
        .select(col(idCol).as("cell"), col("q").as("cent_emb"),
          sqrt(col("nsq")).as("cent_norm")))
    // Fail loudly on an empty quantizer (r16 ADVICE): with the default
    // first-`nlist` device an id-offset corpus (no ids < nlist) derives
    // ZERO centroids, and a caller-supplied table can be empty the same
    // way — either would silently turn every downstream face
    // (screen/keptCodes/probeIndex/prototypePrune) into zero rows. The
    // check is one bounded job over a tiny frame (the same cost class
    // as the localCheckpoint below).
    require(!cents.isEmpty,
      "SemDedup: empty centroid table — with the default quantizer the " +
        s"corpus must contain ids in [0, $nlist) (id-offset corpora need " +
        "an explicit centroidsOpt); a supplied centroid table must be " +
        "non-empty")
    val scored = c
      .select(col(idCol).as("vec_id"), col("q"), col("nsq"))
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("q"), col("nsq"), col("cell"),
        (dotD(col("q"), col("cent_emb")) / (sqrt(col("nsq")) * col("cent_norm")))
          .as("csim"))
    val w = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cell"))
    scored.withColumn("cr", row_number().over(w))
      .filter(col("cr") === 1)
      .select(col("vec_id"), col("q"), col("nsq"), col("cell"), col("csim"))
      .localCheckpoint(true)
  }

  /** Lower-id tau-ball evidence per vector: (vec_id, n_dup_lower, kept)
    * joined back onto the assignment. Cell-local pair stage with the
    * integer-exact tau predicate on the codes.
    */
  private def withDupEvidence(
      asg: DataFrame, tauNum: Int, tauDen: Int): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      s"tau must be in (0, 1]: $tauNum/$tauDen")
    val a = asg.select(col("vec_id").as("ia"), col("q").as("qa"),
      col("nsq").as("na"), col("cell"))
    val b = asg.select(col("vec_id").as("ib"), col("q").as("qb"),
      col("nsq").as("nb"), col("cell"))
    val d = dotD(col("qa"), col("qb"))
    val nd = lit(tauDen.toLong * tauDen) * d * d >=
      lit(tauNum.toLong * tauNum) * col("na") * col("nb")
    val dupCounts = a.join(b, Seq("cell"))
      .filter(col("ia") < col("ib") && d > 0 && nd)
      .groupBy(col("ib").as("vec_id"))
      .agg(count(lit(1)).as("n_dup_lower"))
    asg.join(dupCounts, Seq("vec_id"), "left")
      .withColumn("n_dup_lower", coalesce(col("n_dup_lower"), lit(0L)))
      .withColumn("kept", col("n_dup_lower") === 0)
  }

  /** The centroid artifact a serving deployment persists beside the
    * kept-vector index: (cell, cent_emb, cent_norm) — the deterministic
    * first-`nlist` quantizer by default (production swaps in
    * [[Similarity.trainedCentroids]]; every consumer takes this table,
    * so the swap is a one-liner). `cent_norm` is the correctly-rounded
    * double both the batch argmax and the streaming row-local argmax
    * divide by — persisting it (rather than recomputing) is what makes
    * the two faces agree bit-for-bit.
    */
  def centroidTable(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      nlist: Int = Nlist): DataFrame = {
    require(nlist >= 1, s"nlist must be >= 1: $nlist")
    graft.functions.DotProductFF.register(emb.sparkSession)
    codes(emb, idCol, embCol)
      .filter(col(idCol) < nlist)
      .select(col(idCol).as("cell"), col("q").as("cent_emb"),
        sqrt(col("nsq")).as("cent_norm"))
  }

  /** The kept-vector INDEX artifact: the [[screen]] survivors with the
    * probe-side columns a stored-index deployment needs — (vec_id, q,
    * nsq, cell). This is what [[probeIndex]] and the streaming face
    * probe arrivals against; it shrinks with every dedup pass (only
    * survivors are stored) and is int8 codes, 4x smaller than floats.
    */
  def keptCodes(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      nlist: Int = Nlist,
      tauNum: Int = TauNum,
      tauDen: Int = TauDen,
      centroidsOpt: Option[DataFrame] = None): DataFrame =
    withDupEvidence(
      assigned(emb, idCol, embCol, nlist, centroidsOpt), tauNum, tauDen)
      .filter(col("kept"))
      .select(col("vec_id"), col("q"), col("nsq"), col("cell"))

  /** Probe a persisted kept-vector index with NEW arrivals — the
    * incremental face of [[screen]] (the q198 stored-probe pattern, in
    * embedding space): each arrival is cell-assigned against the SAME
    * persisted centroid table the index was built with, then counted
    * against the index members of its cell under the identical
    * integer-exact tau predicate. Unlike [[screen]]'s lower-id order,
    * the index side is logically ALL-prior — an arrival drops if ANY
    * indexed vector sits in its tau-ball. Output: (vec_id, cell,
    * n_dup_index, kept) for every nonzero arrival.
    *
    * Scale shape: arrivals shuffle once on cell; the index is probed
    * cell-equi (bucket-colocated when the index is bucketed by cell);
    * nothing is quadratic in the corpus — only in the arrival-batch x
    * cell-population product, the same bound the batch screen carries.
    */
  def probeIndex(
      newEmb: DataFrame,
      keptIdx: DataFrame,
      centroids: DataFrame,
      idCol: String,
      embCol: String,
      tauNum: Int = TauNum,
      tauDen: Int = TauDen): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      s"tau must be in (0, 1]: $tauNum/$tauDen")
    val asg = assigned(newEmb, idCol, embCol, nlist = 1, Some(centroids))
    val idx = keptIdx.select(col("q").as("qi"), col("nsq").as("ni"),
      col("cell"))
    val d = dotD(col("qi"), col("q"))
    val nd = lit(tauDen.toLong * tauDen) * d * d >=
      lit(tauNum.toLong * tauNum) * col("ni") * col("nsq")
    val hits = asg.join(idx, Seq("cell"))
      .filter(d > 0 && nd)
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_dup_index"))
    asg.join(hits, Seq("vec_id"), "left")
      .select(
        col("vec_id"), col("cell"),
        coalesce(col("n_dup_index"), lit(0L)).as("n_dup_index"))
      .withColumn("kept", col("n_dup_index") === 0)
  }

  /** Default audit-slice bound for [[cellMissAudit]] (the `maxId`
    * device of `Similarity.cosineDupPairs`: the exact face is
    * all-pairs, so it only ever runs id-gated).
    */
  val AuditMaxId = 256L

  /** Cell-confinement MISS audit — the tracked approximation-quality
    * number for the SemDeDup family (the q121/q189 discipline: every
    * approximation ships with a regression-guarded measurement).
    * SemDeDup only compares vectors INSIDE a cell, so a tau-pair whose
    * members argmax into different cells is invisible to the screen —
    * the paper accepts this; this audit MEASURES it. Over the bounded
    * slice `vec_id < maxId`: the exact all-pairs tau graph (broadcast
    * self-join — quadratic, which is WHY the id gate is mandatory, not
    * a knob) against the same-cell subset. Output is one row:
    * (n_pairs_exact, n_pairs_in_cell, n_missed, miss_rate) — the first
    * three are exact BIGINTs; miss_rate is their one double quotient.
    * On the isotropic fixture the boundary miss rate is high (random
    * directions sit between cells); on real clustered corpora — where
    * dups are dense near centroids — it is the small number the paper
    * reports. Tracking it is what tells you when your corpus is NOT
    * behaving like that and nlist/tau need recalibration.
    */
  def cellMissAudit(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      nlist: Int = Nlist,
      tauNum: Int = TauNum,
      tauDen: Int = TauDen,
      maxId: Long = AuditMaxId,
      centroidsOpt: Option[DataFrame] = None): DataFrame = {
    require(maxId > 0, s"maxId must be positive: $maxId")
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      s"tau must be in (0, 1]: $tauNum/$tauDen")
    val slice = emb.filter(col(idCol) < maxId)
    val asg = assigned(slice, idCol, embCol, nlist, centroidsOpt)
    val a = asg.select(col("vec_id").as("ia"), col("q").as("qa"),
      col("nsq").as("na"), col("cell").as("ca"))
    val b = asg.select(col("vec_id").as("ib"), col("q").as("qb"),
      col("nsq").as("nb"), col("cell").as("cb"))
    val d = dotD(col("qa"), col("qb"))
    val taued = lit(tauDen.toLong * tauDen) * d * d >=
      lit(tauNum.toLong * tauNum) * col("na") * col("nb")
    // Exact all-pairs tau graph on the gated slice: broadcast the
    // (bounded) right side, never a shuffle of pairs.
    val pairs = a.join(broadcast(b), col("ia") < col("ib"))
      .filter(d > 0 && taued)
    pairs.agg(
      count(lit(1)).as("n_pairs_exact"),
      sum(when(col("ca") === col("cb"), 1L).otherwise(0L))
        .as("n_pairs_in_cell"))
      .select(
        col("n_pairs_exact"),
        coalesce(col("n_pairs_in_cell"), lit(0L)).as("n_pairs_in_cell"),
        (col("n_pairs_exact") - coalesce(col("n_pairs_in_cell"), lit(0L)))
          .as("n_missed"))
      .withColumn("miss_rate",
        when(col("n_pairs_exact") === 0, lit(0.0))
          .otherwise(col("n_missed").cast("double") /
            col("n_pairs_exact").cast("double")))
  }

  /** The screen: (vec_id, cell, n_dup_lower, kept) for every nonzero
    * vector — `n_dup_lower` = how many lower-id same-cell vectors sit
    * within the tau-ball (the integer evidence column), `kept` = that
    * count is zero. Survivors are exactly the corpus SemDeDup ships to
    * training.
    */
  def screen(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      nlist: Int = Nlist,
      tauNum: Int = TauNum,
      tauDen: Int = TauDen,
      centroidsOpt: Option[DataFrame] = None): DataFrame =
    withDupEvidence(
      assigned(emb, idCol, embCol, nlist, centroidsOpt), tauNum, tauDen)
      .select(col("vec_id"), col("cell"), col("n_dup_lower"), col("kept"))

  /** Default prototype-prune fraction: drop the most-prototypical
    * [[DropNum]]/[[DropDen]] = 25% of each cell's SemDeDup survivors
    * (D4's pruning regime is aggressive; the exact fraction is a
    * data-set operating point, not operator semantics).
    */
  val DropNum = 1
  val DropDen = 4

  /** D4 prototype prune (Tirumala et al. 2023, arXiv:2308.12284): the
    * stage D4 chains AFTER SemDeDup — within each cell, rank the
    * surviving vectors by prototypicality (cosine to their own
    * centroid, DESC; vec_id breaks ties) and drop the top
    * dropNum/dropDen fraction. The points most like their centroid
    * carry the least marginal information once exact-ball dups are
    * gone; what remains is the cell's diverse shell. Output: one row
    * per SemDeDup survivor — (vec_id, cell, proto_rank, n_cell, kept)
    * with the INTEGER-EXACT boundary kept = proto_rank*dropDen >
    * n_cell*dropNum (no fractional cell-size math to flap). The csim
    * rank order is the q42 argmax determinism argument: exact-integer
    * dots over correctly-rounded sqrt, identical in any IEEE engine.
    *
    * Scale shape: [[screen]]'s plan plus one cell-partitioned window
    * over the survivor set — rank and cell-count share the exchange.
    * Centroid vectors themselves (csim = 1) rank most prototypical and
    * are pruned first, which is exactly the paper's intent.
    */
  /** Planted-cluster blend weights: 7/8 anchor + 1/8 self. The anchor
    * weight dominates so members of a cluster share most of their
    * direction (in-cluster cosine ~0.98 on the isotropic fixture, far
    * above tau); 1/8 of the member's own vector keeps every row
    * distinct. Both weights are exact binary fractions, so each blended
    * element is two correctly-rounded double ops (one product each,
    * one sum) — bit-identical in any IEEE engine, which is what lets
    * the DuckDB oracle re-derive the fixture verbatim.
    */
  val BlendAnchorNum = 7
  val BlendDen = 8

  /** Deterministic PLANTED-CLUSTER fixture device (r16 verdict item 2):
    * derive a clustered corpus from an isotropic one so the
    * [[cellMissAudit]] number can be measured in SemDeDup's OPERATING
    * regime. The paper's claim (arXiv:2303.09540) is that semantic dups
    * concentrate near shared directions, so cell confinement misses few
    * tau-pairs; on isotropic random embeddings the miss rate is high by
    * construction (cross-cell boundary pairs dominate) and the tracked
    * number cannot regress meaningfully. This device plants the
    * clustered regime FROM the existing fixture, no synthetic data:
    * each gated row blends toward an anchor row (`anchor = id % k`,
    * anchors are the first k rows — the same rows the default quantizer
    * uses as centroids, so cells align with planted clusters by
    * construction): `v' = 7/8 * v_anchor + 1/8 * v_self`, elementwise
    * in double. Output: (idCol, embCol) with embCol the blended
    * array<double> — shaped to feed [[cellMissAudit]]/[[screen]]
    * directly.
    *
    * Scale shape: the k anchor rows broadcast; the blend is one
    * codegen'd `zip_with` over the gated slice — no shuffle.
    */
  def plantClusters(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      k: Int = Nlist,
      maxId: Long = AuditMaxId): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(maxId > k, s"maxId must exceed k: $maxId <= $k")
    val slice = emb.filter(col(idCol) < maxId)
    val anchors = slice.filter(col(idCol) < k)
      .select(col(idCol).as("anchor_id"), col(embCol).as("anchor_emb"))
    val wa = lit(BlendAnchorNum.toDouble / BlendDen) // 0.875, exact
    val ws = lit(1.0 - BlendAnchorNum.toDouble / BlendDen) // 0.125, exact
    slice
      .select(col(idCol), (col(idCol) % k).as("anchor_id"),
        col(embCol).as("self_emb"))
      .join(broadcast(anchors), Seq("anchor_id"))
      .select(col(idCol),
        zip_with(col("anchor_emb"), col("self_emb"),
          (a, s) => wa * a.cast("double") + ws * s.cast("double"))
          .as(embCol))
  }

  def prototypePrune(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      nlist: Int = Nlist,
      tauNum: Int = TauNum,
      tauDen: Int = TauDen,
      dropNum: Int = DropNum,
      dropDen: Int = DropDen,
      centroidsOpt: Option[DataFrame] = None): DataFrame = {
    require(dropNum >= 0 && dropDen > 0 && dropNum <= dropDen,
      s"drop fraction must be in [0, 1]: $dropNum/$dropDen")
    val survivors = withDupEvidence(
      assigned(emb, idCol, embCol, nlist, centroidsOpt), tauNum, tauDen)
      .filter(col("kept"))
    val rank = Window.partitionBy("cell")
      .orderBy(col("csim").desc, col("vec_id"))
    survivors
      .withColumn("proto_rank", row_number().over(rank).cast("long"))
      .withColumn("n_cell", count(lit(1)).over(Window.partitionBy("cell")))
      .select(
        col("vec_id"), col("cell"), col("proto_rank"), col("n_cell"),
        (col("proto_rank") * dropDen > col("n_cell") * dropNum).as("kept"))
  }
}
