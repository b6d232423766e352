package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.SemDedup

/** Streaming faces over EMBEDDING arrivals (vec_id, embedding) — the
  * crawl-time side of the semantic-dedup family, completing the same
  * three-face shape the CDC chunk family has (q208 build / q211 stored
  * probe / this stream screen).
  */
object EmbeddingStream {

  /** Streaming semantic-dedup screen — the crawl-time face of
    * [[SemDedup.probeIndex]] against a PERSISTED kept-vector index
    * (the production pattern: a periodic batch [[SemDedup.keptCodes]]
    * pass refreshes the index; the stream screens arrivals between
    * refreshes). Append-mode constraints force every stage row-local:
    *
    *  - int8 quantization is already per-row expressions
    *    ([[graft.operators.Quantize.int8]]);
    *  - cell assignment cannot be the batch broadcast-join + window
    *    argmax (a window is an aggregation = state), so the centroid
    *    table folds into ONE broadcast row (cell-sorted struct array)
    *    and the argmax is a row-local `aggregate` fold — strict `>`
    *    over the cell-ascending array reproduces the batch
    *    (csim DESC, cell) tie-break exactly, and dividing by the
    *    PERSISTED cent_norm makes the csim doubles bit-identical;
    *  - the tau probe joins the per-cell index rows stream-static on
    *    the computed cell and counts matches with a row-local
    *    filter+size over the cell's vector array — the same
    *    integer-exact predicate, in pure BIGINT HOF arithmetic
    *    (products <= 127^2, dims <= 64: every sum is exact).
    *
    * Zero state, append mode; output (vec_id, cell, n_dup_index, kept)
    * equals [[SemDedup.probeIndex]] row for row on the same arrivals
    * (EmbeddingStreamSpec pins it).
    *
    * `maxPlanVecsPerCell` bounds the per-cell index array (each is
    * shipped to every task probing that cell and scanned per arrival).
    * An over-cap cell is a contract violation, not a tuning knob —
    * grow `nlist` on the next batch refresh (cell population ~N/nlist)
    * or route the backlog through the batch probe.
    */
  def semDedupScreened(
      emb: DataFrame,
      keptIdx: DataFrame,
      centroids: DataFrame,
      tauNum: Int = SemDedup.TauNum,
      tauDen: Int = SemDedup.TauDen,
      maxPlanVecsPerCell: Int = 4096): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      s"tau must be in (0, 1]: $tauNum/$tauDen")
    val n2 = tauNum.toLong * tauNum
    val d2 = tauDen.toLong * tauDen

    // Fail loudly on an empty centroid table (r16 ADVICE): the fold
    // below would assign cell = -1 to every arrival and the left join
    // would KEEP them all, while the spec-pinned batch twin
    // (SemDedup.probeIndex, itself require-guarded now) emits no rows —
    // a silent divergence in a degenerate case that is always a caller
    // bug (an index refresh that lost its centroids).
    require(!centroids.isEmpty,
      "semDedupScreened: empty centroid table — the stream screen " +
        "needs the same persisted centroids the kept-vector index was " +
        "built with")

    // The centroid table as one broadcast row: cell-ascending struct
    // array (struct ordering is lexicographic on the leading field).
    val centsRow = centroids
      .select(struct(
        col("cell"),
        col("cent_emb").cast("array<bigint>").as("cq"),
        col("cent_norm").as("cnrm")).as("__c"))
      .agg(sort_array(collect_list(col("__c"))).as("__cents"))
      .withColumn("__k", lit(1))
      .localCheckpoint(true)

    // Per-cell index rows: (cell, __vecs) with the codes in BIGINT so
    // the probe arithmetic below is integer-exact end to end.
    val keptRow = keptIdx
      .select(col("cell"), struct(
        col("q").cast("array<bigint>").as("qi"),
        col("nsq").as("ni")).as("__v"))
      .groupBy(col("cell"))
      .agg(collect_list(col("__v")).as("__vecs"))
      .localCheckpoint(true)
    val maxCell = keptRow.select(coalesce(max(size(col("__vecs"))), lit(0)))
      .head().getInt(0)
    require(maxCell <= maxPlanVecsPerCell,
      s"hottest index cell holds $maxCell vectors > maxPlanVecsPerCell=" +
        s"$maxPlanVecsPerCell; a probe array that large would weigh on " +
        "every arrival in that cell — refresh the batch index with a " +
        "larger nlist, or screen this backlog with SemDedup.probeIndex")

    val quantized = graft.operators.Quantize.int8(emb, "vec_id", "embedding")
      .filter(col("scale") > 0)
      .select(col("vec_id"), col("qvec"))
      .withColumn("nsq",
        expr("aggregate(zip_with(qvec, qvec, (x, y) -> x * y), " +
          "CAST(0 AS BIGINT), (s, p) -> s + p)"))

    val assigned = quantized
      .withColumn("__k", lit(1))
      .join(broadcast(centsRow), Seq("__k"))
      .withColumn("__scored",
        expr("transform(__cents, c -> named_struct(" +
          "'cell', c.cell, " +
          "'cs', CAST(aggregate(zip_with(qvec, c.cq, (x, y) -> x * y), " +
          "CAST(0 AS BIGINT), (s, p) -> s + p) AS DOUBLE) " +
          "/ (sqrt(CAST(nsq AS DOUBLE)) * c.cnrm)))"))
      .withColumn("cell",
        expr("aggregate(__scored, " +
          "named_struct('cell', CAST(-1 AS BIGINT), " +
          "'cs', CAST('-Infinity' AS DOUBLE)), " +
          "(acc, c) -> IF(c.cs > acc.cs, c, acc)).cell"))
      .select(col("vec_id"), col("qvec"), col("nsq"), col("cell"))

    assigned
      .join(broadcast(keptRow), Seq("cell"), "left")
      .withColumn("n_dup_index",
        coalesce(
          expr("CAST(size(filter(transform(__vecs, v -> named_struct(" +
            "'d', aggregate(zip_with(qvec, v.qi, (x, y) -> x * y), " +
            "CAST(0 AS BIGINT), (s, p) -> s + p), " +
            "'ni', v.ni)), " +
            s"t -> t.d > 0 AND $d2 * t.d * t.d >= $n2 * t.ni * nsq)) " +
            "AS BIGINT)"),
          lit(0L)))
      .select(
        col("vec_id"), col("cell"), col("n_dup_index"),
        (col("n_dup_index") === 0).as("kept"))
  }
}
