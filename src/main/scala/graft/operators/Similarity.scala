package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `ArrayType(FloatType)` column.
  *
  * Numeric contract: every dot product is an explicitly sequential fold in
  * DOUBLE over the float elements (`aggregate(zip_with(...))`), which is
  * bit-identical to DuckDB's `list_sum(list_transform(list_zip(...)))` —
  * verified — so cosine scores oracle-compare exactly. Do NOT swap in a
  * tree-reduction or SIMD path without re-deriving the oracle.
  *
  * Scale: brute-force top-k is a broadcast nested loop — queries broadcast,
  * corpus streams, per-partition top-k via window. That is the right
  * baseline at any corpus size when the query set is small. The LSH variant
  * buckets on random-hyperplane sign bits so the join only compares
  * bucket-colocated vectors: the shuffle carries (bucket, vector) once,
  * and bucket fan-out is the recall/cost knob.
  */
object Similarity {

  /** Sequential-in-DOUBLE dot product of two float-array columns —
    * a codegen'd Catalyst expression (see [[graft.functions.DotProductFF]]);
    * bit-identical to the `aggregate(zip_with(...))` fold it replaced.
    */
  def dotD(a: Column, b: Column): Column =
    graft.functions.DotProductFF.dotFF(a, b)

  /** L2 norm, same fold discipline. */
  def normD(a: Column): Column = sqrt(dotD(a, a))

  /** Brute-force cosine top-k: for each query vector (small set — gets
    * broadcast), the k nearest corpus vectors. Deterministic tiebreak on
    * neighbor id.
    */
  def cosineTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      k: Int): DataFrame = {
    graft.functions.DotProductFF.register(corpus.sparkSession)
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      col(embCol).as("c_emb"),
      normD(col(embCol)).as("c_norm"))
    val q = queries.select(
      col(idCol).as("q_id"),
      col(embCol).as("q_emb"),
      normD(col(embCol)).as("q_norm"))
    val scored = c
      .crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("q_id"))
      .select(
        col("q_id"), col("neighbor_id"),
        (dotD(col("c_emb"), col("q_emb")) / (col("c_norm") * col("q_norm"))).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic random-hyperplane family for sign-bit LSH: plane weights
    * in [-1, 1] derived from an md5-seeded integer grid, materialized as
    * literals on both the Spark and oracle sides (same constants, exact
    * float semantics).
    */
  def hyperplanes(numPlanes: Int, dim: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(numPlanes, dim) { (j, d) =>
      val hex = md.digest(s"$j:$d".getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      ((java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L) / 1000.0
    }
  }

  /** Sign-bit LSH bucket id for an embedding column: bit j set iff
    * dot(plane_j, v) > 0. `numPlanes` bits -> 2^numPlanes buckets.
    */
  def lshBucket(embCol: Column, planes: Array[Array[Double]]): Column = {
    val terms = planes.zipWithIndex.map { case (p, j) =>
      val planeCol = array(p.toIndexedSeq.map(lit): _*)
      when(dotD(embCol, planeCol) > 0.0, lit(1L << j)).otherwise(lit(0L))
    }
    terms.reduce(_ + _).as("bucket")
  }

  /** LSH-bucketed approximate top-k: compare only bucket-colocated
    * (query, corpus) pairs. Recall < 1 by construction; rank/tiebreak
    * deterministic. At scale, corpus buckets are the shuffle key and each
    * bucket joins locally.
    */
  def cosineTopKLsh(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      numPlanes: Int = 8,
      dim: Int = 64): DataFrame = {
    graft.functions.DotProductFF.register(corpus.sparkSession)
    val planes = hyperplanes(numPlanes, dim)
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      col(embCol).as("c_emb"),
      normD(col(embCol)).as("c_norm"),
      lshBucket(col(embCol), planes).as("bucket"))
    val q = queries.select(
      col(idCol).as("q_id"),
      col(embCol).as("q_emb"),
      normD(col(embCol)).as("q_norm"),
      lshBucket(col(embCol), planes).as("bucket"))
    val scored = c
      .join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("q_id"))
      .select(
        col("q_id"), col("neighbor_id"),
        (dotD(col("c_emb"), col("q_emb")) / (col("c_norm") * col("q_norm"))).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Recall@k evaluation of an approximate ANN result against the exact
    * one: per query, the fraction of the true top-k the approximate
    * method returned — THE quality number an ANN index is tuned by
    * (recall-per-nprobe / recall-per-band curves come from sweeping the
    * index knob over this).
    *
    * Inputs are two (q_id, neighbor_id, ...) frames as produced by
    * [[cosineTopK]] / [[cosineTopKLsh]] / [[cosineTopKIvf]]. Both are
    * top-k-sized — queries x k rows, corpus-size-INDEPENDENT — so the
    * evaluation join costs nothing next to the searches themselves.
    * n_exact is the per-query truth size (< k when the corpus is small),
    * so recall is well-defined at any corpus size.
    */
  /** The exact fp32 rerank stage shared by every two-stage retriever
    * (int8 coarse — [[Quantize.twoStageTopK]] — and the JL-projection
    * coarse): re-score a (q_id, neighbor_id) shortlist at exact cosine
    * and keep the top `k` per query. The corpus joins the BROADCAST
    * shortlist BEFORE the fp32 norm derives, so the fold runs on the
    * queries x shortlist survivors only — never corpus-wide.
    */
  def rerankExactTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      coarse: DataFrame,
      k: Int): DataFrame = {
    graft.functions.DotProductFF.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("__c_emb"))
      .join(broadcast(coarse.select(col("q_id"), col("neighbor_id"))),
        Seq("neighbor_id"))
      .withColumn("__c_norm", normD(col("__c_emb")))
    val q = queries.select(col(idCol).as("q_id"),
      col(embCol).as("__q_emb"), normD(col(embCol)).as("__q_norm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(q), Seq("q_id"))
      .select(col("q_id"), col("neighbor_id"),
        (dotD(col("__c_emb"), col("__q_emb")) /
          (col("__c_norm") * col("__q_norm"))).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Position-sensitive retrieval evidence per query: where the TRUE
    * nearest neighbor (the exact rank-1 row of `exact`) lands in the
    * approximate top-k — the 1-indexed rank and its reciprocal, 0 when
    * the approximate list misses it entirely. Complements
    * [[topKRecall]]: recall@k credits position k like position 1; the
    * reciprocal rank is what moves when an index returns the right SET
    * in the wrong ORDER (the serving-quality number for retrieval
    * pipelines, whose downstream consumer reads results top-first —
    * its mean over queries is MRR). `rank_approx` and the rank itself
    * are exact integers; `rr` is their one double quotient.
    *
    * Inputs as produced by [[cosineTopK]] (exact, any k >= 1) and an
    * approximate variant. Both are queries x k rows — the evaluation
    * join is corpus-size-independent, like [[topKRecall]]'s.
    */
  def nnReciprocalRank(exact: DataFrame, approx: DataFrame): DataFrame = {
    val ex = exact.filter(col("rank") === 1)
      .select(col("q_id"), col("neighbor_id").as("nn_id"))
    val ap = approx.select(
      col("q_id").as("__aq"), col("neighbor_id"), col("rank"))
    ex.join(ap,
        ex("q_id") === col("__aq") && col("nn_id") === col("neighbor_id"),
        "left")
      .select(
        ex("q_id"), col("nn_id"),
        coalesce(col("rank").cast("long"), lit(0L)).as("rank_approx"),
        when(col("rank").isNull, lit(0.0))
          .otherwise(lit(1.0) / col("rank").cast("double")).as("rr"))
  }

  def topKRecall(exact: DataFrame, approx: DataFrame): DataFrame =
    exact.select(col("q_id"), col("neighbor_id"))
      .join(
        approx.select(col("q_id"), col("neighbor_id"), lit(1L).as("__hit")),
        Seq("q_id", "neighbor_id"), "left")
      .groupBy("q_id")
      .agg(
        count(lit(1)).as("n_exact"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .select(
        col("q_id"), col("n_exact"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_exact").cast("double")).as("recall"))

  /** Deterministic coarse quantizer: the first `nlist` corpus vectors
    * stand in for trained centroids — the oracle-friendly default
    * ([[trainedCentroids]] is the production quantizer; every downstream
    * plan shape is identical either way).
    */
  def centroids(corpus: DataFrame, idCol: String, embCol: String, nlist: Int): DataFrame =
    corpus
      .filter(col(idCol) < nlist)
      .select(col(idCol).as("cell"), col(embCol).as("cent_emb"),
        normD(col(embCol)).as("cent_norm"))

  /** REAL trained coarse quantizer: Spark ML k-means (seeded, so
    * reproducible on a fixed layout) over the embedding column; centers
    * come back as the same (cell, cent_emb, cent_norm) shape as
    * [[centroids]], cast to the corpus's float element type. Training cost
    * is one cached pass per iteration over features only — at index-build
    * time, never per probe. Centroid QUALITY only moves recall-per-nprobe;
    * every correctness property downstream is centroid-independent (an
    * exhaustive probe with nprobe = nlist returns exactly the brute-force
    * top-k whatever the centers are — pinned by q85's oracle).
    */
  def trainedCentroids(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      nlist: Int,
      seed: Long = 42L,
      maxIter: Int = 20): DataFrame = {
    require(nlist >= 1, s"nlist must be >= 1: $nlist")
    val spark = corpus.sparkSession
    graft.functions.DotProductFF.register(spark)
    val feats = corpus.select(
      org.apache.spark.ml.functions.array_to_vector(
        col(embCol).cast("array<double>")).as("features"))
    // nlist = 1 short-circuits to the exact fixed point: one-cluster
    // k-means converges to the corpus mean in a single step whatever
    // the init (the unique minimizer of within-cluster SSE), and Spark
    // ML's KMeans refuses k < 2 — so the closed form IS the trained
    // result. This is the exhaustive-cell geometry q216 pins with an
    // exact centroid-independent oracle (the q85 device). One bounded
    // driver-side row, the same scalar class as `clusterCenters`.
    val centers: IndexedSeq[Array[Double]] =
      if (nlist == 1)
        IndexedSeq(feats
          .select(org.apache.spark.ml.stat.Summarizer.mean(col("features")))
          .head().getAs[org.apache.spark.ml.linalg.Vector](0).toArray)
      else {
        val model = new org.apache.spark.ml.clustering.KMeans()
          .setK(nlist).setSeed(seed).setMaxIter(maxIter)
          .fit(feats)
        model.clusterCenters.toIndexedSeq.map(_.toArray)
      }
    val rows = centers.zipWithIndex.map { case (v, i) =>
      (i.toLong, v.map(_.toFloat))
    }
    import spark.implicits._
    rows.toDF("cell", "cent_emb")
      .select(col("cell"), col("cent_emb"), normD(col("cent_emb")).as("cent_norm"))
  }

  /** Assign each vector to its `keep` nearest centroid cells (broadcast
    * centroid pass + per-vector window). Output: (outId, emb, nrm, cell).
    */
  def assignCells(
      df: DataFrame,
      cents: DataFrame,
      idCol: String,
      embCol: String,
      outId: String,
      keep: Int): DataFrame = {
    graft.functions.DotProductFF.register(df.sparkSession)
    val scored = df
      .select(col(idCol).as(outId), col(embCol).as("emb"), normD(col(embCol)).as("nrm"))
      .crossJoin(broadcast(cents))
      .select(col(outId), col("emb"), col("nrm"), col("cell"),
        (dotD(col("emb"), col("cent_emb")) / (col("nrm") * col("cent_norm"))).as("csim"))
    val w = Window.partitionBy(outId).orderBy(col("csim").desc, col("cell"))
    scored.withColumn("cr", row_number().over(w)).filter(col("cr") <= keep)
      .select(col(outId), col("emb"), col("nrm"), col("cell"))
  }

  def cosineTopKIvf(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 2,
      centroidsOpt: Option[DataFrame] = None): DataFrame = {
    graft.functions.DotProductFF.register(corpus.sparkSession)
    val cents = centroidsOpt.getOrElse(centroids(corpus, idCol, embCol, nlist))
    val corpusCells = assignCells(corpus, cents, idCol, embCol, "neighbor_id", 1)
    val queryCells = assignCells(queries, cents, idCol, embCol, "q_id", nprobe)
      .withColumnRenamed("emb", "q_emb").withColumnRenamed("nrm", "q_nrm")

    val scored = corpusCells
      .join(queryCells, Seq("cell"))
      .filter(col("neighbor_id") =!= col("q_id"))
      .select(col("q_id"), col("neighbor_id"),
        (dotD(col("emb"), col("q_emb")) / (col("nrm") * col("q_nrm"))).as("sim"))
      .dropDuplicates("q_id", "neighbor_id") // a pair can meet in >1 probed cell
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Production embedding near-dup pairs: banded sign-bit LSH. `tables`
    * independent hash tables of `bitsPerTable` hyperplane sign bits each;
    * a pair is a candidate iff it shares a bucket in ANY table (recall
    * 1 - (1 - p^b)^L for per-plane agreement probability p), and the exact
    * double-fold cosine then verifies against `threshold`, so precision
    * is 1 — only recall is approximate. The self-join shuffles
    * (table, bucket)-keyed rows — L small rows per vector — and never
    * materializes a cross product; hot buckets are split by AQE skew
    * handling. This replaces the bounded [[cosineDupPairs]] cross join as
    * the at-scale path; that one remains the verification-scale oracle.
    */
  def cosineDupPairsLsh(
      df: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      tables: Int = 4,
      bitsPerTable: Int = 4,
      dim: Int = 64): DataFrame = {
    graft.functions.DotProductFF.register(df.sparkSession)
    val planes = hyperplanes(tables * bitsPerTable, dim)
    val e = df.select(col(idCol), col(embCol), normD(col(embCol)).as("norm"))
    val tableBuckets = (0 until tables).map { t =>
      val slice = planes.slice(t * bitsPerTable, (t + 1) * bitsPerTable)
      struct(lit(t).as("tbl"), lshBucket(col(embCol), slice).as("bucket"))
    }
    val bucketed = e
      .select(col(idCol), col(embCol), col("norm"),
        explode(array(tableBuckets: _*)).as("tb"))
      .select(col(idCol), col(embCol), col("norm"),
        col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val a = bucketed.select(col("tbl"), col("bucket"),
      col(idCol).as("vec_a"), col(embCol).as("ea"), col("norm").as("na"))
    val b = bucketed.select(col("tbl"), col("bucket"),
      col(idCol).as("vec_b"), col(embCol).as("eb"), col("norm").as("nb"))
    a.join(b, Seq("tbl", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        (dotD(col("ea"), col("eb")) / (col("na") * col("nb"))).as("sim"))
      .filter(col("sim") >= threshold)
      // A pair can share a bucket in several tables; sim is a deterministic
      // function of the pair, so dedup on ids alone is value-stable.
      .dropDuplicates("vec_a", "vec_b")
  }

  /** Contrastive (anchor, positive, hard-negative) triplet mining —
    * training data FOR the embedding model itself, the missing face of
    * the similarity family: near-dup pairs become positives, and the
    * "close but not duplicate" band becomes hard negatives (the pairs
    * that actually move a contrastive loss; random negatives are
    * trivially separable at scale).
    *
    * Candidates come from the SAME banded sign-bit LSH family as
    * [[cosineDupPairsLsh]] mined at the lower `negLo` threshold, then
    * symmetrized so each pair serves both endpoints as anchors. Per
    * anchor: positive = highest-sim candidate with sim >= posThreshold;
    * hard negative = highest-sim candidate strictly below it (the
    * hardest), both tiebroken on min neighbor id, so the output is
    * deterministic (sims are exact double folds). Anchors lacking
    * either side drop — a triplet needs both.
    *
    * Scale shape: no cross product anywhere — candidates are the
    * (table, bucket) self-join; the per-anchor argmax is a rank<=1
    * window that Spark executes with a WindowGroupLimit partial limit
    * before the anchor-keyed shuffle, so the exchanged stream is
    * near-one-row-per-anchor, not the candidate stream. Recall of the
    * positive side is the banding knob (as q83); the negative side only
    * needs A hard negative, not THE globally hardest, so LSH
    * under-recall there changes which valid negative is picked, never
    * validity — exactly the tolerance contrastive mining has in
    * production (hard negatives are sampled from ANN shortlists).
    */
  def contrastiveTriplets(
      df: DataFrame,
      idCol: String,
      embCol: String,
      posThreshold: Double,
      negLo: Double,
      tables: Int = 4,
      bitsPerTable: Int = 4,
      dim: Int = 64): DataFrame = {
    require(negLo < posThreshold,
      s"negative band [$negLo, $posThreshold) is empty")
    val cand = cosineDupPairsLsh(
      df, idCol, embCol, threshold = negLo, tables, bitsPerTable, dim)
    val sym = cand
      .select(col("vec_a").as("anchor_id"), col("vec_b").as("cand_id"), col("sim"))
      .unionByName(cand
        .select(col("vec_b").as("anchor_id"), col("vec_a").as("cand_id"), col("sim")))
    val w = Window.partitionBy("anchor_id").orderBy(col("sim").desc, col("cand_id"))
    def top1(in: DataFrame): DataFrame =
      in.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
    val pos = top1(sym.filter(col("sim") >= posThreshold))
      .select(col("anchor_id"), col("cand_id").as("pos_id"), col("sim").as("pos_sim"))
    val neg = top1(sym.filter(col("sim") < posThreshold))
      .select(col("anchor_id"), col("cand_id").as("neg_id"), col("sim").as("neg_sim"))
    pos.join(neg, Seq("anchor_id"))
  }

  /** Embedding-cosine near-dup pairs above a similarity threshold within a
    * bounded id range (verification scale; production pairs come from LSH
    * buckets instead of the cross join — see [[cosineDupPairsLsh]]).
    */
  /** Per-label centroid and per-dimension variance of an embedding
    * column — class prototypes plus intra-class spread, the label-quality
    * audit (a label whose variance rivals the between-class spread is
    * noisy; a centroid drifting between corpus snapshots flags upstream
    * embedding-model change).
    *
    * DETERMINISM: floats widen to double exactly, scaling by 2^30 is a
    * pure exponent shift (also exact), and floor() of that product is the
    * same integer in every engine — so the per-cell accumulation is an
    * exact BIGINT sum under any partitioning/order, and the only floating
    * ops are the final fixed-shape divisions. (A raw double sum would be
    * order-dependent; a float->DECIMAL cast rounds differently across
    * engines; and DuckDB's double->BIGINT cast ROUNDS where Spark's
    * truncates, which is why the floor is explicit.)
    *
    * Scale shape: one narrow posexplode to (label, dim, v) and ONE
    * map-side-combined shuffle onto the (labels x dims) key space —
    * output size is independent of corpus size, so the audit runs at any
    * scale the scan runs.
    */
  def labelCentroids(
      df: DataFrame,
      labelCol: String,
      embCol: String): DataFrame = {
    val scale = 1073741824.0 // 2^30
    val vd = col("__lc_v").cast("double")
    df.select(col(labelCol).as("label"),
        posexplode(col(embCol)).as(Seq("dim", "__lc_v")))
      .select(col("label"), col("dim").cast("long").as("dim"),
        floor(vd * scale).cast("long").as("__lc_s1"),
        floor(vd * vd * scale).cast("long").as("__lc_s2"))
      .groupBy("label", "dim")
      .agg(
        count(lit(1)).as("n_vecs"),
        sum("__lc_s1").as("__s1"),
        sum("__lc_s2").as("__s2"))
      .select(
        col("label"), col("dim"), col("n_vecs"),
        (col("__s1").cast("double") / (col("n_vecs").cast("double") * scale))
          .as("centroid"),
        (col("__s2").cast("double") / (col("n_vecs").cast("double") * scale) -
          (col("__s1").cast("double") / (col("n_vecs").cast("double") * scale)) *
            (col("__s1").cast("double") / (col("n_vecs").cast("double") * scale)))
          .as("variance"))
  }

  def cosineDupPairs(
      df: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      maxId: Long): DataFrame = {
    graft.functions.DotProductFF.register(df.sparkSession)
    val e = df
      .filter(col(idCol) < maxId)
      .select(col(idCol), col(embCol), normD(col(embCol)).as("norm"))
    val a = e.select(col(idCol).as("vec_a"), col(embCol).as("ea"), col("norm").as("na"))
    val b = e.select(col(idCol).as("vec_b"), col(embCol).as("eb"), col("norm").as("nb"))
    a.crossJoin(b)
      .filter(col("vec_a") < col("vec_b"))
      .select(
        col("vec_a"), col("vec_b"),
        (dotD(col("ea"), col("eb")) / (col("na") * col("nb"))).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
