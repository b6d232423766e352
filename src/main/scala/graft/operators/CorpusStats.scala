package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level token statistics for vocabulary induction and curation
  * ordering — the counting passes a tokenizer-training or data-mixing
  * pipeline runs over the whole corpus.
  */
object CorpusStats {

  /** Largest corpus token count for which [[sourceDrift]]'s integer TV
    * sum is exact in Long: c <= ns <= n bounds every product by n^2 and
    * the per-source total by 2*n^2, so n <= 2e9 keeps 2*n^2 < 2^63.
    */
  val MaxDriftTokens: Long = 2000000000L

  /** Adjacent-token pair counts, the BPE/WordPiece merge-selection inner
    * loop: every consecutive whitespace-token pair, counted corpus-wide,
    * top `k` by count with a deterministic lexicographic tiebreak.
    *
    * Scale shape: the pair explode is narrow; the count shuffles once on
    * the pair with full map-side combine; the top-k plans as
    * TakeOrderedAndProject (per-partition top-k, k-row driver merge) —
    * never a global sort.
    */
  def pairCounts(
      docs: DataFrame,
      textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val toks = TextAnalysis.wsTokens(col(textCol))
    val m = size(toks) - 1
    val pairs = zip_with(
      slice(toks, lit(1), m), slice(toks, lit(2), m),
      (a, b) => concat_ws(" ", a, b))
    docs.select(explode(pairs).as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)
  }

  /** Collocation mining by PMI-style lift: adjacent token pairs whose
    * observed frequency beats independence by `liftFloor`x —
    * lift = p(xy) / (p(x) p(y)) = (n_xy * N^2) / (T * n_x * n_y) with N
    * total tokens and T total bigram slots. The inner-loop vocabulary
    * induction signal BPE's raw pair counts ([[pairCounts]]) miss:
    * "of the" tops any count list but has lift ~ 1, while a true
    * multiword term is rare-but-bound. The lift COMPARISON runs in
    * exact DECIMAL(38,0) (the N^2-sized products overflow int64 on big
    * corpora; the oracle mirrors with HUGEINT) so the emitted flag is
    * engine-exact — counts ride along and the exact rational lift is
    * derivable offline.
    *
    * Scale shape: bigram explode is narrow; ONE map-side-combined
    * shuffle on the pair; the vocabulary-sized unigram table joins back
    * token-keyed (broadcast while it fits, AQE decides above that), and
    * the two 1-row totals broadcast — the corpus never reshuffles.
    */
  def collocationLift(
      docs: DataFrame,
      textCol: String,
      minCount: Long,
      liftFloor: Int): DataFrame = {
    require(minCount >= 1 && liftFloor >= 1)
    val toks = TextAnalysis.wsTokens(col(textCol))
    val m = size(toks) - 1
    val pairs = zip_with(
      slice(toks, lit(1), m), slice(toks, lit(2), m),
      (a, b) => struct(a.as("x"), b.as("y")))
    val bi = docs.select(explode(pairs).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("n_xy"))
    val uni = docs.select(explode(toks).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
    val totals = uni.agg(sum(col("n")).as("n_total"))
      .crossJoin(broadcast(bi.agg(sum(col("n_xy")).as("t_pairs"))))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    bi.filter(col("n_xy") >= minCount)
      .join(uni.select(col("tok").as("x"), col("n").as("n_x")), Seq("x"))
      .join(uni.select(col("tok").as("y"), col("n").as("n_y")), Seq("y"))
      .crossJoin(broadcast(totals))
      .select(col("x"), col("y"), col("n_xy"), col("n_x"), col("n_y"),
        col("n_total"), col("t_pairs"),
        (dec(col("n_xy")) * dec(col("n_total")) * dec(col("n_total")) >
          dec(lit(liftFloor)) * dec(col("t_pairs")) * dec(col("n_x")) * dec(col("n_y")))
          .as("high_lift"))
  }

  /** Per-document n-gram novelty: the fraction of a document's distinct
    * n-grams whose FIRST occurrence (by ascending doc id) is this
    * document — the content-growth signal curation uses to order or
    * prune sources that stop contributing new text.
    *
    * Scale shape: the gram stream shuffles ONCE (the min-doc aggregate,
    * map-side combined); novel counts fall straight out of that
    * aggregate's output re-keyed by the winning doc, and per-doc totals
    * are a narrow doc-keyed count — so the join that assembles the
    * ratio is doc-sized on both sides, never a second pass over the
    * gram stream. Docs with fewer than `n` tokens have no grams and are
    * absent. The novelty ratio is an exact int/int double division —
    * bit-identical across engines.
    */
  def gramNovelty(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    val grams = docs.select(
      col(idCol).as("doc_id"),
      explode(array_distinct(
        TextAnalysis.tokenNgrams(TextAnalysis.wsTokens(col(textCol)), n)))
        .as("gram"))
    val novel = grams
      .groupBy("gram").agg(min("doc_id").as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
    val totals = grams
      .groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    totals.join(novel, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_novel"))
      .select(
        col("doc_id"), col("n_grams"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_grams")).as("novelty"))
  }

  /** Sketch-based pairwise source resemblance: the KMV Jaccard estimate
    * between every source pair, computed ENTIRELY from per-source
    * k-minimum-values sketches ([[graft.functions.KMinSketch]]) — the
    * at-scale face of q106's exact overlap matrix. Document bodies never
    * pair up: the corpus contributes one <= k-long sketch per source
    * (map-side-combined), and everything pairwise happens on the
    * sources-sized sketch table. The estimator is the classic KMV
    * resemblance (Bar-Yossef et al.): take the k smallest of the merged
    * sketches — exactly kmin_k(A union B), since each side's sketch
    * contains every union-member below its own kth min — and count how
    * many live in BOTH input sketches; J ~ n_both / |merged|. All
    * integer counts; the single division is small-int-exact.
    *
    * The pair former is a bounded nested-loop join BY DESIGN: the sketch
    * table has one row per source, so pairs = sources^2 / 2 stays tiny
    * at any corpus size (the corpus-size-dependent work is all in the
    * sketch aggregate).
    */
  def kmvSourceResemblance(
      docs: DataFrame,
      sourceCol: String,
      textCol: String,
      k: Int = 8): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val sk = docs
      .select(col(sourceCol).as("source"),
        TextAnalysis.portableHash32(col(textCol)).as("__h"))
      .groupBy("source")
      .agg(graft.functions.KMinSketch.kmin(col("__h"), k).as("kmin"))
    val a = sk.select(col("source").as("source_a"), col("kmin").as("__ka"))
    val b = sk.select(col("source").as("source_b"), col("kmin").as("__kb"))
    a.join(b, col("source_a") < col("source_b"))
      .withColumn("__ku",
        expr(s"slice(array_sort(array_distinct(concat(__ka, __kb))), 1, $k)"))
      .withColumn("n_union", size(col("__ku")).cast("long"))
      .withColumn("n_both", expr(
        "CAST(size(filter(__ku, x -> array_contains(__ka, x) AND array_contains(__kb, x))) AS BIGINT)"))
      .select(
        col("source_a"), col("source_b"), col("n_union"), col("n_both"),
        (col("n_both").cast("double") / col("n_union").cast("double"))
          .as("jaccard_est"))
  }

  /** Vocabulary coverage / out-of-vocabulary rate: per document, the
    * fraction of token INSTANCES outside the corpus's top-`vocabSize`
    * tokens — the audit run before committing a tokenizer vocabulary
    * (high OOV mass = the vocab under-fits the corpus mix).
    *
    * Shape: one map-side-combined token count, a TakeOrderedAndProject
    * top-V (deterministic tiebreak: count DESC, token ASC — V rows on
    * the driver, never a global sort), broadcast back over the token
    * stream, and ONE doc-keyed shuffle for the per-doc rollup. The
    * vocabulary is corpus-derived but bounded by V, so the broadcast is
    * fixed-size at any corpus scale.
    */
  def oovRate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive: $vocabSize")
    val tok = docs.select(col(idCol),
      explode(TextAnalysis.wsTokens(col(textCol))).as("__t"))
    val vocab = tok.groupBy("__t").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__t"))
      .limit(vocabSize)
      .select(col("__t"), lit(true).as("__in_vocab"))
    tok.join(broadcast(vocab), Seq("__t"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab"), 0L).otherwise(1L)).as("n_oov"))
      .select(
        col(idCol), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .as("oov_ratio"))
  }

  /** Top-V vocabulary coverage curve: for each of the `vocabSize` most
    * frequent tokens (count DESC, token ASC — the [[oovRate]] tiebreak),
    * the cumulative fraction of corpus token MASS a vocabulary truncated
    * at that rank covers — the curve a tokenizer design reads to CHOOSE
    * V, where [[oovRate]] audits one already-chosen V. Returns
    * (rank, tok, cnt, cum_cnt, coverage).
    *
    * Shape: one map-side-combined token count; the corpus total reduces
    * FROM the counts table (the [[sourceDrift]] discipline — no second
    * corpus pass); top-V plans as TakeOrderedAndProject; the cumulative
    * sum is a single-partition window over AT MOST V rows — bounded by
    * the parameter, never by the corpus, which is what makes the
    * one-task window acceptable here (the ShardedPrefix rule bars
    * corpus-sized single-task windows, not V-sized ones). Integer
    * cumulative mass; the one division is final.
    */
  def vocabCoverage(
      docs: DataFrame,
      textCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive: $vocabSize")
    val counts = docs
      .select(explode(TextAnalysis.wsTokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    // The total CANNOT reduce from `counts` here: counts is referenced
    // by the top-V branch already, and a second reference re-expands the
    // whole explode+aggregate subtree (the q108 plan lesson). A narrow
    // size-sum over the raw scan costs no explode and no exchange — the
    // second corpus pass is scan-bandwidth only.
    val total = docs
      .select(size(TextAnalysis.wsTokens(col(textCol))).as("__n"))
      .agg(sum("__n").cast("long").as("__total"))
    val top = counts.orderBy(col("cnt").desc, col("tok")).limit(vocabSize)
    val ord = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("tok"))
    top
      .withColumn("rank", row_number().over(ord).cast("long"))
      .withColumn("cum_cnt", sum("cnt").over(
        ord.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(total))
      .select(
        col("rank"), col("tok"), col("cnt"), col("cum_cnt"),
        (col("cum_cnt").cast("double") / col("__total").cast("double"))
          .as("coverage"))
  }

  /** Per-document token rarity: the sum over token INSTANCES of the
    * integer inverse frequency N div c_t (N = total corpus tokens,
    * c_t = the token's corpus count) — a log-free surprisal proxy (the
    * [[graft.queries.Q]] determinism contract forbids libm: ln differs
    * in the last ulp across engines and a sum of logs is
    * order-dependent, where this rational form is exact BIGINT under
    * any partitioning). High mean rarity = rare vocabulary — a
    * quality/novelty signal next to [[oovRate]], and its structural
    * complement: oovRate bounds its vocabulary at top-V so the join
    * side BROADCASTS, while rarity joins the token stream against the
    * FULL vocabulary — the honest unbounded-vocab shape, a hash
    * equi-join on the token (the count side map-side combined). When
    * even that token-keyed shuffle is too dear, the sketch swap is
    * in-repo: broadcast a [[CountMin]] matrix instead of the exact
    * count table — it never under-counts, so sketch rarity
    * under-estimates by a bounded colliding mass and the screen stays
    * conservative.
    *
    * Overflow: summand <= N, so a doc needs tokens_doc * N >= 2^63 to
    * wrap — beyond exabyte corpora; the corpus total rides a broadcast
    * 1-row frame.
    */
  def tokenRarity(
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(TextAnalysis.wsTokens(col(textCol))).as("__t"))
    val counts = tok.groupBy("__t").agg(count(lit(1)).as("__ct"))
    // the total reduces FROM the counts table (vocab-sized, reusing its
    // exchange) — the sourceDrift discipline; a tok.agg(count) here would
    // re-scan and re-explode the whole corpus just to count tokens
    val n = counts.agg(sum("__ct").as("__n_total"))
    tok.join(counts, Seq("__t"))
      .crossJoin(broadcast(n))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(expr("__n_total div __ct")).as("rarity_sum"))
      .select(
        col(idCol), col("n_tokens"), col("rarity_sum"),
        (col("rarity_sum").cast("double") / col("n_tokens").cast("double"))
          .as("mean_rarity"))
  }

  /** Cell-count cap for [[tokenRaritySketch]]'s plan-literal matrix —
    * the sketch is collected to the driver and baked into the plan (the
    * [[BloomScreen]] bounded-collect convention), so its size must be a
    * construction-time contract, not an input-dependent surprise.
    */
  val MaxPlanCells: Int = 1 << 16

  /** [[tokenRarity]]'s sketch swap, made real: per-document rarity with
    * the exact vocabulary-sized count table replaced by a count-min
    * matrix ([[CountMin]], same md5-salted hash family as q98) baked
    * into the plan as a dense literal. The exact form's one structural
    * cost at 100 TB is the token-keyed hash join of the token stream
    * against the FULL vocabulary; here the estimate is ROW-LOCAL — each
    * token instance hashes into its depth cells and takes the min of
    * depth literal-array lookups inside whole-stage codegen — so the
    * ONLY exchange left is the doc-keyed rollup. The corpus is scanned
    * twice (once to build the constant-size sketch, once to score);
    * nothing token-keyed ever shuffles.
    *
    * Conservatism contract (why the swap is safe for screening): CMS
    * never under-counts, so est >= c_t pointwise, so
    * N div est <= N div c_t summand for summand — sketch rarity is a
    * LOWER bound on exact rarity and a rarity-floor screen stays
    * conservative (it only ever keeps extra docs, never drops a doc the
    * exact score would keep). N itself is exact: every instance lands in
    * row 0 exactly once, so row 0's cell sum IS the corpus token count.
    *
    * Determinism: the matrix is deterministic (md5 hashes), every
    * aggregate is an integer SUM/COUNT, and the one division is final —
    * the oracle rebuilds matrix, estimates, and rarity bit for bit.
    */
  def tokenRaritySketch(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      depth: Int,
      width: Int): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(TextAnalysis.wsTokens(col(textCol))).as("__t"))
    // Bounded driver-side collect of the CONSTANT-size matrix (<= depth x
    // width cells by construction — enforced in densePlanMatrix): the
    // degenerate broadcast. A broadcast-join form would reference the
    // sketch aggregate depth times and Catalyst re-expands expression
    // subtrees per reference (the q108 lesson) — depth+1 corpus scans;
    // the literal keeps the probe a pure narrow projection.
    val dense = CountMin.densePlanMatrix(
      tok.select("__t"), "__t", depth, width, MaxPlanCells)
    val nTotal = dense(0).sum
    tok
      .withColumn("__est", CountMin.estimateExpr(dense, col("__t"), width))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(expr(s"${nTotal}L div __est")).as("rarity_sum"))
      .select(
        col(idCol), col("n_tokens"), col("rarity_sum"),
        (col("rarity_sum").cast("double") / col("n_tokens").cast("double"))
          .as("mean_rarity"))
  }

  /** Per-source unigram-distribution drift: the total-variation distance
    * between each source's token distribution and the whole corpus —
    * tv = 0.5 * sum_t |c_{s,t}/N_s - C_t/N| — the mixture-design
    * diagnostic (a source whose distribution walks away from the corpus
    * is changing character; a new crawl slice with high tv needs its own
    * weight).
    *
    * DETERMINISM + shape: the absolute-difference sum multiplies through
    * by N_s * N, so everything up to the final division is exact BIGINT:
    * sum_t |c_{s,t}*N - C_t*N_s| over tokens PRESENT in the source, plus
    * (N - sum_{t in s} C_t) * N_s for the absent tail (algebra: absent
    * tokens contribute C_t*N_s each) — no per-token join against the
    * full vocab x sources cross space. One shuffle builds the (source,
    * token) counts; global token counts reduce FROM that table (second
    * tiny shuffle on the token); the rollup is source-keyed. Long
    * arithmetic is exact while n <= [[MaxDriftTokens]] — enforced with a
    * raise_error guard on the broadcast total, not assumed — and a
    * 100 TB corpus runs the same plan with the sum in DOUBLE after the
    * exact-verification stage.
    */
  def sourceDrift(
      docs: DataFrame,
      sourceCol: String,
      textCol: String): DataFrame = {
    val tok = docs.select(
      col(sourceCol).as("source"),
      explode(TextAnalysis.wsTokens(col(textCol))).as("t"))
    val st = tok.groupBy("source", "t").agg(count(lit(1)).as("c"))
    val gt = st.groupBy("t").agg(sum("c").as("ct"))
    val totals = st.groupBy("source").agg(sum("c").as("ns"))
    // Fail-fast overflow guard (the Bm25/HdrSketch convention): every
    // product in the integer TV sum is bounded by n^2 and the summed
    // total by 2*n^2, so exactness holds while n <= 2e9. Past that the
    // Long math would wrap silently under non-ANSI arithmetic — raise on
    // the broadcast 1-row frame instead.
    val n = st.agg(sum("c").as("n"))
      .select(
        // a null total = empty corpus = legitimately empty result
        when(col("n").isNull || col("n") <= lit(MaxDriftTokens), col("n"))
          .otherwise(raise_error(concat(
            lit("CorpusStats.sourceDrift: corpus token count "),
            col("n").cast("string"),
            lit(s" exceeds the exact-Long TV-distance bound $MaxDriftTokens"))))
          .as("n"))
    st.join(gt, Seq("t"))
      .join(totals, Seq("source"))
      .crossJoin(broadcast(n))
      .groupBy("source")
      .agg(
        max(col("ns")).as("n_tokens_src"),
        sum(abs(col("c") * col("n") - col("ct") * col("ns"))).as("__present"),
        sum(col("ct")).as("__ct_present"),
        max(col("n")).as("__n"))
      .select(
        col("source"), col("n_tokens_src"),
        ((col("__present") +
          (col("__n") - col("__ct_present")) * col("n_tokens_src"))
          .cast("double") /
          (lit(2.0) * col("n_tokens_src").cast("double") * col("__n").cast("double")))
          .as("tv_distance"))
  }
}
