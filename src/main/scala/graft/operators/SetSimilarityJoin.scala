package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join with prefix filtering — the
  * no-false-negative counterpart of MinHash-LSH banding (Bayardo,
  * Ma & Srikant, "Scaling Up All Pairs Similarity Search", WWW'07;
  * Chaudhuri et al.'s SSJoin prefix filter): every pair with
  * Jaccard(A, B) >= t is emitted, with the exact intersection/union
  * sizes, no probabilistic recall caveat. LSH trades recall for a
  * smaller candidate set; this trades a (frequency-bounded) candidate
  * set for a guarantee — curation uses LSH for the bulk sweep and the
  * exact join where a miss is unacceptable (licensing/contamination
  * audits).
  *
  * Prefix-filter guarantee: order each document's distinct tokens by
  * ascending global document frequency (ties by token); with required
  * Jaccard t = num/den, any qualifying pair's intersection must hit the
  * first `n - ceil(t*n) + 1` tokens of EACH side (if it avoided A's
  * prefix, the overlap would fit in the suffix of ceil(t*n)-1 tokens,
  * but J >= t forces overlap >= t*|A| — contradiction). So joining
  * PREFIX tokens of one side against ALL tokens of the other loses
  * nothing; rare-first ordering makes prefix tokens the LOW-df ones,
  * which is what bounds the candidate volume (sum over prefix tokens of
  * df_prefix * df_all — hot boilerplate tokens never enter a prefix
  * until a doc is mostly boilerplate).
  *
  * Exactness discipline: the threshold is a RATIONAL (num/den) and the
  * accept test is integer cross-multiplication (den * inter >= num *
  * uni) — no floating-point threshold, so the emitted pair set is
  * bit-reproducible and the DuckDB oracle regenerates it by brute
  * force, which is precisely the no-false-negative proof at fixture
  * scale.
  *
  * Scale shape: token df is one map-side-combined agg; per-doc sorted
  * token arrays build in one doc-keyed agg (no vocabulary-wide window
  * — the global order is applied WITHIN each doc by sorting (df, tok)
  * structs); the candidate join is token-keyed equi; verification
  * touches only candidates, each verified with one array intersection
  * over the two (deduplicated) token arrays.
  */
object SetSimilarityJoin {

  /** (doc_id, tok) distinct-token stream. Zero-length tokens are
    * dropped: `split(trim(text))` emits a single empty-string
    * pseudo-token for blank/whitespace-only documents, which would make
    * every pair of blank docs "identical" at Jaccard/containment 1.0 —
    * a semantically meaningless audit pair. With the filter, blank docs
    * have no tokens and vanish from both sides of the join entirely
    * (the oracles apply the same filter, so the pair sets still match
    * row for row).
    */
  private def tokenStream(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(
        filter(TextAnalysis.wsTokens(col(textCol)), t => length(t) > 0))).as("tok"))

  /** All pairs (doc_a < doc_b) with Jaccard >= num/den over distinct
    * whitespace tokens. Output: doc_a, doc_b, inter, uni, jaccard.
    */
  def selfJoin(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      num: Int,
      den: Int): DataFrame = {
    require(num >= 1 && den >= 1 && num <= den, s"threshold must be in (0,1]: $num/$den")
    val toks = tokenStream(docs, idCol, textCol)
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    // per-doc token list in (df asc, tok asc) order — struct sort gives
    // the canonical global order without a vocabulary-wide window
    val sorted = toks.join(dfreq, Seq("tok"))
      .groupBy("doc_id")
      .agg(transform(
        sort_array(collect_list(struct(col("df"), col("tok")))),
        s => s.getField("tok")).as("ts"))
      .withColumn("n", size(col("ts")))
      // prefix length n - ceil(t*n) + 1 in pure integer arithmetic
      .withColumn("preflen",
        col("n") - expr(s"(n * $num + ${den - 1}) div $den").cast("int") + 1)
    // posexplode keeps the position so only prefix slots join
    val pref = sorted.select(col("doc_id"), posexplode(col("ts")).as(Seq("pos", "tok")),
        col("preflen"))
      .filter(col("pos") < col("preflen"))
      .select(col("doc_id").as("pd"), col("tok"))
    val candidates = pref
      .join(toks.select(col("doc_id").as("fd"), col("tok")), Seq("tok"))
      .filter(col("pd") =!= col("fd"))
      .select(least(col("pd"), col("fd")).as("doc_a"),
        greatest(col("pd"), col("fd")).as("doc_b"))
      .distinct()
    val sets = sorted.select(col("doc_id"), col("ts"), col("n"))
    candidates
      .join(sets.select(col("doc_id").as("doc_a"), col("ts").as("ta"), col("n").as("na")),
        Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("ts").as("tb"), col("n").as("nb")),
        Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("uni", (col("na") + col("nb")).cast("long") - col("inter"))
      .filter(col("inter") * den >= col("uni") * num)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("uni"),
        (col("inter").cast("double") / col("uni").cast("double")).as("jaccard"))
  }

  /** EXACT directional CONTAINMENT join: pairs (contained, container)
    * with |A ∩ B| / |A| >= num/den — the asymmetric cousin of
    * [[selfJoin]] that Jaccard cannot express (a 50-token excerpt
    * inside a 5000-token page has Jaccard ~ 0.01 but containment ~
    * 1.0). This is the quote/excerpt/partial-scrape detector: curation
    * uses it to trace fragments back to their source documents and to
    * catch near-total subsumption that span-level dedup misses when
    * tokens reorder. Same prefix-filter guarantee, applied on the
    * CONTAINED side only (inter >= t*|A| forces A's rare-first prefix
    * to intersect B), same rational-threshold exactness — the oracle
    * brute-forces all directed pairs, so the hash match is again the
    * no-miss proof.
    *
    * `maxDocFreq`: stop-gram cap — the [[Dedup.ngramJaccardPairs]]
    * scale-hygiene idiom. The prefix filter bounds candidates by df,
    * but a doc that is MOSTLY hot boilerplate admits hot tokens into
    * its prefix (the prefix must be n - ceil(t*n) + 1 of the doc's own
    * tokens; when it has fewer rare ones than that, hot ones fill the
    * gap) — worst case, a corpus of near-identical boilerplate
    * degenerates to all-pairs candidate volume, unavoidable by any
    * ordering because the TRUE qualifying-pair count is itself
    * quadratic there. With the cap set, tokens whose document
    * frequency exceeds it are removed from the REPRESENTATION before
    * anything else — consistently, from prefixes, candidate keys, and
    * the verification sets / |A| alike — so the result is EXACT
    * containment over the filtered token sets, and per-token candidate
    * fan-out is bounded: each surviving token contributes at most
    * df_prefix * df <= cap^2 candidate rows. Docs whose entire set is
    * boilerplate drop out (filtered set empty; 0/0 containment is
    * meaningless). Ubiquitous tokens carry no pair-discriminating
    * signal — containment driven by them is boilerplate coincidence,
    * not excerpting — so the cap is a quality filter as much as a
    * scale guard (spec-pinned: excerpt pairs sharing distinctive
    * tokens survive, boilerplate-only pairs drop). The hot-token set
    * is tiny by construction (> cap distinct docs each) and
    * broadcasts — one map-side anti-join, no extra shuffle.
    */
  def containmentJoin(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      num: Int,
      den: Int,
      maxDocFreq: Option[Int] = None): DataFrame = {
    require(num >= 1 && den >= 1 && num <= den, s"threshold must be in (0,1]: $num/$den")
    val rawToks = tokenStream(docs, idCol, textCol)
    val rawDf = rawToks.groupBy("tok").agg(count(lit(1)).as("df"))
    // One df agg serves both the hot-token screen and the ordering:
    // dropping whole tokens never changes another token's df, so the
    // surviving tokens' dfs are just the raw table filtered to the cap.
    val (toks, dfreq) = maxDocFreq match {
      case Some(cap) =>
        require(cap >= 1, s"maxDocFreq must be >= 1: $cap")
        (rawToks.join(broadcast(rawDf.filter(col("df") > cap).select("tok")),
          Seq("tok"), "left_anti"),
          rawDf.filter(col("df") <= cap))
      case None => (rawToks, rawDf)
    }
    val sorted = toks.join(dfreq, Seq("tok"))
      .groupBy("doc_id")
      .agg(transform(
        sort_array(collect_list(struct(col("df"), col("tok")))),
        s => s.getField("tok")).as("ts"))
      .withColumn("n", size(col("ts")))
      .withColumn("preflen",
        col("n") - expr(s"(n * $num + ${den - 1}) div $den").cast("int") + 1)
    val pref = sorted.select(col("doc_id"), posexplode(col("ts")).as(Seq("pos", "tok")),
        col("preflen"))
      .filter(col("pos") < col("preflen"))
      .select(col("doc_id").as("pd"), col("tok"))
    val candidates = pref
      .join(toks.select(col("doc_id").as("fd"), col("tok")), Seq("tok"))
      .filter(col("pd") =!= col("fd"))
      .select(col("pd").as("doc_a"), col("fd").as("doc_b"))
      .distinct()
    val sets = sorted.select(col("doc_id"), col("ts"), col("n"))
    candidates
      .join(sets.select(col("doc_id").as("doc_a"), col("ts").as("ta"), col("n").as("na")),
        Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("ts").as("tb")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .filter(col("inter") * den >= col("na").cast("long") * num)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("na").cast("long").as("na"),
        (col("inter").cast("double") / col("na").cast("double")).as("containment"))
  }
}
