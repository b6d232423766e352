package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval: top-k documents per query phrase — the lexical
  * retrieval primitive next to the embedding ANN family ([[Similarity]]),
  * and the standard quality screen for "does this corpus answer real
  * queries" curation audits (Robertson & Zaragoza, "The Probabilistic
  * Relevance Framework: BM25 and Beyond", 2009).
  *
  * Scoring is the k1=1.2, b=0.75 Okapi form with every rational folded
  * through to INTEGER arithmetic so both engines agree bit for bit (the
  * [[graft.queries.Q]] determinism contract — no libm log, no unordered
  * double sums). With N docs, T total corpus tokens (so avgdl = T/N),
  * per-term doc frequency df, term frequency tf and doc length dl:
  *
  *   idf ~ (N - df + 0.5)/(df + 0.5)        -> idf_s = (2N-2df+1)*SCALE div (2df+1)
  *   tf-part = 2.2*tf / (tf + 0.3 + 0.9*dl/avgdl)
  *           = 22*tf*T / (10*tf*T + 3*T + 9*dl*N)   [multiplied by 10*T... exactly]
  *   contrib = idf_s * 22 * tf * T div (10*tf*T + 3*T + 9*dl*N)
  *
  * (The textbook log(idf) is monotone in the rational idf; dropping the
  * log changes absolute scores, not the standard BM25 structure — the
  * saturation and length normalization are intact, and the result is
  * portable across engines. Long arithmetic is safe while
  * idf_s*22*tf*T < 2^63 — about N*T*tf < 4e11 at SCALE=1e6; a 100 TB
  * corpus would drop SCALE or move to double scoring once past oracle
  * verification.)
  *
  * Distributed shape: query terms are PLAN LITERALS (the q63
  * decontamination pattern) — the exploded token stream is filtered to
  * the query vocabulary BEFORE any shuffle, so the tf aggregate touches
  * only matching tokens regardless of corpus size; df and the (query,
  * term) map are term-keyed tables bounded by the vocabulary and ride
  * broadcast joins; corpus-wide N and T join as a broadcast 1-row frame
  * (never a driver collect); per-query top-k plans as WindowGroupLimit.
  */
object Bm25 {

  val Scale = 1000000L

  /** Largest n_docs * t_tokens * max_dl for which every intermediate of
    * the integer score fits a Long: the contrib numerator is bounded by
    * idf_s * 22 * tf * t_tokens < (n_docs * Scale) * 22 * max_dl *
    * t_tokens (df >= 1 makes idf_s < n_docs * Scale; tf <= dl <= max_dl),
    * so the product bound is Long.MaxValue / (22 * Scale). The
    * denominator's 10*tf*t_tokens term is bounded by the same product.
    */
  val MaxStatProduct: Long = Long.MaxValue / (22L * Scale)

  /** Top-k docs per query: (query, doc_id, score, rank), score the exact
    * integer-scaled BM25 sum over the query's distinct terms, rank the
    * 1-based position by (score desc, doc_id asc). Docs sharing no term
    * with a query score nothing and are absent.
    */
  def topK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: Seq[String],
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(queries.nonEmpty, "need at least one query")
    // A blank query would tokenize to Array("") and match the [""] token
    // that wsTokens yields for blank documents — reject it instead of
    // silently scoring empty-text docs against an empty term.
    require(queries.forall(_.trim.nonEmpty),
      s"queries must contain at least one term: ${queries.filter(_.trim.isEmpty)}")
    val spark = docs.sparkSession
    import spark.implicits._

    val qterms = queries.flatMap(q =>
      q.trim.split("\\s+").distinct.map(t => (q, t))).distinct
    val vocab = qterms.map(_._2).distinct

    val d = docs.select(
      col(idCol).as("doc_id"),
      TextAnalysis.wsTokens(col(textCol)).as("__toks"))
      .withColumn("dl", size(col("__toks")).cast("long"))
    // Corpus stats as a broadcast 1-row frame: avgdl enters the score as
    // the exact rational T/N, never a rounded double. t_tokens is wrapped
    // in a fail-fast overflow guard (the HdrSketch fail-fast convention):
    // past MaxStatProduct the Long score would wrap SILENTLY under
    // non-ANSI arithmetic and mis-rank, so the stats row raises instead.
    // The bound product is compared in decimal(38,0), which turns its own
    // overflow into null — and a null guard condition takes the
    // raise_error branch, so the check cannot itself wrap.
    val stats = d.agg(
        count(lit(1)).as("n_docs"),
        sum("dl").as("t_tokens"),
        max("dl").as("max_dl"))
      .select(
        col("n_docs"),
        when(
          // an EMPTY corpus (n_docs = 0, null sums) is a legitimate empty
          // result, not an overflow — only a non-empty corpus whose bound
          // product exceeds (or null-overflows) the limit raises
          col("n_docs") === 0 ||
            col("n_docs").cast("decimal(38,0)") * col("t_tokens") * col("max_dl")
              <= lit(MaxStatProduct),
          col("t_tokens"))
          .otherwise(raise_error(concat(
            lit("Bm25.topK: n_docs*t_tokens*max_dl = "),
            (col("n_docs").cast("decimal(38,0)") * col("t_tokens") * col("max_dl"))
              .cast("string"),
            lit(s" exceeds the exact-Long scoring bound $MaxStatProduct; " +
              "drop Scale or move to double scoring"))))
          .as("t_tokens"))
    // Vocabulary filter BEFORE the shuffle: only query-term tokens leave
    // the scan, so the tf aggregate is query-sized, not corpus-sized.
    val tf = d.select(col("doc_id"), col("dl"), explode(col("__toks")).as("term"))
      .filter(col("term").isin(vocab: _*))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val qt = qterms.toDF("query", "term")

    val scored = tf
      .join(broadcast(df), Seq("term"))
      .join(broadcast(qt), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("contrib", expr(
        s"""(((((2 * n_docs - 2 * df + 1) * $Scale) div (2 * df + 1))
           |   * 22 * tf * t_tokens)
           |  div (10 * tf * t_tokens + 3 * t_tokens + 9 * dl * n_docs))
           |""".stripMargin.replace("\n", " ")))
      .groupBy("query", "doc_id")
      .agg(sum("contrib").as("score"))
    val byQuery = Window.partitionBy("query")
      .orderBy(col("score").desc, col("doc_id"))
    scored
      .withColumn("rank", row_number().over(byQuery).cast("long"))
      .filter(col("rank") <= k)
      .select("query", "doc_id", "score", "rank")
  }
}
