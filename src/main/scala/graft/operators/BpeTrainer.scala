package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterated BPE-merge tokenizer trainer — the vocabulary-learning stage
  * of a training-data pipeline (subword tokenization a la Sennrich et
  * al.), as a driver-bounded loop of vocabulary-level aggregations.
  *
  * Reference scope note: the reference (main.js) has no tokenizer stage;
  * this extends the model family (q180-q200) with the trained-TOKENIZER
  * artifact beside the trained classifier (q199) — q96 counts symbol
  * pairs once; this LEARNS the merge table by iterating
  * count-argmax-apply.
  *
  * Differential-oracle contract (see [[graft.queries.Q]]): every
  * quantity is an integer count or a string rewrite, so the unrolled
  * per-round oracle checks the learned merges bit-for-bit. Two
  * portability choices make that possible:
  *
  *   - Words are whitespace tokens of `lower(trim(text))` restricted to
  *     `^[a-z]+$` — identical char semantics in both engines (no
  *     unicode-segmentation drift).
  *   - A merge is APPLIED as two literal left-to-right non-overlapping
  *     string replaces of `" l r "` with `" lr "` over the
  *     space-padded symbol string. One pass would leave the second of
  *     two back-to-back occurrences unmerged (the match consumes the
  *     shared boundary space); the second pass picks those up. This is
  *     classic greedy BPE everywhere except inside runs of 3+ repeats
  *     of the SAME symbol (`a a a a a` merges positions (1,2),(4,5)
  *     rather than greedy (1,2),(3,4)) — deterministic, and exactly
  *     `replace()` semantics in both Spark and the oracle, which is
  *     what the bit-equality contract needs.
  *
  * Scale shape (100 TB): training runs on the VOCABULARY — (distinct
  * word, count), Zipf-bounded far below corpus size — so the corpus is
  * scanned once for word counts and never again. Each round is one
  * pair-count aggregation over the vocab (map-side combined, keys
  * bounded by alphabet^2 + learned merges) plus a LIMIT-1 collect (the
  * model row, never data) and a codegen'd two-replace column rewrite.
  * The evolving vocab is eagerly localCheckpoint'ed per round, so round
  * r never recomputes rounds 1..r-1's rewrites and lineage stays flat.
  */
object BpeTrainer {

  /** Training rounds: enough to learn real digraph merges on the
    * fixture corpus, small enough that the unrolled oracle SQL stays
    * readable.
    */
  val Rounds = 6

  /** One learned merge: `lft` + `rgt` -> `lft ++ rgt`, chosen as the
    * round's max-count pair (ties: ascending lft, then rgt).
    */
  final case class Merge(round: Int, lft: String, rgt: String, pairCount: Long)

  /** (syms, cnt): the space-joined character decomposition of each
    * distinct `^[a-z]+$` word with its corpus frequency — BPE's working
    * set.
    */
  def vocab(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .select(
        array_join(
          filter(split(col("word"), ""), s => length(s) > 0), " ").as("syms"),
        col("cnt"))

  /** Adjacent-pair counts over the current vocab: (lft, rgt,
    * pair_count), weighted by word frequency.
    */
  def pairCounts(v: DataFrame): DataFrame =
    v.select(col("cnt"), split(col("syms"), " ").as("s"))
      .filter(size(col("s")) >= 2)
      .select(col("cnt"), explode(expr(
        "transform(sequence(1, size(s) - 1), " +
          "i -> struct(s[i - 1] AS lft, s[i] AS rgt))")).as("p"))
      .select(col("p.lft").as("lft"), col("p.rgt").as("rgt"), col("cnt"))
      .groupBy("lft", "rgt")
      .agg(sum("cnt").as("pair_count"))

  /** The two-pass literal merge rewrite (see object scaladoc). */
  private def applyMerge(syms: Column, lft: String, rgt: String): Column = {
    val pat = lit(s" $lft $rgt ")
    val rep = lit(s" $lft$rgt ")
    val once = call_function(
      "replace", concat(lit(" "), syms, lit(" ")), pat, rep)
    trim(call_function("replace", once, pat, rep))
  }

  /** Learn up to `rounds` merges; returns the merge table and the FINAL
    * rewritten vocab (caller releases it via [[Checkpoints.release]]).
    * Stops early if no pair remains (every word fully merged).
    */
  def train(
      docs: DataFrame,
      textCol: String,
      rounds: Int = Rounds): (Seq[Merge], DataFrame) = {
    var v = vocab(docs, textCol).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val best = pairCounts(v)
        .orderBy(desc("pair_count"), asc("lft"), asc("rgt"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val lft = best(0).getAs[String]("lft")
        val rgt = best(0).getAs[String]("rgt")
        merges += Merge(r, lft, rgt, best(0).getAs[Long]("pair_count"))
        val nv = v
          .select(applyMerge(col("syms"), lft, rgt).as("syms"), col("cnt"))
          .localCheckpoint(true)
        Checkpoints.release(v)
        v = nv
      }
      r += 1
    }
    (merges.toSeq, v)
  }

  /** The learned merge table: (round, lft, rgt, merged, pair_count),
    * one row per round in learning order.
    */
  def mergeTable(
      docs: DataFrame,
      textCol: String,
      rounds: Int = Rounds): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (merges, v) = train(docs, textCol, rounds)
    Checkpoints.release(v)
    merges
      .map(m => (m.round, m.lft, m.rgt, m.lft + m.rgt, m.pairCount))
      .toDF("round", "lft", "rgt", "merged", "pair_count")
  }

  /** Corpus token frequencies under the FINAL learned vocabulary:
    * (token, total_cnt). The token space is alphabet + learned merges —
    * bounded by construction, however large the corpus.
    */
  def tokenFrequencies(
      docs: DataFrame,
      textCol: String,
      rounds: Int = Rounds): DataFrame = {
    val (_, v) = train(docs, textCol, rounds)
    try {
      v.select(explode(split(col("syms"), " ")).as("token"), col("cnt"))
        .groupBy("token")
        .agg(sum("cnt").as("total_cnt"))
        .localCheckpoint(true)
    } finally Checkpoints.release(v)
  }

  /** ENCODE the corpus under the learned tokenizer: per-doc
    * (idCol, n_words, n_tokens, n_chars) where `n_tokens` is the
    * token count of each `^[a-z]+$` word under the final merged
    * vocabulary — the production "tokenize the corpus" step a pipeline
    * runs after training, and the integer numerator/denominator of the
    * tokens-per-word and chars-per-token compression ratios.
    *
    * Scale shape: the lexicon (distinct word -> token count) is the
    * trained artifact — Zipf-bounded, NOT corpus-sized — so the encode
    * is one `broadcast` hash join from the exploded corpus words onto
    * it (no shuffle of the corpus beyond the per-doc aggregation,
    * which is map-side combined on doc_id). Words are reconstructed
    * from the rewritten `syms` (`replace(syms, ' ', '')` is lossless:
    * symbols never contain spaces), so the final vocab IS the lexicon
    * and training is never re-run per doc. Docs with no `^[a-z]+$`
    * word have no row (inner-join semantics), matching the oracle.
    */
  def encode(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      rounds: Int = Rounds): DataFrame = {
    val (_, v) = train(docs, textCol, rounds)
    try {
      val lex = v.select(
        regexp_replace(col("syms"), " ", "").as("word"),
        size(split(col("syms"), " ")).cast("long").as("n_tokens_w"))
      val docWords = docs
        .select(
          col(idCol),
          explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
        .filter(col("word").rlike("^[a-z]+$"))
      docWords
        .join(broadcast(lex), "word")
        .groupBy(col(idCol))
        .agg(
          count(lit(1)).as("n_words"),
          sum("n_tokens_w").as("n_tokens"),
          sum(length(col("word")).cast("long")).as("n_chars"))
        .localCheckpoint(true)
    } finally Checkpoints.release(v)
  }
}
