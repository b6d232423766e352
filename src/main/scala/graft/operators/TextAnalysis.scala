package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for an LLM training-data pipeline, built purely
  * from codegen'd `org.apache.spark.sql.functions` (no UDFs — every one of
  * these stays inside whole-stage codegen and scales linearly per row with
  * zero shuffle; they compose with groupBy/joins downstream).
  *
  * All operators are deterministic and engine-portable (verified against a
  * DuckDB oracle): portable 32-bit hashes derive from md5 hex prefixes, not
  * JVM-specific hash functions.
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text. */
  def wsTokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(wsTokens(text))

  /** BPE-ish subword proxy: runs of letters, runs of digits, or single
    * non-alphanumeric marks — the standard pre-tokenizer regex shape.
    */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(bpeTokenPattern))

  /** Portable 32-bit hash: first 8 hex digits of md5, as a non-negative
    * long. Identical in any engine with md5 + hex parsing (DuckDB:
    * `CAST('0x' || substr(md5(x),1,8) AS BIGINT)`). Backed by the codegen'd
    * [[graft.functions.PortableHash32Expr]] — value-identical to
    * `conv(substring(md5(x),1,8),16,10)` without the hex-string round trip.
    */
  def portableHash32(c: Column): Column =
    graft.functions.PortableHash32.portableHash32(c)

  /** Normalized text for fingerprinting: lowercase, whitespace collapsed. */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Exact-content fingerprint over normalized text. */
  def contentFingerprint(text: Column): Column = md5(normalized(text).cast("binary"))

  /** Winnowing-style document fingerprint: minimum portable hash over all
    * 5-word shingle windows (rolling across the token stream). Documents
    * sharing long runs of text collide with high probability; robust to
    * small edits outside the matched window.
    */
  def rollingFingerprint(text: Column, window: Int = 5): Column =
    graft.functions.RollingFingerprint.rollingFingerprint(wsTokens(text), window)

  /** Per-language stopword profiles (tiny n-gram-profile stand-ins: the
    * highest-frequency function words of each language). Order matters —
    * it is the deterministic tie-break of [[langIdHeuristic]].
    */
  val stopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "des", "une"),
    "es" -> Seq("el", "los", "las", "y", "es", "que", "un"))

  private def profilePattern(words: Seq[String]): String =
    s"\\b(${words.mkString("|")})\\b"

  def stopwordCountFor(text: Column, words: Seq[String]): Column =
    regexp_count(lower(text), lit(profilePattern(words)))

  /** English stopword count (quality-score signal). */
  def stopwordCount(text: Column): Column =
    stopwordCountFor(text, stopwordProfiles.head._2)

  /** CJK ideograph count (Han unified block) — script-based zh signal. */
  def cjkCount(text: Column): Column =
    regexp_count(text, lit("[\\x{4e00}-\\x{9fff}]"))

  /** Punctuation-mark count. */
  def punctCount(text: Column): Column =
    regexp_count(text, lit("[.!?,;:]"))

  /** Profile-based language ID: script check first (>=5% CJK ideographs ->
    * 'zh'), then argmax over per-language stopword counts with a >=1-per-12
    * -tokens density floor (ties break in [[stopwordProfiles]] order —
    * fully deterministic); letters but no profile hit -> 'und', no letters
    * -> 'zxx'. A trained n-gram model plugs into this same
    * column-in/column-out seam; everything here stays codegen'd regex
    * counting — no shuffle, engine-portable (DuckDB oracle mirrors the
    * cascade literally).
    */
  def langIdHeuristic(text: Column): Column = {
    val chars = length(text).cast("double")
    val toks = tokenCount(text).cast("double")
    val counts = stopwordProfiles.map { case (l, ws) =>
      l -> stopwordCountFor(text, ws).cast("double")
    }
    val floor = 1.0 / 12.0
    // Cascade = argmax with deterministic preference order: branch k wins
    // iff it meets the density floor and is >= every later profile.
    val profileCases = counts.zipWithIndex.map { case ((l, c), i) =>
      val later = counts.drop(i + 1).map(_._2)
      val cond = later.foldLeft(toks > 0 && c / toks >= floor) {
        (acc, o) => acc && c >= o
      }
      (cond, l)
    }
    val base = when(regexp_count(text, lit("[A-Za-z]")) > 0, lit("und"))
      .otherwise(lit("zxx"))
    val viaProfiles = profileCases.foldRight(base) {
      case ((cond, l), acc) => when(cond, lit(l)).otherwise(acc)
    }
    when(chars > 0 && cjkCount(text).cast("double") / chars >= 0.05, lit("zh"))
      .otherwise(viaProfiles)
  }

  /** URL pattern (http/https schemes, through the next whitespace). */
  val urlPattern = "https?://\\S+"

  /** Email pattern (pragmatic C4-style, not RFC-exhaustive). */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  def urlCount(text: Column): Column = regexp_count(text, lit(urlPattern))

  /** C4-style cleaning pass: URLs and emails replaced by a space, then
    * whitespace collapsed and trimmed. Pure codegen'd regex chain — the
    * standard pre-training scrub applied before quality scoring/dedup (a
    * PII pass plugs additional patterns into the same chain).
    */
  def cleanText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(text, urlPattern, " "),
        emailPattern, " "),
      "\\s+", " "))

  /** IPv4 literal (dot-quad). Deliberately permissive on octet range — a
    * redactor over-matching `999.0.0.1` is safer than under-matching.
    */
  val ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** International-prefixed phone number: `+` then >= 9 digits allowing
    * space/dash separators. Anchored on the `+` so bare numeric runs (ids,
    * quantities) never match.
    */
  val phonePattern = "\\+\\d[\\d\\- ]{7,}\\d"

  /** PII redaction cascade: emails, then IPv4 literals, then phone numbers,
    * each replaced by a typed placeholder token. Order matters and is part
    * of the contract — an email's digit-bearing local part must be gone
    * before the phone pattern runs. Pure codegen'd regex chain (no UDF, no
    * shuffle); the same cascade shape as [[cleanText]], so additional
    * patterns (SSNs, IBANs, credit cards) chain on without plan changes.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      phonePattern, "<PHONE>")

  /** Adjacent token n-grams as strings, WITHOUT the index-lambda trap: a
    * `transform(sequence(...), i -> slice(toks, i, n))` re-evaluates the
    * token split once per ELEMENT (the array expression sits under the
    * lambda — see the q49 note); this builds the same n-grams from n
    * shifted slices folded with `zip_with`, so the split evaluates a
    * CONSTANT n times per row regardless of document length.
    */
  def tokenNgrams(toks: Column, n: Int): Column = {
    require(n >= 1, s"need n >= 1, got $n")
    val m = greatest(size(toks) - (n - 1), lit(0))
    (2 to n).foldLeft(slice(toks, lit(1), m)) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k), m), (a, b) => concat_ws(" ", a, b))
    }
  }

  /** Duplicate-fraction of adjacent word bigrams: 1 - distinct/total, 0
    * for docs with fewer than 2 tokens. The Gopher-style repetition signal
    * (high ratio = boilerplate/spam); int-derived doubles, bit-exact cross
    * engine. NOTE: guarded so no null bigram is ever built — engines
    * disagree on whether distinct() drops nulls.
    */
  def bigramRepetitionRatio(text: Column): Column = {
    val toks = wsTokens(text)
    val n1 = greatest(size(toks) - 1, lit(0))
    // zip_with over two slices, NOT transform(sequence, i -> element_at):
    // an index lambda re-evaluates the token-split per element (the array
    // expression sits under the lambda), turning one split per row into
    // one per bigram; the slice pair evaluates it a constant # of times.
    val bigrams = zip_with(
      slice(toks, lit(1), n1),
      slice(toks, lit(2), n1),
      (a, b) => concat_ws(" ", a, b))
    val nb = n1.cast("double")
    val nd = size(array_distinct(bigrams)).cast("double")
    when(nb > 0, (nb - nd) / nb).otherwise(lit(0.0))
  }

  /** Duplicate-fraction of whole words: 1 - distinct/total tokens. */
  def wordRepetitionRatio(text: Column): Column = {
    val toks = wsTokens(text)
    val n = size(toks).cast("double")
    val nd = size(array_distinct(toks)).cast("double")
    when(n > 0, (n - nd) / n).otherwise(lit(0.0))
  }

  /** Sliding context-window chunking: split each document's token stream
    * into windows of `chunkTokens` advancing by `chunkTokens - overlap`
    * (the pre-tokenization chunking every training pipeline runs). The
    * chunk COUNT is computed closed-form — `max(1, ceil((n - overlap) /
    * step))` — so the expansion is a deterministic generator, and every
    * chunk start stays < n (the last window simply clips). Narrow: one
    * generate per row, no shuffle.
    *
    * Returns (idCol, chunk_idx, chunk_text).
    */
  def chunkByTokens(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      chunkTokens: Int,
      overlap: Int): org.apache.spark.sql.DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got chunk=$chunkTokens overlap=$overlap")
    val step = chunkTokens - overlap
    val toks = wsTokens(col(textCol))
    val n = size(toks)
    // integer ceil((n - overlap) / step); exact through double for any
    // plausible token count, min 1 so empty/short docs emit one chunk
    val nChunks = greatest(lit(1),
      ((n - lit(overlap) + lit(step - 1)) / lit(step)).cast("int"))
    df.select(
      col(idCol),
      posexplode(transform(
        sequence(lit(0), nChunks - 1),
        k => array_join(slice(toks, k * step + 1, lit(chunkTokens)), " ")))
        .as(Seq("chunk_idx", "chunk_text")))
  }

  /** Per-document language consistency: chunk the token stream
    * ([[chunkByTokens]]), language-ID each chunk ([[langIdHeuristic]]),
    * and roll up how uniform the document is — (n_chunks, n_langs,
    * majority_lang, majority_frac). A prose document whose chunks split
    * between languages is mixed-language content (embedded code,
    * concatenated crawls, machine-translation seams) that a DOC-level
    * language ID silently mislabels; majority_frac is the confidence a
    * mixture filter thresholds on.
    *
    * Shape: the chunk explode is narrow; one map-side-combined shuffle
    * onto (doc, lang) — bounded by docs x languages, not chunks — and
    * the doc-level rollup windows share one doc-keyed exchange. The
    * majority tiebreak (count DESC, lang ASC) makes the argmax
    * deterministic.
    */
  def langConsistency(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      chunkTokens: Int,
      overlap: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perLang = chunkByTokens(df, textCol, idCol, chunkTokens, overlap)
      .select(col(idCol), langIdHeuristic(col("chunk_text")).as("chunk_lang"))
      .groupBy(col(idCol), col("chunk_lang"))
      .agg(count(lit(1)).as("__c"))
    val wDoc = Window.partitionBy(col(idCol))
    val wRank = Window.partitionBy(col(idCol))
      .orderBy(col("__c").desc, col("chunk_lang"))
    perLang
      .withColumn("n_chunks", sum("__c").over(wDoc))
      .withColumn("n_langs", count(lit(1)).over(wDoc))
      .withColumn("__rn", row_number().over(wRank))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("n_chunks"), col("n_langs"),
        col("chunk_lang").as("majority_lang"),
        (col("__c").cast("double") / col("n_chunks").cast("double"))
          .as("majority_frac"))
  }

  /** Composite quality score in [0,1]: mean-word-length sanity band,
    * punctuation density band, stopword presence — the standard cheap
    * pre-filter stack (Gopher/C4-style rules) as one codegen'd expression.
    * All arithmetic is int-derived doubles, so it is bit-reproducible.
    */
  def qualityScore(text: Column): Column = {
    val chars = length(text).cast("double")
    val toks = tokenCount(text).cast("double")
    val meanWord = chars / greatest(toks, lit(1.0))
    val punctRatio = punctCount(text).cast("double") / greatest(toks, lit(1.0))
    val stopRatio = stopwordCount(text).cast("double") / greatest(toks, lit(1.0))
    val wordLenOk = when(meanWord >= 3.0 && meanWord <= 10.0, 1.0).otherwise(0.0)
    val punctOk = when(punctRatio <= 0.3, 1.0).otherwise(0.0)
    val stopOk = when(stopRatio >= 0.05, 1.0).otherwise(0.0)
    val lenOk = when(chars >= 50.0 && chars <= 100000.0, 1.0).otherwise(0.0)
    (wordLenOk + punctOk + stopOk + lenOk) / lit(4.0)
  }

  /** Per-document REPETITION metrics — the Gopher/MassiveText
    * "repetition removal" filter family (Rae et al. 2021 §A1.1) on
    * token streams: documents dominated by one word or by repeated
    * n-grams are low-quality loops (boilerplate, keyword stuffing,
    * scraper glitches) that survive the q50-style composite score
    * because their MEAN statistics look normal. Output per doc:
    *
    *   - n_toks                  whitespace token count
    *   - top_word_cnt            occurrences of the most frequent word
    *   - dup2_mass / dup3_mass   total occurrences of every 2-/3-gram
    *                             that occurs >= 2 times in the doc
    *                             (ALL its occurrences count — the mass
    *                             of looped text, not just the excess)
    *   - top_word_frac           top_word_cnt / n_toks
    *   - dup2_frac / dup3_frac   dup mass over the g-gram POSITION
    *                             count (n_toks - g + 1; 0.0 when the
    *                             doc is too short to have positions)
    *   - keep                    the screen verdict at the registered
    *                             thresholds
    *
    * Every numerator and denominator is an exact integer count; each
    * fraction is ONE exact-operand double division, so the oracle
    * reproduces the doubles bit for bit (the q-family device). Scale
    * shape: one narrow gram explode per size, each aggregated by
    * (doc_id, gram) with map-side combine, then doc-keyed rollups —
    * nothing but doc-keyed partials ever shuffles, at any corpus size.
    */
  def repetitionStats(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      topWordMax: Double,
      dup3Max: Double): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol), wsTokens(col(textCol)).as("__t"))
    val base = toks.select(col(idCol), size(col("__t")).cast("long").as("n_toks"))
    val topWord = toks
      .select(col(idCol), explode(col("__t")).as("__w"))
      .groupBy(col(idCol), col("__w")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol)).agg(max(col("__c")).as("top_word_cnt"))
    // sequence(1, 0) DESCENDS in Spark ([1, 0]) rather than being
    // empty, so a doc shorter than g needs the explicit empty-array
    // branch (slice at position 0 throws).
    def dupMass(g: Int, out: String) = toks
      .select(col(idCol), explode(expr(
        s"CASE WHEN size(__t) >= $g THEN " +
          s"transform(sequence(1, size(__t) - ${g - 1}), " +
          s"i -> array_join(slice(__t, i, $g), ' ')) " +
          "ELSE array() END")).as("__g"))
      .groupBy(col(idCol), col("__g")).agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= 2)
      .groupBy(col(idCol)).agg(sum(col("__c")).as(out))
    def frac(num: Column, den: Column): Column =
      when(den > 0, num.cast("double") / den.cast("double")).otherwise(lit(0.0))
    base
      .join(topWord, Seq(idCol), "left")
      .join(dupMass(2, "dup2_mass"), Seq(idCol), "left")
      .join(dupMass(3, "dup3_mass"), Seq(idCol), "left")
      .select(
        col(idCol),
        col("n_toks"),
        coalesce(col("top_word_cnt"), lit(0L)).as("top_word_cnt"),
        coalesce(col("dup2_mass"), lit(0L)).as("dup2_mass"),
        coalesce(col("dup3_mass"), lit(0L)).as("dup3_mass"))
      .withColumn("top_word_frac",
        frac(col("top_word_cnt"), col("n_toks")))
      .withColumn("dup2_frac",
        frac(col("dup2_mass"), greatest(col("n_toks") - 1, lit(0L))))
      .withColumn("dup3_frac",
        frac(col("dup3_mass"), greatest(col("n_toks") - 2, lit(0L))))
      .withColumn("keep",
        col("top_word_frac") <= topWordMax && col("dup3_frac") <= dup3Max)
  }

  /** ROW-LOCAL twin of [[repetitionStats]] — identical output columns
    * computed purely with higher-order array expressions, no shuffle at
    * all: every metric of the repetition screen is doc-local, so a
    * single row carries everything needed. Cost is O(len^2) string
    * compares per row (each gram's multiplicity probes the gram array),
    * which is the right trade exactly where this face is used: the
    * STREAMING screen (`DocumentStream.repetitionScreened`), where docs
    * arrive row-at-a-time and a groupBy would force state the append
    * contract forbids. The batch face's (doc_id, gram) shuffle is the
    * scale shape for corpus-wide passes over long documents.
    * Spec-pinned equal to the shuffle form (TextPropertySpec).
    *
    * Staged projections keep each intermediate (token array, gram
    * arrays) an ATTRIBUTE reference downstream — CollapseProject leaves
    * multiply-referenced non-trivial aliases in place, so nothing
    * re-derives the arrays per reference (the q57 alias-inlining trap).
    */
  // Row-local gram/dup-mass/fraction devices shared by the stats face
  // below and [[repetitionGate]] (identical expressions, one source of
  // truth).
  private def gramsRL(t: Column, g: Int): Column =
    when(size(t) >= g,
      transform(sequence(lit(1), size(t) - (g - 1)),
        i => array_join(slice(t, i, lit(g)), " ")))
      .otherwise(array().cast("array<string>"))
  private def dupMassRL(gs: Column): Column =
    (size(gs) -
      size(filter(gs, x => size(filter(gs, y => y === x)) === 1)))
      .cast("long")
  private def fracRL(num: Column, den: Column): Column =
    when(den > 0, num.cast("double") / den.cast("double")).otherwise(lit(0.0))

  def repetitionStatsRowLocal(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      topWordMax: Double,
      dup3Max: Double): org.apache.spark.sql.DataFrame = {
    def grams(t: Column, g: Int): Column = gramsRL(t, g)
    def dupMass(gs: Column): Column = dupMassRL(gs)
    def frac(num: Column, den: Column): Column = fracRL(num, den)
    df.select(col(idCol), wsTokens(col(textCol)).as("__t"))
      .select(col(idCol), col("__t"),
        grams(col("__t"), 2).as("__g2"), grams(col("__t"), 3).as("__g3"))
      .select(
        col(idCol),
        size(col("__t")).cast("long").as("n_toks"),
        coalesce(
          array_max(transform(array_distinct(col("__t")),
            w => size(filter(col("__t"), x => x === w)))),
          lit(0)).cast("long").as("top_word_cnt"),
        dupMass(col("__g2")).as("dup2_mass"),
        dupMass(col("__g3")).as("dup3_mass"))
      .withColumn("top_word_frac", frac(col("top_word_cnt"), col("n_toks")))
      .withColumn("dup2_frac",
        frac(col("dup2_mass"), greatest(col("n_toks") - 1, lit(0L))))
      .withColumn("dup3_frac",
        frac(col("dup3_mass"), greatest(col("n_toks") - 2, lit(0L))))
      .withColumn("keep",
        col("top_word_frac") <= topWordMax && col("dup3_frac") <= dup3Max)
  }

  /** Row-local repetition GATE: `df` filtered to the keep verdict of
    * [[repetitionStatsRowLocal]] with every caller column untouched —
    * the COMPOSITION form streaming faces need (a derived stats stream
    * cannot join back onto its own source stream, so the verdict must
    * ride the original rows). Same staged-projection discipline as the
    * stats face (each intermediate array is an attribute reference, not
    * a re-derived alias); only the 3-gram mass is computed — the keep
    * verdict never reads dup2. Spec-pinned against the stats face's
    * verdict column (TextPropertySpec).
    */
  def repetitionGate(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      topWordMax: Double,
      dup3Max: Double): org.apache.spark.sql.DataFrame =
    df.withColumn("__rg_t", wsTokens(col(textCol)))
      .withColumn("__rg_g3", gramsRL(col("__rg_t"), 3))
      .withColumn("__rg_n", size(col("__rg_t")).cast("long"))
      .withColumn("__rg_top", coalesce(
        array_max(transform(array_distinct(col("__rg_t")),
          w => size(filter(col("__rg_t"), x => x === w)))),
        lit(0)).cast("long"))
      .filter(
        fracRL(col("__rg_top"), col("__rg_n")) <= topWordMax &&
          fracRL(dupMassRL(col("__rg_g3")),
            greatest(col("__rg_n") - 2, lit(0L))) <= dup3Max)
      .drop("__rg_t", "__rg_g3", "__rg_n", "__rg_top")
}
