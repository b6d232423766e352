package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable fuzzy (edit-distance) self-match: positional-segment blocking
  * with a hot-block cap, then exact Levenshtein verification.
  *
  * Blocking scheme: each string of length L is cut into `numSegments`
  * equal-width positional segments (integer-division boundaries); the block
  * key is (segment_idx, segment_value, L). Two equal-length strings within
  * `maxDist` substitutions agree on at least `numSegments - maxDist`
  * segments (pigeonhole), so candidate recall is exact for the
  * substitution-only case as long as ONE shared segment's block survives;
  * indel pairs (length change) are not guaranteed — document-level dedup
  * uses the n-gram/LSH family for those. Precision is always 1: the exact
  * edit distance verifies every candidate.
  *
  * The cap is the scale guard: a segment value shared by f strings (a
  * constant prefix like "Customer#" — boilerplate) is an f^2/2 join bucket
  * with no discriminating power. Blocks larger than `blockCap` are dropped
  * before the join; the hot-block set is tiny by construction (each needs
  * > blockCap members) and broadcasts into a map-side anti-join. A true
  * pair is lost only if ALL of its >= numSegments - maxDist shared
  * segments are boilerplate-hot — the same regime the q34 stop-gram cap
  * targets, and exactly the case where "similarity" carries no signal.
  * Within-block work after the cap is bounded by blockCap^2/2 per block and
  * the join shuffles only (block key, id, string) rows — never a cross
  * product.
  *
  * Reference intent: entity-resolution fuzzy matching; the q81 registry
  * entry keeps the coarse attribute-blocked (nationkey) form — this is the
  * production content-derived key the q81 docstring promises.
  */
object FuzzyJoin {

  /** All (id_a, id_b, dist) pairs with dist <= maxDist discoverable through
    * the capped positional-segment blocking described above; id_a < id_b.
    * Null strings are excluded (a null block key joins nothing) —
    * spec-pinned.
    */
  def segmentBlockedPairs(
      df: DataFrame,
      strCol: String,
      idCol: String,
      maxDist: Int = 2,
      numSegments: Int = 9,
      blockCap: Int = 150): DataFrame = {
    require(numSegments > maxDist,
      s"numSegments ($numSegments) must exceed maxDist ($maxDist) or the " +
        "pigeonhole guarantee is void")
    val segStructs = (0 until numSegments).map { i =>
      // Segment i covers character positions
      // (i*L div m) + 1 .. ((i+1)*L div m)  — integer division, 1-based.
      val start = expr(s"(($i * length($strCol)) div $numSegments) + 1")
      val width = expr(
        s"((${i + 1} * length($strCol)) div $numSegments) - " +
          s"(($i * length($strCol)) div $numSegments)")
      struct(lit(i).as("seg_idx"), col(strCol).substr(start, width).as("seg"))
    }
    val blocks = df
      .select(col(idCol), col(strCol), length(col(strCol)).as("len"),
        explode(array(segStructs: _*)).as("b"))
      .select(col(idCol), col(strCol), col("len"),
        col("b.seg_idx").as("seg_idx"), col("b.seg").as("seg"))
    val hot = blocks.groupBy(col("seg_idx"), col("seg"), col("len"))
      .agg(count(lit(1)).as("members"))
      .filter(col("members") > blockCap)
      .select(col("seg_idx"), col("seg"), col("len"))
    val kept = blocks.join(broadcast(hot), Seq("seg_idx", "seg", "len"), "left_anti")
    val a = kept.select(col("seg_idx"), col("seg"), col("len"),
      col(idCol).as("id_a"), col(strCol).as("str_a"))
    val b = kept.select(col("seg_idx"), col("seg"), col("len"),
      col(idCol).as("id_b"), col(strCol).as("str_b"))
    a.join(b, Seq("seg_idx", "seg", "len"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("str_a"), col("str_b")).as("dist"))
      .filter(col("dist") <= maxDist)
      // A pair can share several surviving segments; dist is a pure
      // function of the pair, so id-keyed dedup is value-stable.
      .dropDuplicates("id_a", "id_b")
  }
}
