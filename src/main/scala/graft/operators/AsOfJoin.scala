package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join — an operator Spark lacks natively.
  *
  * Semantics: for each left row, attach the single most recent right row
  * with the same key and `rightTime <= leftTime` (ties on time broken by
  * the largest `rightTieBreak` — fully deterministic); payload columns are
  * null when no right row precedes.
  *
  * Implementation is the scalable union+window formulation, NOT a range
  * join: both sides union into one stream tagged by side, shuffle ONCE on
  * the key, sort within each partition by (time, side, tiebreak), and a
  * running `last(..., ignoreNulls)` carries the latest right payload —
  * packed in ONE struct so every attached column comes from the same right
  * row — forward onto every left row. Cost: one shuffle + sort per input
  * row, no pair explosion regardless of how many right rows precede a left
  * row (a naive `t_r <= t_l` theta-join is O(|L|·|R|) per key). At 100 TB
  * the shuffle is keyed and AQE-skew-splittable like any other.
  */
object AsOfJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side
    * @param leftKey    join key column on the left
    * @param rightKey   join key column on the right
    * @param leftTime   event-time column on the left (orderable type)
    * @param rightTime  event-time column on the right (same type)
    * @param rightTieBreak right column breaking equal-time ties (largest
    *                   non-null wins; a NULL tiebreak loses to every
    *                   non-null one)
    * @param payload    right columns to attach. A payload column whose name
    *                   collides with a left column is attached with a
    *                   `_right` suffix (repeated until unique), so the
    *                   output never carries duplicate names.
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightTieBreak: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toIndexedSeq
    val payloadType = StructType(payload.map(c => right.schema(c)))

    // Internal column names must not shadow user columns on either side:
    // extend with underscores until unique (deterministic, no RNG).
    val taken = (left.columns ++ right.columns).toSet
    def fresh(base: String): String =
      Iterator.iterate(base)(_ + "_").dropWhile(taken.contains).next()
    val (kC, tC, sideC, tieC, pC, carC) =
      (fresh("__key"), fresh("__t"), fresh("__side"), fresh("__tie"),
        fresh("__p"), fresh("__carried"))

    // Attached payload names: suffix past any collision with left columns
    // (and with each other, e.g. payload Seq("v", "v_right")).
    val outNames = payload.foldLeft((Vector.empty[String], leftCols.toSet)) {
      case ((acc, used), c) =>
        val n = Iterator.iterate(c)(_ + "_right").dropWhile(used.contains).next()
        (acc :+ n, used + n)
    }._1

    val l = left
      .withColumn(kC, col(leftKey))
      .withColumn(tC, col(leftTime))
      .withColumn(sideC, lit(1)) // left sorts after right at equal time
      .withColumn(tieC, lit(null).cast(right.schema(rightTieBreak).dataType))
      .withColumn(pC, lit(null).cast(payloadType))
      .select((leftCols ++ Seq(kC, tC, sideC, tieC, pC)).map(col): _*)

    val r = right
      .withColumn(kC, col(rightKey))
      .withColumn(tC, col(rightTime))
      .withColumn(sideC, lit(0))
      .withColumn(tieC, col(rightTieBreak))
      .withColumn(pC, struct(payload.map(col): _*))
      .select(Seq(kC, tC, sideC, tieC, pC).map(col): _*)

    // Right rows sort before left rows at the same timestamp (inclusive
    // "at or before"); among equal-time right rows, the larger tiebreak
    // sorts later, so the running last() keeps it. nulls_first: a NULL
    // tiebreak sorts before every non-null value and therefore LOSES the
    // tie ("largest tiebreak wins" stays true when some rows carry NULL).
    val w = Window
      .partitionBy(kC)
      .orderBy(col(tC), col(sideC), col(tieC).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r, allowMissingColumns = true)
      .withColumn(carC, last(col(pC), ignoreNulls = true).over(w))
      .filter(col(sideC) === 1)
      .select(leftCols.map(col) ++
        payload.zip(outNames).map { case (c, n) => col(s"$carC.$c").as(n) }: _*)
  }
}
