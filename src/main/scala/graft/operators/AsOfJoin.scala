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
    * @param rightTieBreak right column breaking equal-time ties (max wins)
    * @param payload    right columns to attach
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

    val l = left
      .withColumn("__key", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1)) // left sorts after right at equal time
      .withColumn("__tie", lit(null).cast(right.schema(rightTieBreak).dataType))
      .withColumn("__p", lit(null).cast(payloadType))
      .select((leftCols ++ Seq("__key", "__t", "__side", "__tie", "__p")).map(col): _*)

    val r = right
      .withColumn("__key", col(rightKey))
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__tie", col(rightTieBreak))
      .withColumn("__p", struct(payload.map(col): _*))
      .select(Seq("__key", "__t", "__side", "__tie", "__p").map(col): _*)

    // Right rows sort before left rows at the same timestamp (inclusive
    // "at or before"); among equal-time right rows, the larger tiebreak
    // sorts later, so the running last() keeps it.
    val w = Window
      .partitionBy("__key")
      .orderBy(col("__t"), col("__side"), col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__carried", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(c => col(s"__carried.$c").as(c)): _*)
  }
}
