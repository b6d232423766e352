package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema union across heterogeneous parquet files WITH type conflicts
  * (SURVEY.md §7 hard part (b)).
  *
  * `mergeSchema=true` handles files whose columns differ but errors when
  * the same column carries incompatible types across files. The reference
  * never hits this only because it stringifies every cell on output
  * (TEXT default, main.js:299); the honest engine equivalent: compute the
  * least common type per conflicting column — numeric widening where Spark
  * defines it, else StringType (the reference's own TEXT fallback) — then
  * per-file read + cast + `unionByName(allowMissingColumns=true)`.
  *
  * Scale: the footer pass touches metadata only (one tiny driver-side read
  * per file — parallelizable via a files DataFrame if the file count is
  * itself huge); the data pass stays one lazy union plan, so execution is
  * identical to a plain multi-file scan with per-file projections.
  */
object SchemaUnion {

  /** Least common type for one column observed with multiple types. */
  private[sources] def widen(a: DataType, b: DataType): DataType =
    if (a == b) a
    else
      (a, b) match {
        case (x: NumericType, y: NumericType) =>
          // standard numeric widening lattice; decimal conflicts -> double
          val order: Seq[DataType] =
            Seq(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
          val (ia, ib) = (order.indexOf(x), order.indexOf(y))
          if (ia >= 0 && ib >= 0) order(math.max(ia, ib)) else DoubleType
        case _ => StringType // the reference's TEXT fallback (main.js:299)
      }

  /** Reconciled schema over all files' footers. */
  def reconciledSchema(spark: SparkSession, paths: Seq[String]): StructType = {
    val fields = scala.collection.mutable.LinkedHashMap[String, DataType]()
    paths.foreach { p =>
      spark.read.parquet(p).schema.foreach { f =>
        fields.get(f.name) match {
          case Some(t) => fields(f.name) = widen(t, f.dataType)
          case None => fields(f.name) = f.dataType
        }
      }
    }
    StructType(fields.map { case (n, t) => StructField(n, t) }.toSeq)
  }

  /** Read all files as one DataFrame under the reconciled schema: per-file
    * cast to the widened types, then union by name with null padding.
    */
  def readWithWiden(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val target = reconciledSchema(spark, paths)
    val dfs = paths.map { p =>
      val df = spark.read.parquet(p)
      val casted = df.columns.toIndexedSeq.map { c =>
        col(c).cast(target(c).dataType).as(c)
      }
      df.select(casted: _*)
    }
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
