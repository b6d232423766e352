package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Type-conflicting schema union (SURVEY §7 hard part b): int vs long
  * widens numerically, int vs string falls back to the TEXT rule, missing
  * columns pad with null — and plain mergeSchema would have failed.
  */
class SchemaUnionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val dir: String = {
    val d = Files.createTempDirectory("schema_union").toString
    Seq((1, 10, "a")).toDF("id", "metric", "tag") // id int, metric int
      .write.parquet(s"$d/f1.parquet")
    Seq((2L, "high", 9.5)).toDF("id", "metric", "score") // id long, metric STRING
      .write.parquet(s"$d/f2.parquet")
    d
  }
  lazy val paths = Seq(s"$dir/f1.parquet", s"$dir/f2.parquet")

  test("mergeSchema alone rejects the type conflict (the problem exists)") {
    val e = intercept[Exception] {
      spark.read.option("mergeSchema", "true").parquet(paths: _*).collect()
    }
    assert(e.getMessage.toLowerCase.contains("merg") ||
      e.getMessage.toLowerCase.contains("schema") ||
      e.getMessage.toLowerCase.contains("type"))
  }

  test("readWithWiden reconciles: numeric widening, TEXT fallback, null padding") {
    val df = SchemaUnion.readWithWiden(spark, paths)
    val schema = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(schema("id") == LongType) // int ∪ long -> long
    assert(schema("metric") == StringType) // int ∪ string -> TEXT rule
    assert(schema("tag") == StringType && schema("score") == DoubleType)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("metric") == "10") // int rendered as string
    assert(rows(0).isNullAt(rows(0).fieldIndex("score"))) // padding
    assert(rows(1).getAs[String]("metric") == "high")
    assert(rows(1).isNullAt(rows(1).fieldIndex("tag")))
  }
}
