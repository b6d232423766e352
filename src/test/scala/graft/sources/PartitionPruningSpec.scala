package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Partition-pruned layout — the other half of the 100 TB read story
  * (PLANS.md): data written `partitionBy(key)` lets a key predicate skip
  * entire directories at planning time (`PartitionFilters` in the scan),
  * reading none of the excluded files' bytes.
  */
class PartitionPruningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("filter on the partition column becomes a PartitionFilter, not a data filter") {
    val dir = s"${Files.createTempDirectory("events_part")}/data"
    Tables.eventsTsNs(spark, SparkTestSession.sf0001)
      .write.partitionBy("event_type").parquet(dir)

    val q = spark.read.parquet(dir).filter(col("event_type") === "purchase")
    val plan = q.queryExecution.explainString(FormattedMode)
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.exists(_.contains("event_type")),
      s"partition filter missing: ${pf.getOrElse("(no PartitionFilters line)")}")

    // and the result is still complete
    val want = Tables.eventsTsNs(spark, SparkTestSession.sf0001)
      .filter(col("event_type") === "purchase").count()
    assert(q.count() == want)
  }
}
