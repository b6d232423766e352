package graft

import org.apache.spark.sql.SparkSession

/** SQL-interface surface: register the test tables as temp views so any
  * engine query can be expressed as plain `spark.sql(...)` — the full ANSI
  * surface (joins, windows, grouping sets, set ops) comes with Catalyst;
  * the reference has no query language at all (SURVEY.md §3: "IR: none").
  */
object GraftCatalog {

  /** Register every table under `dir` as a temp view named after the table. */
  def registerTables(spark: SparkSession, dir: String): Unit =
    Tables.all.foreach { name =>
      if (name == "events")
        Tables.eventsTsNs(spark, dir).createOrReplaceTempView(name)
      else
        Tables(spark, dir, name).createOrReplaceTempView(name)
    }
}
