package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: time registry queries by name (first run + warm re-run)
  * and report executed-plan reuse markers — the generic form of the
  * TimeBuild decomposition.
  *
  * Usage: runMain graft.tools.TimeQuery <sfDir> <queryName>...
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQuery <sfDir> <queryName>...")
    val dir = args.head
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    args.tail.foreach { name =>
      def once(tag: String): Unit = {
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(name)(spark, dir)
        val n = df.count()
        println(f"[timequery] $name $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        if (tag == "warm") {
          val ep = df.queryExecution.executedPlan.toString
          println(s"[timequery] $name reusedExchange=" +
            "ReusedExchange".r.findAllIn(ep).length +
            " broadcasts=" + "BroadcastExchange".r.findAllIn(ep).length)
        }
      }
      once("cold"); once("warm")
    }
    spark.stop()
  }
}
