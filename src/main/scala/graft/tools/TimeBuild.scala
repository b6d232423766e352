package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: time the dup-graph pair-mine build (first run and warm
  * re-run) on a given fixture dir — the decomposition tool behind the
  * round-13 signature-checkpoint fix (the band self-join's broadcast
  * side used to re-execute the whole signature mine; see
  * DupGraphPhases.build).
  *
  * Usage: runMain graft.tools.TimeBuild [sfDir]
  */
object TimeBuild {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    graft.Tables.documents(spark, dir).count() // session warm-up
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[timebuild] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("dupgraph build (cold)") { graft.queries.DupGraphPhases.build(spark, dir) }
    time("dupgraph build (warm rerun)") { graft.queries.DupGraphPhases.build(spark, dir) }
    spark.stop()
  }
}
