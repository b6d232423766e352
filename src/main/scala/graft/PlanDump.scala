package graft

import java.nio.file.{Files, Paths}

/** Optimization-round evidence tool: write `.explain("formatted")` for
  * named registry queries to `<outDir>/<name>_<tag>.txt` — the
  * before/after plan artifacts the round deliverables require
  * (`plans/r<N>/<query>_{before,after}.txt`). Usage:
  *
  *   sbt "runMain graft.PlanDump <sfDir> <outDir> <tag> <q1,q2,...>"
  *
  * Reads the same env contract as Bench (`SPARK_GRAFT_CPUS`); pure
  * planning — nothing executes, nothing is written besides the text
  * files.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, names) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    Files.createDirectories(Paths.get(outDir))
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${n}_$tag.txt"), txt)
        System.err.println(s"[plandump] wrote $outDir/${n}_$tag.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n FAILED: $e")
      }
    }
    spark.stop()
  }
}
