package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool: dump `explain("formatted")` for selected registry queries so
  * plan properties (pushdown, broadcast, codegen spans) can be reviewed and
  * pinned. Usage: runMain graft.tools.PlanDump <sfDir> <outFile> [names...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("/tmp/plans.txt")
    val names = if (args.length > 2) args.drop(2).toSet else Set.empty[String]
    val spark = graft.GraftSession.get("plandump", 8)
    val sb = new StringBuilder
    graft.SparkEntry.registry
      .filter(q => names.isEmpty || names(q.name))
      .foreach { q =>
        val df = q.run(spark, sfDir)
        sb.append(s"\n===== ${q.name} =====\n")
        sb.append(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
