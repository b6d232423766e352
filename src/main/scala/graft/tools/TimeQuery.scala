package graft.tools

/** Dev tool: time selected registry queries N times in one session (noop
  * sink, same methodology as Bench) to separate real plan cost from
  * first-run JIT / host noise. Usage:
  * runMain graft.tools.TimeQuery <sfDir> <repeats> <name> [name...]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val repeats = args.lift(1).map(_.toInt).getOrElse(3)
    val names = args.drop(2).toSeq
    val spark = graft.GraftSession.get("timequery", 32)
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $name: ${times.map(t => f"$t%.2f").mkString(" ")} (min ${times.min}%.2f)")
      if (sys.env.contains("TIMEQUERY_PLAN")) {
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        println(s"[plan] $name FINAL:\n${df.queryExecution.executedPlan}")
      }
    }
    spark.stop()
  }
}
