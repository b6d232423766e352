package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway round-14 exploration main (deleted before round end). */
object Scratch14 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = args.drop(1).headOption.getOrElse("peel")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    mode match {
      case "peel" =>
        import graft.operators.Triangles
        val e = graft.queries.DupGraphPhases.pairs(spark, dir)
          .select("doc_a", "doc_b").localCheckpoint()
        println("== edges: " + e.count())
        var cur = e
        var n = cur.count()
        var it = 0
        var done = false
        while (!done && it < 6) {
          val t0 = System.nanoTime()
          val next = Triangles.trussEdgesCollapsed(cur, "doc_a", "doc_b", 1L).localCheckpoint()
          val nn = next.count()
          println(f"cut ${it + 1}: $n -> $nn  (${(System.nanoTime() - t0) / 1e9}%.2f s)")
          if (nn == n) done = true
          cur = next; n = nn; it += 1
        }
      case "df" =>
        val toks = Tables.documents(spark, dir).filter(col("doc_id") < 1000)
          .select(explode(array_distinct(
            graft.operators.TextAnalysis.wsTokens(col("text")))).as("tok"))
        toks.groupBy("tok").agg(count(lit(1)).as("df"))
          .select(
            max("df").as("max_df"),
            expr("approx_percentile(df, array(0.5, 0.9, 0.99, 0.999))").as("pcts"),
            sum(when(col("df") > 100, 1).otherwise(0)).as("n_gt100"),
            sum(when(col("df") > 300, 1).otherwise(0)).as("n_gt300"),
            count(lit(1)).as("n_toks")).show(false)
      case "q9091" =>
        for (q <- Seq("q90_sequence_pack", "q91_mixture_interleave"); rep <- 1 to 3) {
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          println(f"$q rep$rep: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
    }
    spark.stop()
  }
}
