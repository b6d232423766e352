package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only scratch probe (not part of the library surface). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("probe", 4)
    try {
      val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      df.printSchema()
      df.select(col("ts"), col("ts").cast("long").as("ts_long")).show(3, false)
    } catch { case e: Throwable => println("PLAIN READ FAILED: " + e.toString.take(400)) }
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df2 = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      println("nanosAsLong:"); df2.printSchema(); df2.show(3, false)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    } catch { case e: Throwable => println("NANOS-AS-LONG READ FAILED: " + e.toString.take(400)) }
    spark.stop()
  }
}
