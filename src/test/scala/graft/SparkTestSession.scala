package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (forked test JVM). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = GraftSession.get("graft-test", 4)
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
}
