package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions path registers all custom functions at session build —
  * SQL-callable with no per-session registration calls.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("withExtensions sessions see the custom functions as plain SQL") {
    // getOrCreate returns any active/default session (ignoring
    // withExtensions), so clear both first: a NEW session is built over the
    // shared SparkContext with the extension applied. Never stop() here —
    // that would kill the context for every other suite.
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT dot_ff(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
          |              array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS d,
          |       portable_hash32('abc') AS h,
          |       rolling_fingerprint(array('a','b','c','d','e','f'), 5) AS f
          |""".stripMargin).head
      assert(r.getDouble(0) == 1.5 * 2.0 + 2.0 * 3.0)
      assert(r.getLong(1) == PortableHash32.hash32("abc".getBytes("UTF-8")))
      assert(r.getLong(2) ==
        math.min(
          PortableHash32.hash32("a b c d e".getBytes("UTF-8")),
          PortableHash32.hash32("b c d e f".getBytes("UTF-8"))))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
      prior.foreach(SparkSession.setActiveSession)
    }
  }
}
