package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Ground truth for [[SortedSetContains]]: agrees with `array_contains`
  * on every probe (including unsorted input sets and non-ASCII keys,
  * where java.lang.String order diverges from byte order), propagates
  * null, and rejects non-foldable key arrays.
  */
class SortedSetContainsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("matches array_contains on unsorted ASCII and non-ASCII key sets") {
    // deliberately unsorted, with multi-byte UTF-8 keys: "é" sorts after
    // "z" in byte order but before it in some collations — the expression
    // must sort ITSELF in UTF8String order for binarySearch to be valid
    val keys = Seq("zebra", "apple", "é-accent", "中文", "banana", "")
    val probes = (keys ++ Seq("notthere", "zz", "ápple", "a")).toDF("p")
    val got = probes.select(col("p"),
      SortedSetContains.contains(col("p"), keys).as("bs"),
      array_contains(typedlit(keys), col("p")).as("lin"))
      .collect()
    got.foreach(r => assert(r.getBoolean(1) == r.getBoolean(2), r.toString))
  }

  test("null probe gives null; works through both codegen and the SQL registry") {
    val df = Seq(Some("a"), None).toDF("p")
    val got = df.select(SortedSetContains.contains(col("p"), Seq("a", "b")).as("hit"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(got.toSeq == Seq(true, null))
    graft.functions.GraftFunctions.register(spark)
    val sql = spark.sql(
      "SELECT sorted_set_contains('b', array('a', 'b')), " +
        "sorted_set_contains('c', array('a', 'b'))").head()
    assert(sql.getBoolean(0) && !sql.getBoolean(1))
  }

  test("NULL key-set literal is rejected at analysis in BOTH execution modes") {
    // Regression (round-10 ADVICE): interpreted eval short-circuited a
    // null probe before forcing the sorted set (returning NULL) while
    // codegen forced it at plan time (throwing) — the modes disagreed.
    // Rejecting the null literal at checkInputDataTypes makes the
    // divergence unreachable; both paths now fail analysis identically.
    val df = Seq(Some("a"), None).toDF("p")
    val nullKeys = typedlit[Option[Seq[String]]](None)
    for (codegen <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try {
        val ex = intercept[Exception] {
          df.select(call_function(SortedSetContains.name, col("p"), nullKeys))
            .collect()
        }
        assert(ex.getMessage.contains("NULL"), s"$codegen: ${ex.getMessage}")
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("non-foldable key array is rejected at analysis") {
    val df = Seq(("a", Seq("a", "b"))).toDF("p", "ks")
    val ex = intercept[Exception] {
      df.select(call_function(SortedSetContains.name, col("p"), col("ks"))).collect()
    }
    assert(ex.getMessage.contains("FOLDABLE"), ex.getMessage)
  }

  test("large-set probe stays correct at the maxPlanKeys scale") {
    val keys = (0 until 50000).map(i => f"k$i%06d")
    val probes = Seq("k000000", "k049999", "k050000", "missing").toDF("p")
    val got = probes.select(SortedSetContains.contains(col("p"), keys).as("h"))
      .as[Boolean].collect().toSeq
    assert(got == Seq(true, true, false, false))
  }
}
