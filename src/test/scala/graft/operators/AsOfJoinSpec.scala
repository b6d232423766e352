package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** As-of join semantics on hand-built corners: strictly-before, equal-time
  * inclusivity, equal-time tiebreak, and no-preceding-row nulls.
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("attaches the latest right row at-or-before each left time, per key") {
    val quotes = Seq( // (sym, t, price, qid)
      ("A", 10L, 1.0, 100L), ("A", 20L, 2.0, 101L), ("A", 30L, 3.0, 102L),
      ("B", 15L, 9.0, 200L)
    ).toDF("sym", "qt", "price", "qid")
    val trades = Seq( // (sym, t, trade)
      ("A", 5L, "t1"), // before any quote -> null
      ("A", 20L, "t2"), // equal time -> inclusive, price 2.0
      ("A", 25L, "t3"), // between -> price 2.0
      ("A", 99L, "t4"), // after all -> price 3.0
      ("B", 14L, "t5"), // before B's quote -> null
      ("C", 50L, "t6") // key with no quotes -> null
    ).toDF("sym", "tt", "trade")

    val got = AsOfJoin.joinAsOf(trades, quotes, "sym", "sym", "tt", "qt",
      "qid", Seq("price", "qid"))
      .select("trade", "price", "qid").collect()
      .map(r => r.getString(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap

    assert(got("t1") == (None, None))
    assert(got("t2") == (Some(2.0), Some(101L)))
    assert(got("t3") == (Some(2.0), Some(101L)))
    assert(got("t4") == (Some(3.0), Some(102L)))
    assert(got("t5") == (None, None))
    assert(got("t6") == (None, None))
  }

  test("equal-time right rows: the largest tiebreak wins, all payload from one row") {
    val quotes = Seq(
      ("A", 10L, 1.0, 100L),
      ("A", 10L, 7.0, 105L), // same time, larger qid -> must win as a unit
      ("A", 10L, 4.0, 103L)
    ).toDF("sym", "qt", "price", "qid")
    val trades = Seq(("A", 10L, "t")).toDF("sym", "tt", "trade")
    val r = AsOfJoin.joinAsOf(trades, quotes, "sym", "sym", "tt", "qt",
      "qid", Seq("price", "qid")).select("price", "qid").head
    assert(r.getDouble(0) == 7.0 && r.getLong(1) == 105L)
  }

  test("a NULL tiebreak loses to any non-null tiebreak at the same time") {
    val quotes = Seq(
      ("A", 10L, Some(100L), 1.0),
      ("A", 10L, None: Option[Long], 9.0) // null qid must NOT win
    ).toDF("sym", "qt", "qid", "price")
    val trades = Seq(("A", 10L, "t")).toDF("sym", "tt", "trade")
    val r = AsOfJoin.joinAsOf(trades, quotes, "sym", "sym", "tt", "qt",
      "qid", Seq("price")).select("price").head
    assert(r.getDouble(0) == 1.0)
  }

  test("user columns named like internals and colliding payload names survive") {
    // left already owns __key/__t/__side/__tie/__p/__carried AND a column
    // named like the payload -> internals must rename around all of them.
    val quotes = Seq(("A", 10L, 1.5, 100L)).toDF("sym", "qt", "price", "qid")
    val trades = Seq(("A", 20L, "t", "x", "y", "z", "w", "v", "u", 9.9))
      .toDF("sym", "tt", "trade", "__key", "__t", "__side", "__tie", "__p",
        "__carried", "price")
    val out = AsOfJoin.joinAsOf(trades, quotes, "sym", "sym", "tt", "qt",
      "qid", Seq("price", "qid"))
    assert(out.columns.count(_ == "price") == 1) // left's own price kept
    assert(out.columns.contains("price_right")) // payload renamed
    val r = out.select("price", "price_right", "qid", "__key").head
    assert(r.getDouble(0) == 9.9 && r.getDouble(1) == 1.5 && r.getLong(2) == 100L)
    assert(r.getString(3) == "x") // user's __key column untouched
  }
}
