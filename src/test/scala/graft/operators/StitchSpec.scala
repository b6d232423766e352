package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The fragment-stitch contract: planted tail/head splits are found with
  * the exact overlap string, short documents cannot participate, and a
  * document never pairs with itself even when its own head equals its
  * own tail.
  */
class StitchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("planted split is found; unrelated docs are not paired") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),   // tail: epsilon zeta
      (2L, "epsilon zeta eta theta iota"),           // head: epsilon zeta
      (3L, "one two three four"),
      (4L, "five six seven eight")
    ).toDF("doc_id", "text")
    val got = Stitch.fragmentCandidates(docs, "doc_id", "text", k = 2)
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 2L, "epsilon zeta")))
  }

  test("three-way chain stitches pairwise in order") {
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "c d e f"),
      (3L, "e f g h")
    ).toDF("doc_id", "text")
    val got = Stitch.fragmentCandidates(docs, "doc_id", "text", k = 2)
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 2L, "c d"), (2L, 3L, "e f")))
  }

  test("documents shorter than k tokens are excluded on both sides") {
    val docs = Seq(
      (1L, "x"),            // 1 token < k=2: no keys
      (2L, "x y"),          // exactly k: head == tail == "x y"
      (3L, "x y z")
    ).toDF("doc_id", "text")
    val got = Stitch.fragmentCandidates(docs, "doc_id", "text", k = 2)
      .as[(Long, Long, String)].collect().toSet
    // 2's tail "x y" == 3's head "x y"; 3's tail "y z" matches nothing;
    // 2 must not pair with itself despite head == tail.
    assert(got == Set((2L, 3L, "x y")))
  }

  test("k = 1 boundary and guard") {
    val docs = Seq((1L, "p q r"), (2L, "r s t")).toDF("doc_id", "text")
    val got = Stitch.fragmentCandidates(docs, "doc_id", "text", k = 1)
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 2L, "r")))
    intercept[IllegalArgumentException] {
      Stitch.fragmentCandidates(docs, "doc_id", "text", k = 0)
    }
  }
}
