package graft.operators

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Ground truth and plan shape for [[Funnel]]: strict-order earliest
  * completion, horizon gating, depth-0 users kept, the rollup monotone —
  * and the k sequential step windows cost ONE exchange.
  */
class FunnelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Steps = Seq("a", "b", "c")
  private val H = 100L

  // (user, type, us)
  private val events = Seq(
    // u1 completes in order within horizon
    (1L, "a", 10L), (1L, "b", 20L), (1L, "c", 30L),
    // u2: purchase-before-click — c at 15 precedes b at 40: no c AFTER b
    (2L, "a", 10L), (2L, "c", 15L), (2L, "b", 40L),
    // u3: full completion but c outside the 100us horizon from t1
    (3L, "a", 10L), (3L, "b", 50L), (3L, "c", 200L),
    // u4: never does step a (but has events) -> depth 0, all nulls
    (4L, "b", 10L), (4L, "c", 20L),
    // u5: tie — b at the SAME us as a is not strictly after
    (5L, "a", 10L), (5L, "b", 10L),
    // u6: earliest-completion — first a at 5 (not the later one at 90),
    // b must follow t1=5
    (6L, "a", 90L), (6L, "a", 5L), (6L, "b", 7L)
  ).toDF("user_id", "event_type", "us")

  test("userDepth: strict order, horizon gate, earliest completion, depth-0 rows kept") {
    val got = Funnel.userDepth(events, "user_id", "event_type", "us", Steps, H)
      .as[(Long, Option[Long], Option[Long], Option[Long], Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, Some(10L), Some(20L), Some(30L), 3L),
      (2L, Some(10L), Some(40L), None, 2L),      // c@15 not after b@40
      (3L, Some(10L), Some(50L), Some(200L), 2L), // c found but horizon-gated
      (4L, None, None, None, 0L),
      (5L, Some(10L), None, None, 1L),            // tie is not strictly after
      (6L, Some(5L), Some(7L), None, 2L)))        // t1 is the EARLIEST a
  }

  test("counts: per-step user totals, monotone nonincreasing") {
    val got = Funnel.counts(events, "user_id", "event_type", "us", Steps, H)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "a", 5L), (2L, "b", 4L), (3L, "c", 1L)))
  }

  test("randomized: userDepth equals a scalar model") {
    val rnd = new scala.util.Random(47)
    val types = Vector("a", "b", "c", "x")
    val evs = (1 to 600).map { _ =>
      (rnd.nextInt(40).toLong, types(rnd.nextInt(types.size)), rnd.nextInt(500).toLong)
    }
    def firstAfter(es: Seq[(String, Long)], t: String, after: Option[Long]): Option[Long] =
      after.flatMap(a => es.collect { case (ty, u) if ty == t && u > a => u }
        .minOption)
    val want = evs.groupBy(_._1).map { case (u, rows) =>
      val es = rows.map(r => (r._2, r._3))
      val t1 = es.collect { case ("a", us) => us }.minOption
      val t2 = firstAfter(es, "b", t1)
      val t3 = firstAfter(es, "c", t2)
      val depth = Seq(t1, t2, t3).takeWhile(t =>
        t.exists(_ - t1.get <= H)).size.toLong
      (u, t1, t2, t3, depth)
    }.toSeq.sortBy(_._1)
    val got = Funnel.userDepth(evs.toDF("user_id", "event_type", "us"),
        "user_id", "event_type", "us", Steps, H)
      .as[(Long, Option[Long], Option[Long], Option[Long], Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == want)
  }

  test("userDepth resolves caller column names other than the renamed defaults") {
    val renamed = events.toDF("uid", "etype", "micros")
    val got = Funnel.userDepth(renamed, "uid", "etype", "micros", Steps, H)
      .as[(Long, Option[Long], Option[Long], Option[Long], Long)]
      .collect().sortBy(_._1).toSeq
    val want = Funnel.userDepth(events, "user_id", "event_type", "us", Steps, H)
      .as[(Long, Option[Long], Option[Long], Option[Long], Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == want)
  }

  test("plan: the three step windows and the per-user collapse cost ONE exchange") {
    val p = Funnel.userDepth(events, "user_id", "event_type", "us", Steps, H)
      .queryExecution.explainString(FormattedMode)
    val exchanges = p.sliding("Exchange (".length).count(_ == "Exchange (")
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$p")
  }
}
