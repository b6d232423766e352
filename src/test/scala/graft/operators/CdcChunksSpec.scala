package graft.operators

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Ground truth and the insertion-robustness contract for [[CdcChunks]]:
  * chunks equal a scalar re-derivation of the boundary rule, cover each
  * document disjointly and completely, re-synchronize across a prefix
  * insertion (the property fixed-offset passages lack), and the dup
  * report charges exactly the cross-doc chunk mass.
  */
class CdcChunksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val W = 3
  private val M = 8

  /** The portable md5-prefix 32-bit hash, scalar form. */
  private def h32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** Scalar model: boundary positions, spans, chunk fingerprints. */
  private def model(text: String): Seq[(Long, Long, Long, String)] = {
    val toks = text.trim.split("\\s+")
    if (toks.isEmpty || toks.head.isEmpty) return Seq.empty
    val bs = (W to toks.length)
      .filter(i => h32(toks.slice(i - W, i).mkString(" ")) % M == 0)
    val ends = (bs :+ toks.length).distinct.sorted
    ends.foldLeft((0, Vector.empty[(Long, Long, Long, String)])) {
      case ((s, acc), e) =>
        val chunk = toks.slice(s, e).mkString(" ")
        (e, acc :+ ((s.toLong, e.toLong, (e - s).toLong, md5hex(chunk))))
    }._2
  }

  // ~60 tokens with enough hash variety for several boundaries
  private val longText = (1 to 60).map(i => s"tok${i * 7 % 23}w$i").mkString(" ")

  test("chunks equal the scalar model and partition every document") {
    val docs = Seq(
      (1L, longText),
      (2L, "a b"),                       // shorter than one window: 1 chunk
      (3L, "x")
    ).toDF("doc_id", "text")
    val got = CdcChunks.chunks(docs, "doc_id", "text", W, M)
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3, r._4, r._5)).toSet).toMap
    assert(got(1L) == model(longText).toSet)
    assert(got(2L) == Set((0L, 2L, 2L, md5hex("a b"))))
    assert(got(3L) == Set((0L, 1L, 1L, md5hex("x"))))
    // partition property: sorted chunks tile [0, n) exactly
    got.foreach { case (_, chunks) =>
      val sorted = chunks.toSeq.sortBy(_._1)
      assert(sorted.head._1 == 0L)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._2 == b._1); case _ => ()
      }
      assert(sorted.map(_._3).sum == sorted.last._2)
    }
    // the fixture is only meaningful if the long doc actually split
    assert(got(1L).size >= 3, s"fixture produced ${got(1L).size} chunks")
  }

  test("insertion robustness: chunks after the first boundary survive a prefix insertion") {
    val shifted = "zz0 zz1 zz2 zz3 zz4 " + longText
    val docs = Seq((1L, longText), (2L, shifted)).toDF("doc_id", "text")
    val ch = CdcChunks.chunks(docs, "doc_id", "text", W, M)
      .as[(Long, Long, Long, Long, String)].collect()
    val aChunks = ch.filter(_._1 == 1L)
    val bFps = ch.filter(_._1 == 2L).map(_._5).toSet
    val firstBoundary = aChunks.map(_._3).min // end of A's first chunk
    val resync = aChunks.filter(_._2 >= firstBoundary)
    assert(resync.nonEmpty)
    // every A-chunk past the first boundary reappears verbatim in B
    resync.foreach(c => assert(bFps.contains(c._5), s"chunk $c lost"))
    // contrast: fixed-offset 3-token passages share nothing after a
    // 5-token shift (5 % 3 != 0), which is exactly why CDC exists
    def fixedPassages(t: String) =
      t.trim.split("\\s+").grouped(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    assert(fixedPassages(longText).intersect(fixedPassages(shifted)).isEmpty)
  }

  test("dupReport charges exactly the cross-doc chunk mass; loners report zero") {
    val docs = Seq(
      (1L, longText),
      (2L, "zz0 zz1 zz2 zz3 zz4 " + longText),
      (3L, "solo only text never shared anywhere at all")
    ).toDF("doc_id", "text")
    val ch = CdcChunks.chunks(docs, "doc_id", "text", W, M)
      .as[(Long, Long, Long, Long, String)].collect()
    val dupFps = ch.groupBy(_._5)
      .filter(_._2.map(_._1).distinct.size >= 2).keySet
    val expect = ch.groupBy(_._1).view.mapValues { rows =>
      val dups = rows.filter(r => dupFps(r._5))
      (rows.length.toLong, rows.map(_._4).sum,
        dups.length.toLong, dups.map(_._4).sum)
    }.toMap
    val got = CdcChunks.dupReport(docs, "doc_id", "text", W, M)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(got.length == 3)
    got.foreach { case (id, nc, nt, ndc, dt, ratio) =>
      val (enc, ent, endc, edt) = expect(id)
      assert((nc, nt, ndc, dt) == (enc, ent, endc, edt), s"doc $id")
      assert(ratio == edt.toDouble / ent)
    }
    assert(got.find(_._1 == 3L).get._5 == 0L) // loner: zero dup mass
    assert(got.find(_._1 == 1L).get._5 > 0L)  // sharer: positive dup mass
  }

  test("ingestReport charges arrivals only for chunks already in the existing corpus") {
    val existing = Seq(
      (0L, longText),
      (2L, "completely separate existing body with its own words")
    ).toDF("doc_id", "text")
    val arrivals = Seq(
      (1L, "zz0 zz1 zz2 zz3 zz4 " + longText), // resyncs into doc 0's chunks
      (3L, "a novel arrival sharing nothing with the corpus")
    ).toDF("doc_id", "text")
    val exFps = CdcChunks.chunks(existing, "doc_id", "text", W, M)
      .as[(Long, Long, Long, Long, String)].collect().map(_._5).toSet
    val arCh = CdcChunks.chunks(arrivals, "doc_id", "text", W, M)
      .as[(Long, Long, Long, Long, String)].collect()
    val expect = arCh.groupBy(_._1).view.mapValues { rows =>
      val dups = rows.filter(r => exFps(r._5))
      (rows.length.toLong, rows.map(_._4).sum,
        dups.length.toLong, dups.map(_._4).sum)
    }.toMap
    val got = CdcChunks.ingestReport(existing, arrivals, "doc_id", "text", W, M)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(got.map(_._1).toSet == Set(1L, 3L)) // only arrivals report
    got.foreach { case (id, nc, nt, ndc, dt, _) =>
      assert((nc, nt, ndc, dt) == expect(id), s"doc $id")
    }
    // the resyncing arrival is charged, the novel one is clean
    assert(got.find(_._1 == 1L).get._5 > 0L)
    assert(got.find(_._1 == 3L).get._5 == 0L)
  }

  test("probeStoredReport equals ingestReport and tolerates duplicate stored rows (replay)") {
    val existing = Seq(
      (0L, longText),
      (2L, "wholly separate existing body with distinct words only")
    ).toDF("doc_id", "text")
    val arrivals = Seq(
      (1L, "zz0 zz1 zz2 zz3 zz4 " + longText),
      (3L, "a novel arrival sharing nothing with the corpus")
    ).toDF("doc_id", "text")
    val fps = CdcChunks.chunks(existing, "doc_id", "text", W, M).select("fp")
    val want = CdcChunks.ingestReport(existing, arrivals, "doc_id", "text", W, M)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    val got = CdcChunks.probeStoredReport(fps, arrivals, "doc_id", "text", W, M)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(got == want, "stored probe diverges from the inline ingest report")
    // an at-least-once appended batch = the same fps twice: the
    // semi-join membership test must be invariant under duplication
    val replayed = CdcChunks.probeStoredReport(
        fps.unionAll(fps), arrivals, "doc_id", "text", W, M)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(replayed == want, "duplicate stored rows changed the probe result")
  }

  test("sourceContainment is directed: the copying source reads high, the copied-from low") {
    val bigExtra = (1 to 40).map(i => s"own${i * 3 % 17}x$i").mkString(" ")
    val docs = Seq(
      (1L, longText, "big"),          // big source: the copied text...
      (2L, bigExtra, "big"),          // ...plus plenty of its own content
      (3L, longText, "small"),        // small source: nothing but the copy
      (4L, "totally unrelated third corpus", "other")
    ).toDF("doc_id", "text", "source")
    // scalar model over the operator's own chunk stream
    val ch = CdcChunks.chunks(docs, "doc_id", "text", W, M)
      .as[(Long, Long, Long, Long, String)].collect()
    val srcOf = Map(1L -> "big", 2L -> "big", 3L -> "small", 4L -> "other")
    val s = ch.map(c => (srcOf(c._1), c._5, c._4)).distinct
    val totals = s.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val fpsBySrc = s.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expect = (for {
      (sa, fa) <- fpsBySrc.toSeq; (sb, fb) <- fpsBySrc.toSeq if sa != sb
      shared = s.filter(x => x._1 == sa && fb(x._2)).map(_._3).sum
      if shared > 0
    } yield (sa, sb) -> ((shared, totals(sa),
      shared.toDouble / totals(sa)))).toMap
    val got = CdcChunks.sourceContainment(
        docs, "doc_id", "text", "source", W, M)
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got == expect)
    // directionality: small is fully contained in big; big only partly in small
    assert(got(("small", "big"))._3 == 1.0)
    assert(got(("big", "small"))._3 < 1.0)
    assert(!got.keys.exists(p => p._1 == "other" || p._2 == "other"))
  }

  test("chunkStructsExpr (the row-local streaming face) equals the exploded batch chunker") {
    import org.apache.spark.sql.functions.{col, posexplode}
    val docs = Seq(
      (1L, longText),
      (2L, "zz0 zz1 zz2 zz3 zz4 " + longText),
      (3L, "a b"),
      (4L, "x")
    ).toDF("doc_id", "text")
    val batch = CdcChunks.chunks(docs, "doc_id", "text", W, M)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    val rowLocal = docs
      .select(col("doc_id"), posexplode(CdcChunks.chunkStructsExpr(
        TextAnalysis.wsTokens(col("text")), W, M)).as(Seq("i", "c")))
      .select(col("doc_id"), col("c.chunk_start"), col("c.chunk_end"),
        col("c.n_chunk_tokens"), col("c.fp"))
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(rowLocal == batch)
  }

  test("plan: boundary scan is equi-only — no cartesian anywhere") {
    val docs = Seq((1L, longText), (2L, longText)).toDF("doc_id", "text")
    val p = CdcChunks.dupReport(docs, "doc_id", "text", W, M)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(30).mkString("\n"))
  }
}
