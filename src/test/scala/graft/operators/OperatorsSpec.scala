package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Per-operator unit specs on small controlled inputs (SURVEY.md §5). */
class OperatorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("exact dedup groups identical content, keeps min id") {
    val df = docs(
      (1L, "the cat sat"), (2L, "the cat sat"), (3L, "a dog ran"))
    val g = Dedup.exactGroups(df, "text", "doc_id")
      .orderBy("keep_id").collect()
    assert(g.length == 2)
    assert(g.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("canonicalGroups: punctuation/case/whitespace mutations land on one key; word changes split it") {
    val df = docs(
      (1L, "The cat sat, on the mat."),
      (2L, "the  cat sat on\tthe mat"),    // spacing + case + punct drift
      (3L, "THE CAT — SAT on the mat!!"),  // smart punct + shouting
      (4L, "the cat sat on the rug"),      // word change: different doc
      (5L, "the cat sat on the rug"))      // raw dup of 4
    val g = Dedup.canonicalGroups(df, "text", "doc_id")
      .orderBy("keep_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // group {1,2,3}: three RAW-distinct texts on one canonical key —
    // exactly the dups the q30 raw pass misses (n_raw_distinct = 3);
    // group {4,5}: raw dups stay together, n_raw_distinct = 1
    assert(g == Seq((1L, 3L, 3L), (4L, 2L, 1L)))
  }

  test("exactGroupsByKey over a precomputed sha equals exactGroups over the text") {
    import org.apache.spark.sql.functions.{col, sha2}
    val df = docs(
      (1L, "the cat sat"), (2L, "the cat sat"), (3L, "a dog ran"), (4L, "a dog ran"))
    val direct = Dedup.exactGroups(df, "text", "doc_id")
      .orderBy("keep_id").collect().toSeq
    val keyed = Dedup.exactGroupsByKey(
        df.withColumn("fp", sha2(col("text").cast("binary"), 256)).drop("text"),
        "fp", "doc_id")
      .orderBy("keep_id").collect().toSeq
    assert(direct == keyed)
  }

  test("lshCandidatePairs carry: carried columns ride the banding without changing the pair set") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val df = docs(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "alpha beta gamma epsilon"), (4L, "totally different words here"))
    val sig = Dedup.minhashSignatures(df, "text", "doc_id", 16)
      .withColumn("tag", concat(lit("t"), col("doc_id")))
    val plain = Dedup.lshCandidatePairs(sig, "doc_id", 16, bands = 2)
      .select("doc_a", "doc_b", "shared_bands")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val carried = Dedup.lshCandidatePairs(sig, "doc_id", 16, bands = 2, carry = Seq("tag"))
    assert(carried.columns.toSeq ==
      Seq("doc_a", "doc_b", "tag_a", "tag_b", "shared_bands"))
    val rows = carried.collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet == plain)
    assert(rows.forall(r => r.getString(2) == s"t${r.getLong(0)}" &&
      r.getString(3) == s"t${r.getLong(1)}"))
  }

  test("minhash signatures: identical word sets -> identical signatures; word order irrelevant") {
    val df = docs(
      (1L, "alpha beta gamma"), (2L, "gamma beta alpha alpha"),
      (3L, "totally different words here"))
    val sig = Dedup.minhashSignatures(df, "text", "doc_id", 16).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(sig(1L) == sig(2L)) // same distinct-word set
    assert(sig(1L) != sig(3L))
  }

  test("minhash signature carry: extra groupBy keys leave the signature values intact") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val df = docs(
      (1L, "alpha beta gamma"), (2L, "gamma beta alpha alpha"),
      (3L, "totally different words here"))
      .withColumn("src", concat(lit("s"), col("doc_id") % 2))
    val plain = Dedup.minhashSignatures(df, "text", "doc_id", 16).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val carried = Dedup.minhashSignatures(df, "text", "doc_id", 16,
      carry = Seq("src"))
    assert(carried.columns.take(2).toSeq == Seq("doc_id", "src"))
    carried.collect().foreach { r =>
      assert(r.toSeq.drop(2) == plain(r.getLong(0)),
        s"carry changed signature of doc ${r.getLong(0)}")
      assert(r.getString(1) == s"s${r.getLong(0) % 2}")
    }
  }

  test("LSH candidate pairs surface duplicate documents") {
    val df = docs(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight"))
    val sig = Dedup.minhashSignatures(df, "text", "doc_id", 16)
    val pairs = Dedup.lshCandidatePairs(sig, "doc_id", 16, bands = 2).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(pairs.head.getLong(2) == 2L) // identical docs share both bands
  }

  test("ngram-jaccard stop-gram cap: true near-dups survive, boilerplate-only pairs are cut") {
    // 20 docs share a long boilerplate header (every header gram has
    // df = 20 > cap = 10). Docs 1 and 2 additionally share a unique body;
    // all other doc bodies are disjoint random-ish words.
    val boiler = "this document is provided under the standard license " +
      "agreement all rights reserved see terms and conditions for details"
    val body12 = "quantum flux capacitor engaged overdrive maximal entropy"
    val df = docs((1L to 20L).map { i =>
      val body = if (i <= 2) body12
      else s"unique${i}a word${i}b token${i}c item${i}d thing${i}e part${i}f"
      (i, s"$boiler $body")
    }: _*)
    def pairs(cap: Option[Int]) =
      Dedup.ngramJaccardPairs(df, "text", "doc_id", n = 3,
          threshold = 0.5, maxDocFreq = cap)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(None)
    val capped = pairs(Some(10))
    // Uncapped, boilerplate dominates every gram set: spurious pairs of
    // totally unrelated docs clear the threshold.
    assert(uncapped.exists { case (a, b) => (a, b) != (1L, 2L) },
      s"fixture mis-built: no spurious boilerplate pairs uncapped: $uncapped")
    // The cap removes exactly the quadratic boilerplate buckets: the true
    // near-dup pair survives, every spurious pair is gone.
    assert(capped == Set((1L, 2L)), s"capped = $capped")
  }

  test("simhash: identical docs equal; unrelated docs differ") {
    val df = docs(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "completely unrelated vocabulary set"))
    val s = Dedup.simhash16(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s(1L) == s(2L))
    assert(s(1L) != s(3L))
    assert(s.values.forall(v => v >= 0 && v < 65536))
  }

  test("simhash block join finds exactly the brute-force Hamming<=r pair set") {
    val gen = new scala.util.Random(7)
    val vocab = Seq("spark", "query", "join", "table", "row", "fast", "slow",
      "data", "hash", "sort", "agg", "window", "batch", "stream")
    val df = docs((1L to 40L).map(i =>
      (i, Seq.fill(8)(vocab(gen.nextInt(vocab.length))).mkString(" "))): _*)
    val sims = Dedup.simhash16(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- sims.keys; b <- sims.keys if a < b
      h = java.lang.Long.bitCount(sims(a) ^ sims(b)) if h <= 2
    } yield (a, b, h)).toSet
    val got = Dedup.simhashNearDupPairs(df, "text", "doc_id", radius = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute)
  }

  test("ngram jaccard: identical docs = 1.0; disjoint docs absent") {
    val df = docs((1L, "abcdefgh"), (2L, "abcdefgh"), (3L, "zzzzyyyy"))
    val pairs = Dedup.ngramJaccardPairs(df, "text", "doc_id", 3, 0.5).collect()
    assert(pairs.length == 1)
    assert((pairs.head.getLong(0), pairs.head.getLong(1)) == (1L, 2L))
    assert(pairs.head.getDouble(2) == 1.0)
  }

  test("cosine top-k: nearest neighbor of a vector is its duplicate, sim == 1") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)), // duplicate of 0
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val topk = Similarity.cosineTopK(
      vecs, vecs.filter(col("vec_id") === 0L), "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
    assert(topk.head.getLong(1) == 1L)
    assert(topk.head.getDouble(2) == 1.0)
    assert(topk.last.getLong(1) == 3L) // antipode ranks last
    assert(topk.last.getDouble(2) == -1.0)
  }

  test("LSH ANN buckets: identical vectors share a bucket; results subset of brute force") {
    val e = graft.Tables.embeddings(spark, SparkTestSession.sf0001)
    val q = e.filter(col("vec_id") < 4)
    val brute = Similarity.cosineTopK(e, q, "vec_id", "embedding", 50)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.cosineTopKLsh(e, q, "vec_id", "embedding", 5)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(lsh.nonEmpty)
    assert(lsh.forall { case (qid, n) => n != qid })
  }

  test("IVF ANN: deterministic, no self-matches, positive recall vs brute force") {
    val e = graft.Tables.embeddings(spark, SparkTestSession.sf0001)
    val q = e.filter(col("vec_id") < 8)
    val brute = Similarity.cosineTopK(e, q, "vec_id", "embedding", 5)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.cosineTopKIvf(e, q, "vec_id", "embedding", 5)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivf.nonEmpty)
    assert(ivf.forall { case (qid, n) => n != qid })
    // approximate: some overlap with exact top-5 expected (recall > 0)
    assert((ivf intersect brute).nonEmpty)
    val ivf2 = Similarity.cosineTopKIvf(e, q, "vec_id", "embedding", 5)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivf == ivf2) // deterministic
  }

  test("contrastive triplets: band invariants, determinism, argmax-vs-candidates, plan shape") {
    val e = graft.Tables.embeddings(spark, SparkTestSession.sf0001)
      .filter(col("vec_id") < 400)
    val trip = Similarity.contrastiveTriplets(
      e, "vec_id", "embedding", posThreshold = 0.4, negLo = 0.1)
    val rows = trip.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (anchor, posId, posSim) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val (negId, negSim) = (r.getLong(3), r.getDouble(4))
      // the two sides live in their bands and never coincide
      assert(posSim >= 0.4 && negSim < 0.4 && negSim >= 0.1, r.toString)
      assert(posId != anchor && negId != anchor && posId != negId, r.toString)
    }
    assert(rows.map(_.getLong(0)).distinct.length == rows.length) // one triplet per anchor
    // per-anchor argmax agrees with the raw candidate stream: nothing in
    // the positive band beats pos_sim, nothing below it beats neg_sim
    val cand = Similarity.cosineDupPairsLsh(e, "vec_id", "embedding", threshold = 0.1)
      .collect().flatMap { r =>
        val (a, b, s) = (r.getLong(0), r.getLong(1), r.getDouble(2))
        Seq((a, b, s), (b, a, s))
      }.groupBy(_._1)
    rows.foreach { r =>
      val cs = cand(r.getLong(0)).map(_._3)
      assert(cs.filter(_ >= 0.4).max == r.getDouble(2), s"pos argmax ${r.getLong(0)}")
      assert(cs.filter(_ < 0.4).max == r.getDouble(4), s"neg argmax ${r.getLong(0)}")
    }
    // deterministic end to end (sims exact folds, ties on min id)
    val again = Similarity.contrastiveTriplets(
      e, "vec_id", "embedding", posThreshold = 0.4, negLo = 0.1).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
    // scale shape: banded self-join, never a cross product; the rank<=1
    // windows carry a WindowGroupLimit partial limit before their shuffle
    val plan = trip.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(40).mkString("\n"))
    assert(plan.contains("WindowGroupLimit"), plan.linesIterator.take(40).mkString("\n"))
  }

  test("two-stage rerank: recall >= pure-int8, exact final ordering, wide shortlist = brute force") {
    val e = graft.Tables.embeddings(spark, SparkTestSession.sf0001)
    val q = e.filter(col("vec_id") < 8)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = ids(Similarity.cosineTopK(e, q, "vec_id", "embedding", k = 5))
    val int8 = ids(Quantize.cosineTopKInt8(e, q, "vec_id", "embedding", k = 5))
    val two = ids(Quantize.twoStageTopK(e, q, "vec_id", "embedding", k = 5, shortlist = 20))
    // rerank corrects compression error INSIDE the shortlist: recall@5
    // can only improve on the pure-int8 result
    assert((two intersect brute).size >= (int8 intersect brute).size)
    // a corpus-wide shortlist degenerates to exact brute force — the
    // coarse stage then only gates zero-norm vectors, which the corpus
    // fixture doesn't contain
    val wide = ids(Quantize.twoStageTopK(e, q, "vec_id", "embedding",
      k = 5, shortlist = e.count().toInt))
    assert(wide == brute)
    // final scores are exact fp32 cosine: for shortlisted pairs that are
    // also brute-force winners, sims agree bit-for-bit
    val bruteSims = Similarity.cosineTopK(e, q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    Quantize.twoStageTopK(e, q, "vec_id", "embedding", k = 5, shortlist = 20)
      .collect().foreach { r =>
        bruteSims.get((r.getLong(0), r.getLong(1))).foreach { s =>
          assert(s == r.getDouble(2), s"sim mismatch at ${(r.getLong(0), r.getLong(1))}")
        }
      }
  }

  test("text analysis: counts and ratios on a known sentence") {
    val df = docs((1L, "The cat, and the dog. In a box!"))
    val r = df.select(
      TextAnalysis.tokenCount($"text").as("n"),
      TextAnalysis.bpeTokenCount($"text").as("bpe"),
      TextAnalysis.punctCount($"text").as("p"),
      TextAnalysis.stopwordCount($"text").as("s"),
      TextAnalysis.langIdHeuristic($"text").as("lang")).head
    assert(r.getAs[Int]("n") == 8)
    assert(r.getAs[Int]("bpe") == 11) // 8 words + ',' '.' '!'
    assert(r.getAs[Int]("p") == 3)
    assert(r.getAs[Int]("s") == 5) // the, and, the, in, a
    assert(r.getAs[String]("lang") == "en")
  }

  test("profile langid distinguishes en/de/fr/es/zh with deterministic fallbacks") {
    val df = docs(
      (1L, "The cat and the dog of a house in the yard"),
      (2L, "Der Hund ist nicht zu der die das Haus und"),
      (3L, "Le chat est la les et des une maison le"),
      (4L, "El perro es que los las y un casa el"),
      (5L, "中文文本处理很好"), // pure CJK -> zh
      (6L, "xyzzy qwerty asdf plugh"), // letters, no profile hit -> und
      (7L, "12345 678 ---")) // no letters at all -> zxx
    val got = df.select($"doc_id", TextAnalysis.langIdHeuristic($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es",
      5L -> "zh", 6L -> "und", 7L -> "zxx"))
  }

  test("fingerprints: whitespace/case normalization collapses; rolling fp survives suffix edits") {
    val df = docs(
      (1L, "Hello   World   Foo"),
      (2L, "hello world foo"),
      (3L, "a b c d e f g h i j"),
      (4L, "a b c d e f g h i CHANGED"))
    val fp = df.select($"doc_id", TextAnalysis.contentFingerprint($"text").as("c"),
      TextAnalysis.rollingFingerprint($"text").as("r"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(fp(1L)._1 == fp(2L)._1) // normalized content identical
    // doc 3 and 4 share windows 1..5 of 6; min-hash likely equal unless the
    // changed window is the minimum — assert they share at least the exact
    // property that doc3's fp is <= doc4's candidate set is non-trivial, so
    // just pin determinism:
    val fp2 = df.select(TextAnalysis.rollingFingerprint($"text").as("r"))
      .collect().map(_.getLong(0))
    assert(fp2.sameElements(df.select(TextAnalysis.rollingFingerprint($"text"))
      .collect().map(_.getLong(0))))
  }

  test("multimodal: payload bytes + stub decode are deterministic and schema-typed") {
    val df = docs((7L, "some media payload text"))
    val meta = Multimodal.metaFromDocuments(spark, df).collect().head
    assert(meta.doc_id == 7L)
    assert(meta.n_bytes == "some media payload text".getBytes("UTF-8").length)
    assert(meta.content_md5 == Multimodal.md5Hex("some media payload text".getBytes("UTF-8")))
    assert(meta.width >= 160 && meta.width < 1440)
    assert(meta.height >= 120 && meta.height < 840)
    assert(Set("jpeg", "png", "webp").contains(meta.format))
    // batch boundary: 200 records through batchSize 64 -> all present
    val many = docs((0L until 200L).map(i => (i, s"payload $i")): _*)
    assert(Multimodal.metaFromDocuments(spark, many).count() == 200)
  }

  test("multimodal resize + frame sampling: deterministic stubs, real one-to-many shape") {
    val media = Multimodal.payloadFromText(
      docs((1L, "a fairly long media payload body for resize testing purposes")),
      "doc_id", "text").as[MediaRecord]
    val resized = Multimodal.resize(media, 160, 120).collect().head
    val original = media.collect().head
    assert(resized.payload.length <= original.payload.length)
    assert(resized.payload.sameElements(
      Multimodal.resizeStub(original.payload, 160, 120))) // deterministic
    val frames = Multimodal.sampleFrames(media, framesPerRecord = 3).collect()
    assert(frames.length == 3)
    assert(frames.map(_._2).sorted.sameElements(Array(0, 1, 2)))
    assert(frames.forall(f => f._3.nonEmpty && f._3.length <= 16))
  }

  test("multimodal embed feeds the similarity stack: byte-identical media are exact dups") {
    // three media records, two with identical payloads
    val media = Multimodal.payloadFromText(
      docs((1L, "same bytes"), (2L, "same bytes"), (3L, "different content")),
      "doc_id", "text").as[MediaRecord]
    val emb = Multimodal.embed(media, dim = 16)
    assert(emb.schema("embedding").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false))
    // identical payloads -> identical embeddings -> cosine 1.0 pair out of
    // the SAME near-dup operator the text/embedding path uses
    val dups = Similarity.cosineDupPairs(emb, "doc_id", "embedding",
      threshold = 0.999, maxId = 100L)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(dups.contains((1L, 2L)))
    assert(!dups.exists(p => p._1 == 3L || p._2 == 3L))
    // deterministic across evaluations
    val again = Multimodal.embed(media, dim = 16).collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val first = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(again == first)
    // wide embeddings: dimension j and j+256 must NOT alias (full 4-byte
    // index in the expansion, not a truncated byte)
    val wide = Multimodal.embedStub("payload".getBytes("UTF-8"), 300)
    assert(!(0 until 44).forall(j => wide(j) == wide(j + 256)))
  }
}
