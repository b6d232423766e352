package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Ground truth for [[BpeTrainer]]: a scalar re-implementation of the
  * same count-argmax-apply recurrence (same tie-break, same two-pass
  * literal-replace application — Java `String.replace` has the
  * identical left-to-right non-overlapping semantics as Spark's
  * `replace` expression) must reproduce the learned merge table and the
  * final token frequencies exactly; every quantity is an integer or a
  * string, so equality is strict.
  */
class BpeTrainerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Scalar twin of [[BpeTrainer.train]] over (word -> cnt). */
  private def scalarTrain(
      words: Map[String, Long],
      rounds: Int): (Seq[(Int, String, String, String, Long)], Map[String, Long]) = {
    var vocab: Map[String, Long] = words.toSeq
      .map { case (w, c) => (w.toCharArray.mkString(" "), c) }
      .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, cnt) <- vocab) {
        val s = syms.split(" ")
        for (i <- 0 until s.length - 1)
          counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + cnt
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, g), c) = counts.toSeq
          .sortBy { case ((l, g), c) => (-c, l, g) }.head
        merges += ((r, l, g, l + g, c))
        val pat = s" $l $g "
        val rep = s" $l$g "
        vocab = vocab.toSeq
          .map { case (syms, cnt) =>
            ((" " + syms + " ").replace(pat, rep).replace(pat, rep).trim, cnt)
          }
          .groupBy(_._1).map { case (s2, grp) => s2 -> grp.map(_._2).sum }
      }
      r += 1
    }
    (merges.result(), vocab)
  }

  private def scalarWords(texts: Seq[String]): Map[String, Long] =
    texts
      .flatMap(_.toLowerCase.trim.split("\\s+"))
      .filter(_.matches("^[a-z]+$"))
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }

  private val texts = Seq(
    "low low lower",
    "lowest low lower",
    "newer new newest",
    "wider wide new")
  private val docs =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("mergeTable equals the scalar recurrence (order, ties, counts)") {
    val (merges, _) = scalarTrain(scalarWords(texts), BpeTrainer.Rounds)
    val got = BpeTrainer.mergeTable(docs, "text")
      .as[(Int, String, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == merges)
  }

  test("tokenFrequencies equals the scalar final vocabulary") {
    val (_, vocab) = scalarTrain(scalarWords(texts), BpeTrainer.Rounds)
    val expected = vocab.toSeq
      .flatMap { case (syms, cnt) => syms.split(" ").map((_, cnt)) }
      .groupBy(_._1).map { case (t, g) => (t, g.map(_._2).sum) }
    val got = BpeTrainer.tokenFrequencies(docs, "text")
      .as[(String, Long)].collect().toMap
    assert(got == expected)
  }

  test("stops early when every word is fully merged") {
    val tiny = Seq((1L, "ab ab b a")).toDF("doc_id", "text")
    // Round 1 merges (a,b) -> "ab"; afterwards no word has 2+ symbols.
    val got = BpeTrainer.mergeTable(tiny, "text")
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "b", "ab", 2L)))
  }

  test("two-pass replace merges back-to-back occurrences in one round") {
    // "abab" -> "a b a b"; pair (a,b) wins round 1. A single replace
    // pass would leave "ab a b" (the match consumes the shared boundary
    // space); the second pass must yield "ab ab".
    val tiny = Seq((1L, "abab")).toDF("doc_id", "text")
    val got = BpeTrainer.tokenFrequencies(tiny, "text", rounds = 1)
      .as[(String, Long)].collect().toMap
    assert(got == Map("ab" -> 2L))
  }

  /** Scalar twin of [[BpeTrainer.trainBatched]]: candidate window,
    * greedy disjoint acceptance (symbols AND concatenations unused),
    * merges applied in acceptance order, each as the two-pass replace.
    */
  private def scalarTrainBatched(
      words: Map[String, Long],
      rounds: Int,
      batchK: Int,
      candN: Int): (Seq[(Int, Int, String, String, String, Long)], Map[String, Long]) = {
    var vocab: Map[String, Long] = words.toSeq
      .map { case (w, c) => (w.toCharArray.mkString(" "), c) }
      .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
    val merges = Seq.newBuilder[(Int, Int, String, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, cnt) <- vocab) {
        val s = syms.split(" ")
        for (i <- 0 until s.length - 1)
          counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + cnt
      }
      if (counts.isEmpty) done = true
      else {
        val cands = counts.toSeq
          .sortBy { case ((l, g), c) => (-c, l, g) }.take(candN)
        val used = scala.collection.mutable.Set[String]()
        val picked = Seq.newBuilder[(String, String, Long)]
        var n = 0
        for (((l, g), c) <- cands if n < batchK) {
          if (!used(l) && !used(g) && !used(l + g)) {
            picked += ((l, g, c)); used ++= Seq(l, g, l + g); n += 1
          }
        }
        val ps = picked.result()
        ps.zipWithIndex.foreach { case ((l, g, c), i) =>
          merges += ((r, i + 1, l, g, l + g, c))
        }
        vocab = vocab.toSeq
          .map { case (syms, cnt) =>
            val out = ps.foldLeft(syms) { case (acc, (l, g, _)) =>
              val pat = s" $l $g "
              val rep = s" $l$g "
              (" " + acc + " ").replace(pat, rep).replace(pat, rep).trim
            }
            (out, cnt)
          }
          .groupBy(_._1).map { case (s2, grp) => s2 -> grp.map(_._2).sum }
      }
      r += 1
    }
    (merges.result(), vocab)
  }

  test("mergeTableBatched equals the scalar batched recurrence") {
    val (merges, _) = scalarTrainBatched(
      scalarWords(texts), BpeTrainer.BatchRounds,
      BpeTrainer.BatchK, BpeTrainer.BatchCandidates)
    val got = BpeTrainer.mergeTableBatched(docs, "text")
      .as[(Int, Int, String, String, String, Long)]
      .collect().toSeq.sortBy(m => (m._1, m._2))
    assert(got == merges)
    // The fixture must actually exercise batching: at least one round
    // accepts 2 disjoint merges (merges/job > 1, the point of the face).
    assert(merges.groupBy(_._1).exists(_._2.size == BpeTrainer.BatchK))
  }

  test("trainBatched at batchK = 1 degenerates to the sequential trainer") {
    val (seqMerges, _) = BpeTrainer.train(docs, "text")
    val (batched, v) = BpeTrainer.trainBatched(
      docs, "text", rounds = BpeTrainer.Rounds, batchK = 1)
    graft.operators.Checkpoints.release(v)
    assert(batched.map(m => (m.round, m.lft, m.rgt, m.pairCount)) ==
      seqMerges.map(m => (m.round, m.lft, m.rgt, m.pairCount)))
    assert(batched.forall(_.slot == 1))
  }

  test("disjointness guard defers an overlapping runner-up to the next round") {
    // "a b c": round 1 counts (a,b) = (b,c) = 3; ties break ascending so
    // slot 1 takes (a,b), and (b,c) shares b -> rejected. Round 2 then
    // merges (ab, c) on the rewritten vocab.
    val tiny = Seq((1L, "abc abc abc")).toDF("doc_id", "text")
    val got = BpeTrainer.mergeTableBatched(tiny, "text")
      .as[(Int, Int, String, String, String, Long)]
      .collect().toSeq.sortBy(m => (m._1, m._2))
    assert(got == Seq(
      (1, 1, "a", "b", "ab", 3L),
      (2, 1, "ab", "c", "abc", 3L)))
  }

  test("encode equals the scalar lexicon join") {
    val (_, vocab) = scalarTrain(scalarWords(texts), BpeTrainer.Rounds)
    val lex = vocab.keys
      .map(s => s.replace(" ", "") -> s.split(" ").length.toLong).toMap
    val expected = texts.zipWithIndex.flatMap { case (t, i) =>
      val ws = t.toLowerCase.trim.split("\\s+").filter(_.matches("^[a-z]+$"))
      if (ws.isEmpty) None
      else Some((i.toLong, ws.length.toLong,
        ws.map(lex).sum, ws.map(_.length.toLong).sum))
    }.toSet
    val got = BpeTrainer.encode(docs, "text", "doc_id")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("vocabFold is exact: fold(vocab(A), B) == vocab(A ++ B), and retrain matches from-scratch") {
    val a = docs.filter($"doc_id" % 2 === 0)
    val b = docs.filter($"doc_id" % 2 === 1)
    val folded = BpeTrainer.vocabFold(BpeTrainer.vocab(a, "text"), b, "text")
    val full = BpeTrainer.vocab(docs, "text")
    assert(
      folded.as[(String, Long)].collect().toMap ==
        full.as[(String, Long)].collect().toMap)
    // the differential check the registry's q214 pins at scale:
    // fold-then-train == from-scratch merge table, bit for bit
    val got = BpeTrainer.mergeTableFromVocab(folded)
      .as[(Int, String, String, String, Long)].collect().toSeq.sortBy(_._1)
    val want = BpeTrainer.mergeTable(docs, "text")
      .as[(Int, String, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == want && got.nonEmpty)
    // both slices genuinely contribute words the other lacks
    val va = BpeTrainer.vocab(a, "text").as[(String, Long)].collect().toMap
    val vb = BpeTrainer.vocab(b, "text").as[(String, Long)].collect().toMap
    assert((vb.keySet -- va.keySet).nonEmpty && (va.keySet -- vb.keySet).nonEmpty)
  }

  test("fertilityScreen is the integer cross-multiplied verdict over encode") {
    val enc = BpeTrainer.encode(docs, "text", "doc_id")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, _, nt, nc) => id -> ((nc, nt)) }.toMap
    val got = BpeTrainer.fertilityScreen(docs, "text", "doc_id", num = 3, den = 2)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(got.map(_._1).toSet == enc.keySet) // same coverage as encode
    assert(got.forall { case (id, nc, nt, kept) =>
      enc(id) == ((nc, nt)) && kept == (nc * 2 >= nt * 3)
    })
    // threshold 3/2 genuinely splits this corpus both ways
    assert(got.exists(_._4) && got.exists(!_._4))
  }
}
