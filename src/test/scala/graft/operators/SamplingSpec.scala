package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Deterministic sampling/splitting + text-cleaning/repetition operators. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val keys = (1L to 2000L).toDF("id")

  test("splitLabel covers every row with bands near 80/10/10") {
    val counts = keys
      .select(Sampling.splitLabel(col("id")).as("split"))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000)
    assert(math.abs(counts("train") - 1600L) < 100)
    assert(math.abs(counts("val") - 200L) < 60)
    assert(math.abs(counts("test") - 200L) < 60)
  }

  test("split and sample are stable under repartitioning (unlike df.sample)") {
    val a = Sampling.hashSample(keys, col("id"), 30).as[Long].collect().sorted
    val b = Sampling.hashSample(keys.repartition(17), col("id"), 30)
      .as[Long].collect().sorted
    assert(a.sameElements(b))
    assert(a.nonEmpty && a.length < 2000)
  }

  test("same key lands on the same side of the split in any table (leakage guard)") {
    val docs = keys.withColumn("text", concat(lit("doc"), col("id")))
    val labels = keys.withColumn("y", col("id") % 2)
    val sd = docs.select(col("id"), Sampling.splitLabel(col("id")).as("s"))
    val sl = labels.select(col("id"), Sampling.splitLabel(col("id")).as("s"))
    assert(sd.join(sl, "id").filter(sd("s") =!= sl("s")).count() == 0)
  }

  test("stratified sample applies per-stratum rates and the default") {
    val df = (1L to 3000L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "zh" else "fr"))
      .toDF("id", "lang")
    val kept = Sampling.stratifiedHashSample(
      df, col("lang"), col("id"), Map("en" -> 50, "zh" -> 20), defaultPercent = 0)
    val counts = kept.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("fr")) // default 0% drops the whole stratum
    assert(math.abs(counts("en") - 500L) < 80) // 50% of 1000
    assert(math.abs(counts("zh") - 200L) < 60) // 20% of 1000
  }

  test("cleanText scrubs URLs and emails and collapses whitespace") {
    val df = Seq(
      "see https://ex.com/a?b=1 and   mail me@ex.org  now",
      "  no links   here  ",
      "http://x.y end").toDF("text")
    val got = df.select(TextAnalysis.cleanText(col("text"))).as[String].collect()
    assert(got(0) == "see and mail now")
    assert(got(1) == "no links here")
    assert(got(2) == "end")
    val urls = df.select(TextAnalysis.urlCount(col("text"))).as[Int].collect()
    assert(urls.toSeq == Seq(1, 0, 1))
  }

  test("splitLabel matches the scalar md5 model on every key") {
    val got = keys.select(col("id"),
      Sampling.splitLabel(col("id"), salt = "s:").as("sp")).collect()
    got.foreach { r =>
      val b = graft.functions.PortableHash32.hash32(
        ("s:" + r.getLong(0)).getBytes("UTF-8")) % 100
      val expect = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(r.getString(1) == expect, s"key ${r.getLong(0)} bucket $b")
    }
  }

  test("hash samples nest: the 30% sample is a subset of the 60% sample") {
    val s30 = Sampling.hashSample(keys, col("id"), 30).as[Long].collect().toSet
    val s60 = Sampling.hashSample(keys, col("id"), 60).as[Long].collect().toSet
    assert(s30.subsetOf(s60))
    assert(s30.size < s60.size && s60.size < 2000)
  }

  test("cleanText is idempotent over random-ish inputs") {
    val gen = new scala.util.Random(42)
    val frag = Seq("http://a.b/c?d=1", "x@y.zz", "word", "  ", "\tht tp", "a.b",
      "https://long.example/path#frag", "e%f", "@", "end.")
    val texts = (1 to 200).map(_ =>
      (1 to 1 + gen.nextInt(12)).map(_ => frag(gen.nextInt(frag.length))).mkString(" "))
    val df = texts.toDF("text")
    val once = df.select(TextAnalysis.cleanText(col("text")).as("c"))
    val twice = once.select(TextAnalysis.cleanText(col("c")).as("c"))
    assert(once.as[String].collect().toSeq == twice.as[String].collect().toSeq)
  }

  test("chunking: stride windows cover every token; short docs emit one chunk") {
    val df = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")), // 100 tokens
      (2L, "a b c"), // < chunk -> single chunk
      (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkByTokens(df, "text", "doc_id", chunkTokens = 50, overlap = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    // doc 1: ceil((100-10)/40)=3 chunks at starts 0/40/80
    assert(got.keys.count(_._1 == 1L) == 3)
    assert(got((1L, 0)) == (1 to 50).map(i => s"t$i").mkString(" "))
    assert(got((1L, 1)) == (41 to 90).map(i => s"t$i").mkString(" "))
    assert(got((1L, 2)) == (81 to 100).map(i => s"t$i").mkString(" ")) // clipped
    // overlap property: consecutive chunks share exactly 10 tokens
    assert(got((1L, 0)).split(" ").takeRight(10).sameElements(
      got((1L, 1)).split(" ").take(10)))
    assert(got.keys.count(_._1 == 2L) == 1 && got((2L, 0)) == "a b c")
    assert(got.keys.count(_._1 == 3L) == 1 && got((3L, 0)) == "")
  }

  test("chunking equals the scalar model for every token count 1..120") {
    def model(toks: IndexedSeq[String], chunk: Int, overlap: Int): Seq[String] = {
      val step = chunk - overlap
      val k = math.max(1, (toks.length - overlap + step - 1) / step)
      (0 until k).map(i => toks.slice(i * step, i * step + chunk).mkString(" "))
    }
    val df = (1 to 120).map(n => (n.toLong, (1 to n).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkByTokens(df, "text", "doc_id", chunkTokens = 50, overlap = 10)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.sortBy(_.getInt(1)).map(_.getString(2)).toSeq }
    (1 to 120).foreach { n =>
      val expect = model((1 to n).map(i => s"w$i"), 50, 10)
      assert(got(n.toLong) == expect, s"n=$n")
    }
  }

  test("repetition ratios: repeated tokens score high, unique text scores 0") {
    val df = Seq(
      (1L, "a a a a"), // words: 4 total 1 distinct; bigrams: 3 total 1 distinct
      (2L, "a b c d"), // all unique
      (3L, "solo"), // single token -> both 0 by definition
      (4L, "")).toDF("id", "text")
    val got = df.select(col("id"),
      TextAnalysis.bigramRepetitionRatio(col("text")).as("b"),
      TextAnalysis.wordRepetitionRatio(col("text")).as("w"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got(1L) == ((2.0 / 3.0, 0.75)))
    assert(got(2L) == ((0.0, 0.0)))
    assert(got(3L) == ((0.0, 0.0)))
    assert(got(4L) == ((0.0, 0.0)))
  }

  test("mixture interleave matches the scalar stride model and honors weight proportions") {
    val df = (0L until 90L).map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "zh" else "de"))
      .toDF("id", "lang")
    val got = Sampling.mixtureInterleave(df, col("lang"), col("id"),
        Map("en" -> 3.0, "zh" -> 2.0), defaultWeight = 1.0)
      .select("id", "interleave_key").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // scalar model: per lang in id order, key = (rank - 0.5) / w
    val byLang = (0L until 90L).groupBy(i =>
      if (i % 3 == 0) "en" else if (i % 3 == 1) "zh" else "de")
    byLang.foreach { case (lang, ids) =>
      val w = lang match { case "en" => 3.0; case "zh" => 2.0; case _ => 1.0 }
      ids.sorted.zipWithIndex.foreach { case (id, r) =>
        assert(got(id) == (r + 0.5) / w, s"id=$id")
      }
    }
    // weight proportions hold on schedule prefixes: first 30 of the
    // ascending-key order contain en:zh:de at 3:2:1 (15/10/5)
    val order = got.toSeq.sortBy(_._2).map(_._1)
    val prefix = order.take(30).groupBy(i =>
      if (i % 3 == 0) "en" else if (i % 3 == 1) "zh" else "de").view.mapValues(_.size).toMap
    assert(prefix == Map("en" -> 15, "zh" -> 10, "de" -> 5), s"prefix=$prefix")
  }

  test("weighted sample: selection frequency tracks weight; draw is salt-reproducible") {
    // one stratum, 100 rows: ids 0-49 weight 9.0, ids 50-99 weight 1.0;
    // over 30 salted draws of k=10, heavy rows should win the large
    // majority of slots (E[heavy share] = 90% at these weights).
    val df = (0L until 100L).map(i => (i, "s", if (i < 50) 9.0 else 1.0))
      .toDF("id", "grp", "w")
    val picks = (0 until 30).flatMap { s =>
      Sampling.weightedHashSample(df, col("grp"), col("id"), col("w"),
          k = 10, salt = s"t$s:")
        .select("id").collect().map(_.getLong(0))
    }
    val heavyShare = picks.count(_ < 50).toDouble / picks.size
    assert(heavyShare > 0.7, f"heavy-weight share $heavyShare%.2f too low")
    // reproducible: same salt -> identical sample
    def draw() = Sampling.weightedHashSample(df, col("grp"), col("id"), col("w"),
        k = 10, salt = "fixed:").select("id").collect().map(_.getLong(0)).toSeq
    assert(draw() == draw())
  }

  test("fillTokenBudget keeps the best-quality prefix per group, running total included") {
    val df = Seq(
      // (id, grp, score, tokens) — grp a: scores force order 3,1,2
      (1L, "a", 0.5, 40L), (2L, "a", 0.25, 40L), (3L, "a", 0.75, 40L),
      (4L, "b", 1.0, 150L), (5L, "b", 0.9, 10L)
    ).toDF("id", "grp", "score", "tokens")
    val got = Sampling.fillTokenBudget(df, "grp", "score", "id", "tokens", 100L)
      .select("id", "cum_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // grp a: order 3(40),1(80),2(120) -> keep 3 and 1
    // grp b: order 4(150 > budget) -> its tokens still count: nothing kept
    //        (5's cum is 160) — prefix semantics, not skip-and-continue
    assert(got == Map(3L -> 40L, 1L -> 80L))
  }

  test("sharded token budget equals the one-phase form, including uneven shard overflow") {
    val rnd = new scala.util.Random(7)
    // 3 groups x 400 rows; token sizes mix tiny and huge so different
    // hash shards overflow at different ranks (the case where a naive
    // thin-then-select would over-keep rows after a dropped one).
    val rows = for {
      g <- Seq("a", "b", "c"); i <- 0 until 400
    } yield (g.hashCode.toLong * 1000 + i, g,
      (rnd.nextInt(5) * 25).toDouble / 100.0,
      if (rnd.nextInt(10) == 0) 500L + rnd.nextInt(1000) else 1L + rnd.nextInt(50))
    val df = rows.toDF("id", "grp", "score", "tokens")
    for (budget <- Seq(100L, 1000L, 5000L); shards <- Seq(2, 7, 32)) {
      val one = Sampling.fillTokenBudget(df, "grp", "score", "id", "tokens", budget)
        .select("id", "cum_tokens").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val two = Sampling.fillTokenBudgetSharded(df, "grp", "score", "id", "tokens",
          budget, shards)
        .select("id", "cum_tokens").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(two == one, s"budget=$budget shards=$shards: ${two.size} vs ${one.size}")
    }
  }

  test("materializeOrder: range-partitioned distributed sort yields the full schedule in partition order") {
    val docs = graft.Tables.documents(spark, SparkTestSession.sf0001)
    val keyed = Sampling.mixtureInterleaveSharded(
      docs, col("lang"), col("doc_id"), Map("en" -> 3.0, "de" -> 2.0), 1.0)
    val ordered = Sampling.materializeOrder(keyed, col("interleave_key"), partitions = 8)
    val rows = ordered.select("ord_partition", "interleave_key")
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    // collect returns partitions in index order; within each the local
    // sort ran; range boundaries make partition i's keys <= partition
    // i+1's — so the flat sequence must be globally non-decreasing
    assert(rows.nonEmpty)
    assert(rows.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
      "schedule not globally ordered across partitions")
    assert(rows.map(_._1).distinct.length > 1, "everything landed in one partition")
    val plan = ordered.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan.linesIterator.take(15).mkString("\n"))
    // the sort is local (global=false renders as "], false, 0")
    assert(!plan.contains("], true, 0"), "unexpected global sort node")
  }

  // ---- mixture epochs ----

  // (source, id, tokens): s1 = 30 tokens, s2 = 10, s3 = 20
  private lazy val epochDocs = Seq(
    ("s1", 1L, 10L), ("s1", 2L, 20L),
    ("s2", 3L, 10L),
    ("s3", 4L, 5L), ("s3", 5L, 15L))
    .toDF("source", "doc_id", "toks")

  test("mixtureEpochPlan: integer targets, ceil epochs, cap, zero-weight exclusion") {
    // weights: s1=2, s2=5, s3=0; W=7; budget=140 -> targets 40, 100, 0
    // epochs: ceil(40/30)=2; ceil(100/10)=10 capped at 4; 0
    val got = Sampling.mixtureEpochPlan(
        epochDocs, "source", "doc_id", col("toks"),
        Map("s1" -> 2L, "s2" -> 5L, "s3" -> 0L),
        budget = 140L, maxEpochs = 4L)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("s1", 2L, 30L, 2L, 2L, 40L, 2L, 40L),
      ("s2", 1L, 10L, 3L, 5L, 100L, 4L, 40L),
      ("s3", 2L, 20L, 5L, 0L, 0L, 0L, 0L)))
  }

  test("mixtureEpochPlan raises when every weight is zero") {
    val ex = intercept[Exception] {
      Sampling.mixtureEpochPlan(
        epochDocs, "source", "doc_id", col("toks"),
        Map("s1" -> 0L, "s2" -> 0L, "s3" -> 0L),
        budget = 100L, defaultWeight = 0L).collect()
    }
    val chain = Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(chain.contains("weights are zero"), s"unexpected: $ex")
  }

  test("mixtureEpochMaterialize: epoch-major order, exact per-source cut") {
    val got = Sampling.mixtureEpochMaterialize(
        epochDocs, "source", "doc_id", col("toks"),
        Map("s1" -> 2L, "s2" -> 5L, "s3" -> 0L),
        budget = 140L, maxEpochs = 4L, shards = 3)
      .as[(String, Long, Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._3, r._2)).toSeq
    assert(got == Seq(
      // s1 target 40: epoch1 (10+20=30), epoch2 first doc only (40)
      ("s1", 1L, 1L, 10L, 10L), ("s1", 2L, 1L, 20L, 30L), ("s1", 1L, 2L, 10L, 40L),
      // s2 target 100 but 4 epochs x 10 = 40 carried
      ("s2", 3L, 1L, 10L, 10L), ("s2", 3L, 2L, 10L, 20L),
      ("s2", 3L, 3L, 10L, 30L), ("s2", 3L, 4L, 10L, 40L)))
    // s3 excluded entirely (zero weight)
    assert(!got.exists(_._1 == "s3"))
  }

  test("mixtureEpochMaterialize equals a scalar model on a randomized corpus") {
    val rnd = new scala.util.Random(41)
    val data = for {
      s <- Seq("a", "b", "c", "d"); i <- 1 to (5 + rnd.nextInt(20))
    } yield (s, (s.hashCode.toLong % 97) * 1000 + i, 1L + rnd.nextInt(30))
    val weights = Map("a" -> 3L, "c" -> 2L)
    val budget = 600L
    val cap = 5L
    // scalar model
    val bySrc = data.groupBy(_._1)
    val w = bySrc.keys.map(s => s -> weights.getOrElse(s, 1L)).toMap
    val wTot = w.values.sum
    val want = bySrc.toSeq.flatMap { case (s, rows) =>
      val tokens = rows.map(_._3).sum
      val target = budget * w(s) / wTot
      val epochs = math.min(cap,
        if (target > 0 && tokens > 0) (target + tokens - 1) / tokens else 0L)
      val stream = for {
        e <- 1L to epochs; r <- rows.sortBy(_._2)
      } yield (s, r._2, e, r._3)
      stream.scanLeft(("", 0L, 0L, 0L, 0L)) { case ((_, _, _, _, cum), (src, id, e, t)) =>
        (src, id, e, t, cum + t)
      }.drop(1).takeWhile(_._5 <= target)
    }.sortBy(r => (r._1, r._3, r._2))
    val got = Sampling.mixtureEpochMaterialize(
        data.toDF("source", "doc_id", "toks"), "source", "doc_id", col("toks"),
        weights, budget = budget, maxEpochs = cap, shards = 4)
      .as[(String, Long, Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._3, r._2)).toSeq
    assert(got == want)
  }

  test("mixtureEpochMaterializeWeighted equals the Map form on equal weights") {
    // The derived-weight face shares materializeFromPlan with the
    // literal form; fed a weight FRAME equal to the Map (every source
    // listed, so defaultWeight never applies), the streams must be
    // identical row for row — order keys, cuts, exclusions and all.
    val weights = Map("s1" -> 2L, "s2" -> 5L, "s3" -> 0L)
    val wFrame = weights.toSeq.toDF("source", "weight")
    val got = Sampling.mixtureEpochMaterializeWeighted(
        epochDocs, "source", "doc_id", col("toks"), wFrame,
        budget = 140L, maxEpochs = 4L, shards = 3)
      .as[(String, Long, Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._3, r._2)).toSeq
    val want = Sampling.mixtureEpochMaterialize(
        epochDocs, "source", "doc_id", col("toks"), weights,
        budget = 140L, maxEpochs = 4L, shards = 3)
      .as[(String, Long, Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._3, r._2)).toSeq
    assert(got == want)
  }

  test("mixtureEpochMaterialize raises on negative ids (order-key aliasing)") {
    val bad = Seq(("s1", -1L, 10L), ("s1", 2L, 10L)).toDF("source", "doc_id", "toks")
    val ex = intercept[Exception] {
      Sampling.mixtureEpochMaterialize(
        bad, "source", "doc_id", col("toks"), Map.empty, budget = 100L).collect()
    }
    val chain = Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(chain.contains("non-negative"), s"unexpected: $ex")
  }

  test("mixtureEpochMaterialize raises on ids large enough to wrap the order key") {
    // hash-sized ids: epoch * (max_id + 1) would overflow Long silently
    val bad = Seq(("s1", Long.MaxValue / 2, 10L), ("s1", 2L, 10L))
      .toDF("source", "doc_id", "toks")
    val ex = intercept[Exception] {
      Sampling.mixtureEpochMaterialize(
        bad, "source", "doc_id", col("toks"), Map.empty,
        budget = 100L, maxEpochs = 4L).collect()
    }
    val chain = Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(chain.contains("wrap"), s"unexpected: $ex")
  }

  test("temperatureWeightsSqrt flattens shares toward uniform, exactly in ppm") {
    // 3 sources with 90%/9%/1% of tokens: sqrt-scaling must pull the big
    // source's weight DOWN from its share and every small source's UP,
    // with weights still summing to ~1e6 (floor slack < #sources).
    val df = (Seq.fill(90)("big") ++ Seq.fill(9)("mid") ++ Seq("small"))
      .zipWithIndex.map { case (s, i) => (s, i.toLong, 100L) }
      .toDF("source", "doc_id", "toks")
    val w = Sampling.temperatureWeightsSqrt(df, "source", col("toks"))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(w("big")._2 < w("big")._1)     // 900000 -> ~620xxx
    assert(w("mid")._2 > w("mid")._1)     // 90000  -> ~196xxx
    assert(w("small")._2 > w("small")._1) // 10000  -> ~65xxx
    val wsum = w.values.map(_._2).sum
    assert(wsum > 1000000L - 3 && wsum <= 1000000L, wsum.toString)
    // scalar model agreement: exact fixed-point pipeline reproduced here
    val toks = Map("big" -> 9000.0, "mid" -> 900.0, "small" -> 100.0)
    val sc = toks.view.mapValues(t => math.floor(math.sqrt(t / 10000.0) * 1e12).toLong).toMap
    val st = sc.values.sum
    toks.keys.foreach { s =>
      assert(w(s)._2 == 1000000L * sc(s) / st, s)
    }
  }

  test("temperatureWeights at dyadic alpha: composition model, monotone flattening, sqrt delegation") {
    val df = (Seq.fill(90)("big") ++ Seq.fill(9)("mid") ++ Seq("small"))
      .zipWithIndex.map { case (s, i) => (s, i.toLong, 100L) }
      .toDF("source", "doc_id", "toks")
    def wAt(num: Int, den: Int): Map[String, Long] =
      Sampling.temperatureWeights(df, "source", col("toks"), num, den)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // Scalar model of the EXACT composition (alpha = 3/4 ->
    // sqrt(x) * sqrt(sqrt(x)), left-associated IEEE doubles):
    val toks = Map("big" -> 9000.0, "mid" -> 900.0, "small" -> 100.0)
    val sc34 = toks.view.mapValues { t =>
      val x = t / 10000.0
      math.floor(math.sqrt(x) * math.sqrt(math.sqrt(x)) * 1e12).toLong
    }.toMap
    val st34 = sc34.values.sum
    val got34 = wAt(3, 4)
    toks.keys.foreach(s => assert(got34(s) == 1000000L * sc34(s) / st34, s))
    // Flattening is monotone in alpha: smaller alpha = flatter mix, so
    // the dominant source's weight falls as alpha drops 1 -> 3/4 ->
    // 1/2 -> 1/4, and the smallest source's rises.
    val byAlpha = Seq(wAt(4, 4), got34, wAt(1, 2), wAt(1, 4))
    assert(byAlpha.map(_.apply("big")) == byAlpha.map(_.apply("big")).sorted.reverse)
    assert(byAlpha.map(_.apply("small")) == byAlpha.map(_.apply("small")).sorted)
    // alpha = 1 is the natural mix (w_ppm = p_ppm modulo the two floors).
    assert(math.abs(wAt(4, 4)("big") - 900000L) <= 1)
    // The sqrt form is exactly the alpha = 1/2 instance.
    val sqrtForm = Sampling.temperatureWeightsSqrt(df, "source", col("toks"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(sqrtForm == wAt(1, 2))
    // Non-dyadic and out-of-range alphas are construction errors.
    assert(intercept[IllegalArgumentException](
      Sampling.temperatureWeights(df, "source", col("toks"), 1, 3))
      .getMessage.contains("power of two"))
    assert(intercept[IllegalArgumentException](
      Sampling.temperatureWeights(df, "source", col("toks"), 5, 4))
      .getMessage.contains("(0, 1]"))
  }

  test("mixtureEpochPlanWeighted equals the Map form; negative data weight raises") {
    val docs = Seq(
      ("a", 1L, 100L), ("a", 2L, 200L), ("b", 3L, 50L), ("c", 4L, 10L))
      .toDF("source", "doc_id", "toks")
    val asMap = Map("a" -> 3L, "b" -> 1L) // c falls to default
    val asDf = asMap.toSeq.toDF("source", "weight")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val viaMap = Sampling.mixtureEpochPlan(
      docs, "source", "doc_id", col("toks"), asMap,
      budget = 1000L, defaultWeight = 2L, maxEpochs = 4L)
    val viaDf = Sampling.mixtureEpochPlanWeighted(
      docs, "source", "doc_id", col("toks"), asDf,
      budget = 1000L, defaultWeight = 2L, maxEpochs = 4L)
    assert(canon(viaMap) == canon(viaDf))
    // A negative weight is only discoverable at execution in the DF form
    // (the Map form rejects it at construction) — it must raise, not plan.
    val bad = Seq(("a", -1L)).toDF("source", "weight")
    val ex = intercept[Exception] {
      Sampling.mixtureEpochPlanWeighted(
        docs, "source", "doc_id", col("toks"), bad, budget = 1000L).collect()
    }
    val chain = Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(chain.contains("negative weight"), s"unexpected: $ex")
  }

  test("temperatureWeightsSqrt fails fast past the ppm fixed point") {
    val bad = Seq(("s1", 1L, Long.MaxValue / 1000000L + 1), ("s2", 2L, 5L))
      .toDF("source", "doc_id", "toks")
    val ex = intercept[Exception] {
      Sampling.temperatureWeightsSqrt(bad, "source", col("toks")).collect()
    }
    val chain = Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(chain.contains("fixed point"), s"unexpected: $ex")
  }
}
