package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Generic-column API matrix (round-9 VERDICT #4): every public operator
  * entry point that takes column NAMES runs against a fixture whose
  * columns carry NON-DEFAULT names — and, crucially, where no
  * default-named column exists at all, so any internal reference to a
  * default name ("doc_id", "text", "user_id", ...) fails analysis
  * instead of silently resolving (the round-8 Funnel bug class: a window
  * built on the pre-rename column, latent for every `userCol !=
  * "user_id"`). Each case asserts value-identical output vs the same
  * data under default-style names, so a renamed run can neither error
  * NOR silently bind the wrong column.
  */
class RenamedColumnsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Values-only canonical form: operators echo fixed output names, so
    * equal values = same semantics regardless of input naming.
    */
  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(v => Option(v).fold("null") {
      case a: Seq[_] => a.mkString("[", ",", "]")
      case a: Array[_] => a.mkString("[", ",", "]")
      case x => x.toString
    }).mkString("|")).sorted.toSeq

  private def check(label: String)(mk: DataFrame => DataFrame,
      default: DataFrame, renamed: DataFrame): Unit = {
    val d = canon(mk(default))
    val r = canon(mk(renamed))
    assert(d == r, s"$label diverged under renamed columns")
  }

  // ~20 docs, 3 sources; rows 0/1 exact dups, 2/3 share an 8-token span,
  // 4/5 near-dup (one-word edit) — enough structure for every dedup op.
  private val docRows: Seq[(Long, String, String)] = {
    val span = "alpha beta gamma delta epsilon zeta eta theta"
    Seq(
      (0L, s"$span common tail one", "s1"),
      (1L, s"$span common tail one", "s1"),
      (2L, s"prefix words here $span iota kappa", "s2"),
      (3L, s"other opening text $span lambda mu", "s2"),
      (4L, "the quick brown fox jumps over the lazy dog today", "s3"),
      (5L, "the quick brown fox jumps over the lazy cat today", "s3")) ++
      (6L to 19L).map(i =>
        (i, s"unique document body number $i with filler tokens ${i * 7} ${i * 13}",
          s"s${i % 3 + 1}"))
  }
  private lazy val docsD = docRows.toDF("doc_id", "text", "source")
  private lazy val docsR = docRows.toDF("zid", "ztxt", "zsrc")

  private val embRows: Seq[(Long, Array[Float])] =
    (0L to 19L).map(i => (i, Array.tabulate(4)(j =>
      (math.sin(i * 3 + j) * 10).toFloat)))
  private lazy val embD = embRows.toDF("vec_id", "embedding")
  private lazy val embR = embRows.toDF("zvid", "zemb")

  private val evRows: Seq[(Long, Long, Long, Double, String)] =
    (0 until 40).map { i =>
      (i % 4L, i * 900000000000L, i.toLong, (i % 7).toDouble, s"t${i % 3}")
    }
  private lazy val evD = evRows.toDF("user_id", "ts", "event_id", "value", "event_type")
  private lazy val evR = evRows.toDF("zu", "zts", "zev", "zval", "zet")

  private val pairRows = Seq((0L, 1L), (1L, 2L), (5L, 6L))
  private lazy val pairsD = pairRows.toDF("doc_a", "doc_b")
  private lazy val pairsR = pairRows.toDF("pa", "pb")

  test("Dedup family resolves renamed columns") {
    check("exactGroups")(df => Dedup.exactGroups(df, df.columns(1), df.columns(0)),
      docsD, docsR)
    check("exactGroupsByKey")(df => Dedup.exactGroupsByKey(
      df.select(sha2(col(df.columns(1)), 256).as("zk"), col(df.columns(0))),
      "zk", df.columns(0)), docsD, docsR)
    check("minhashSignatures+carry")(df => Dedup.minhashSignatures(
      df, df.columns(1), df.columns(0), 16, carry = Seq(df.columns(2))),
      docsD, docsR)
    check("lshCandidatePairs+carry")(df => Dedup.lshCandidatePairs(
      Dedup.minhashSignatures(df, df.columns(1), df.columns(0), 16,
        carry = Seq(df.columns(2))),
      df.columns(0), 16, bands = 2, carry = Seq(df.columns(2))),
      docsD, docsR)
    check("bandKeys")(df => Dedup.bandKeys(
      Dedup.minhashSignatures(df, df.columns(1), df.columns(0), 16),
      df.columns(0), 16, bands = 2), docsD, docsR)
    check("incrementalClassify")(df => Dedup.incrementalClassify(
      df.filter(col(df.columns(0)) % 2 === 0),
      df.filter(col(df.columns(0)) % 2 === 1),
      df.columns(0), df.columns(1)), docsD, docsR)
    check("simhash16")(df => Dedup.simhash16(df, df.columns(1), df.columns(0)),
      docsD, docsR)
    check("simhashNearDupPairs")(df =>
      Dedup.simhashNearDupPairs(df, df.columns(1), df.columns(0), radius = 2),
      docsD, docsR)
    check("simhashWide")(df => Dedup.simhashWide(df, df.columns(1), df.columns(0)),
      docsD, docsR)
    check("simhashWideNearDupPairs")(df =>
      Dedup.simhashWideNearDupPairs(df, df.columns(1), df.columns(0)),
      docsD, docsR)
    check("ngramJaccardPairs")(df => Dedup.ngramJaccardPairs(
      df, df.columns(1), df.columns(0), maxDocFreq = Some(15)), docsD, docsR)
    check("cdcChunks")(df => CdcChunks.chunks(
      df, df.columns(0), df.columns(1), window = 3, modulus = 8),
      docsD, docsR)
    check("cdcDupReport")(df => CdcChunks.dupReport(
      df, df.columns(0), df.columns(1), window = 3, modulus = 8),
      docsD, docsR)
    check("cdcSourceContainment")(df => CdcChunks.sourceContainment(
      df, df.columns(0), df.columns(1), df.columns(2), window = 3, modulus = 8),
      docsD, docsR)
  }

  test("Components / PageRank graph ops resolve renamed columns") {
    check("connectedComponents")(df => Components.connectedComponents(
      df, df.columns(0), df.columns(1), numPartitions = Some(2)),
      pairsD, pairsR)
    check("keepCanonical")(df => Components.keepCanonical(
      (if (df.columns(0) == "doc_a") docsD else docsR),
      df, (if (df.columns(0) == "doc_a") "doc_id" else "zid"),
      df.columns(0), df.columns(1), numPartitions = Some(2)),
      pairsD, pairsR)
    // PageRank's (src, dst) is a documented column CONTRACT, not a
    // parameter — out of matrix scope by design.
  }

  test("text/corpus statistics resolve renamed columns") {
    check("pairCounts")(df => CorpusStats.pairCounts(df, df.columns(1), 5),
      docsD, docsR)
    check("gramNovelty")(df =>
      CorpusStats.gramNovelty(df, df.columns(0), df.columns(1), 3), docsD, docsR)
    check("kmvSourceResemblance")(df =>
      CorpusStats.kmvSourceResemblance(df, df.columns(2), df.columns(1), 8),
      docsD, docsR)
    check("oovRate")(df =>
      CorpusStats.oovRate(df, df.columns(0), df.columns(1), 10), docsD, docsR)
    check("tokenRarity")(df =>
      CorpusStats.tokenRarity(df, df.columns(0), df.columns(1)), docsD, docsR)
    check("tokenRaritySketch")(df =>
      CorpusStats.tokenRaritySketch(df, df.columns(0), df.columns(1), 4, 64),
      docsD, docsR)
    check("vocabCoverage")(df =>
      CorpusStats.vocabCoverage(df, df.columns(1), 10), docsD, docsR)
    check("modelRankAgreement")(df =>
      ImportanceModels.modelRankAgreement(
        df, df.columns(1), df.columns(0), df.columns(2),
        targetPred = col(df.columns(2)) === "s1",
        trainPred = col(df.columns(2)) === "s1"),
      docsD, docsR)
    check("sourceDrift")(df =>
      CorpusStats.sourceDrift(df, df.columns(2), df.columns(1)), docsD, docsR)
    check("chunkByTokens")(df =>
      TextAnalysis.chunkByTokens(df, df.columns(1), df.columns(0), 5, 1),
      docsD, docsR)
    check("langConsistency")(df =>
      TextAnalysis.langConsistency(df, df.columns(1), df.columns(0), 5, 1),
      docsD, docsR)
    check("bm25")(df => Bm25.topK(df, df.columns(0), df.columns(1),
      Seq("quick fox"), 3), docsD, docsR)
    check("spanDedup.windows")(df =>
      SpanDedup.windows(df, df.columns(0), df.columns(1), 8), docsD, docsR)
    check("spanDedup.dupSpans")(df =>
      SpanDedup.dupSpans(df, df.columns(0), df.columns(1), 8), docsD, docsR)
    check("spanDedup.removeDupSpans")(df =>
      SpanDedup.removeDupSpans(df, df.columns(0), df.columns(1), 8), docsD, docsR)
    check("stitch")(df =>
      Stitch.fragmentCandidates(df, df.columns(0), df.columns(1), 4), docsD, docsR)
    check("boilerplate.passages")(df =>
      Boilerplate.passages(df, df.columns(0), df.columns(1), 3), docsD, docsR)
    check("boilerplate.remove")(df =>
      Boilerplate.removeBoilerplate(df, df.columns(0), df.columns(1), 3, 2),
      docsD, docsR)
    check("boilerplate.removeNormalized")(df =>
      Boilerplate.removeBoilerplateNormalized(df, df.columns(0), df.columns(1), 3, 2),
      docsD, docsR)
    check("multimodal.payloadFromText")(df => {
      val out = Multimodal.payloadFromText(df, df.columns(0), df.columns(1))
      out.select(col(out.columns(0)), length(col("payload")).as("len"))
    }, docsD, docsR)
    check("fuzzy.segmentBlockedPairs")(df =>
      FuzzyJoin.segmentBlockedPairs(df.select(col(df.columns(1)), col(df.columns(0))),
        df.columns(1), df.columns(0), maxDist = 2, numSegments = 3),
      docsD, docsR)
  }

  test("decontamination resolves renamed columns") {
    def bench(df: DataFrame) = df.filter(col(df.columns(0)) < 3)
    check("decontaminate.report")(df => Decontaminate.report(
      df, bench(df), df.columns(1), df.columns(0), n = 4), docsD, docsR)
    check("decontaminate.leakage")(df => Decontaminate.leakageReport(
      df, bench(df), df.columns(1), df.columns(0), n = 4), docsD, docsR)
    def embBench(df: DataFrame) = df.filter(col(df.columns(0)) < 3)
    check("decontaminate.semantic")(df => Decontaminate.semanticReport(
      df, embBench(df), df.columns(0), df.columns(1), threshold = 0.8),
      embD, embR)
    check("decontaminate.semanticLsh")(df => Decontaminate.semanticReportLsh(
      df, embBench(df), df.columns(0), df.columns(1), threshold = 0.8,
      tables = 2, bitsPerTable = 2, dim = 4), embD, embR)
  }

  test("similarity / quantization resolve renamed columns") {
    def queries(df: DataFrame) = df.filter(col(df.columns(0)) < 2)
    check("cosineTopK")(df => Similarity.cosineTopK(
      df, queries(df), df.columns(0), df.columns(1), 3), embD, embR)
    check("cosineTopKLsh")(df => Similarity.cosineTopKLsh(
      df, queries(df), df.columns(0), df.columns(1), 3, numPlanes = 4, dim = 4),
      embD, embR)
    check("cosineTopKIvf")(df => Similarity.cosineTopKIvf(
      df, queries(df), df.columns(0), df.columns(1), 3, nlist = 4, nprobe = 2),
      embD, embR)
    check("cosineDupPairs")(df => Similarity.cosineDupPairs(
      df, df.columns(0), df.columns(1), threshold = 0.5, maxId = 100L),
      embD, embR)
    check("cosineDupPairsLsh")(df => Similarity.cosineDupPairsLsh(
      df, df.columns(0), df.columns(1), threshold = 0.5, tables = 2,
      bitsPerTable = 2, dim = 4), embD, embR)
    check("centroids")(df => Similarity.centroids(
      df, df.columns(0), df.columns(1), nlist = 4), embD, embR)
    check("trainedCentroids")(df => Similarity.trainedCentroids(
      df, df.columns(0), df.columns(1), nlist = 4, maxIter = 3), embD, embR)
    check("labelCentroids")(df => Similarity.labelCentroids(
      df.select(col(df.columns(0)), (col(df.columns(0)) % 3).as("zlbl"),
        col(df.columns(1))), "zlbl", df.columns(1)), embD, embR)
    check("quantize.int8")(df => Quantize.int8(df, df.columns(0), df.columns(1)),
      embD, embR)
    check("quantize.cosineTopKInt8")(df => Quantize.cosineTopKInt8(
      df, queries(df), df.columns(0), df.columns(1), 3), embD, embR)
  }

  test("random projection resolves renamed columns") {
    check("randomProjection")(df =>
      RandomProjection.project(df, df.columns(0), df.columns(1), 4, 2),
      embD, embR)
  }

  test("IVF index build/probe resolves renamed columns") {
    def run(df: DataFrame): DataFrame = {
      val prefix = s"graft_mtx_ivf_${df.columns(0)}"
      IvfIndex.build(df, df.columns(0), df.columns(1), nlist = 4, buckets = 2,
        prefix = prefix)
      IvfIndex.probe(spark, df.filter(col(df.columns(0)) < 2),
        df.columns(0), df.columns(1), k = 3, nprobe = 2, prefix = prefix)
    }
    assert(canon(run(embD)) == canon(run(embR)))
  }

  test("sketches resolve renamed columns") {
    check("bloom")(df => BloomScreen.screen(
      df, df.columns(1), df.filter(col(df.columns(0)) < 3), df.columns(1),
      k = 3, m = 1024), docsD, docsR)
    check("countmin")(df => {
      val sk = CountMin.sketch(df.select(col(df.columns(2))), df.columns(2), 3, 32)
      CountMin.estimate(sk,
        df.select(col(df.columns(2))).distinct(), df.columns(2), 3, 32)
    }, docsD, docsR)
    check("hll")(df => {
      // keyCol must be string/binary (portable_hash32 contract)
      val regs = HyperLogLog.registers(df, df.columns(1), Seq(df.columns(2)), p = 4)
      HyperLogLog.estimateCorrected(regs, Seq(df.columns(2)), p = 4)
    }, docsD, docsR)
    check("hdr")(df => {
      val sk = HdrSketch.sketch(df, df.columns(3), Seq(df.columns(4)), subBits = 2)
      HdrSketch.quantiles(sk, Seq(df.columns(4)), Seq(("p50", 0.5)), subBits = 2)
    }, evD, evR)
  }

  test("event-stream operators resolve renamed columns") {
    check("anomaly.zScores")(df => Anomaly.zScores(
      df, Seq(df.columns(4)), df.columns(3), Seq(df.columns(2))), evD, evR)
    check("resample.fill")(df => Resample.hourlyForwardFill(
      df, df.columns(0), df.columns(1), df.columns(2), df.columns(3)), evD, evR)
    check("resample.fillSharded")(df => Resample.hourlyForwardFillSharded(
      df, df.columns(0), df.columns(1), df.columns(2), df.columns(3), shards = 2),
      evD, evR)
    check("funnel.userDepth")(df => Funnel.userDepth(
      df.withColumn("us", col(df.columns(1)) / 1000),
      df.columns(0), df.columns(4), "us", Seq("t0", "t1"), 1000000000L),
      evD, evR)
    check("asof")(df => AsOfJoin.joinAsOf(
      df, df.filter(col(df.columns(2)) % 2 === 0),
      df.columns(0), df.columns(0), df.columns(1), df.columns(1),
      df.columns(2), payload = Seq(df.columns(3))), evD, evR)
    check("rangeJoin")(df => RangeJoin.pointInInterval(
      df.select(col(df.columns(2)), col(df.columns(1))),
      df.columns(2), df.columns(1),
      df.select(col(df.columns(0)).as(s"__i_${df.columns(0)}"),
        col(df.columns(1)).as("zlo"), (col(df.columns(1)) + 1000000000000L).as("zhi"))
        .limit(5),
      s"__i_${df.columns(0)}", "zlo", "zhi", binWidth = 1000000000000L),
      evD, evR)
    check("skew.saltedJoin")(df => Skew.saltedJoin(
      df, df.select(col(df.columns(0))).distinct(),
      df.columns(0), saltBuckets = 3, saltSource = Seq(df.columns(2))),
      evD, evR)
    check("snapshotDiff")(df => SnapshotDiff.diff(
      df.select(col(df.columns(2)), col(df.columns(4))),
      df.filter(col(df.columns(2)) % 3 =!= 0)
        .select(col(df.columns(2)), col(df.columns(4))),
      df.columns(2), df.columns(4)), evD, evR)
  }

  test("sampling / packing / prefix operators resolve renamed columns") {
    check("fillTokenBudget")(df => Sampling.fillTokenBudget(
      df.select(col(df.columns(2)), col(df.columns(4)), col(df.columns(3)),
        (col(df.columns(2)) % 9 + 1).as("ztok")),
      df.columns(4), df.columns(3), df.columns(2), "ztok", budget = 20L),
      evD, evR)
    check("fillTokenBudgetSharded")(df => Sampling.fillTokenBudgetSharded(
      df.select(col(df.columns(2)), col(df.columns(4)), col(df.columns(3)),
        (col(df.columns(2)) % 9 + 1).as("ztok")),
      df.columns(4), df.columns(3), df.columns(2), "ztok", budget = 20L,
      shards = 2), evD, evR)
    check("mixtureEpochPlan")(df => Sampling.mixtureEpochPlan(
      df, df.columns(2), df.columns(0), length(col(df.columns(1))).cast("long") % 7 + 1,
      weights = Map("s1" -> 2L), budget = 200L), docsD, docsR)
    check("temperatureWeights")(df => Sampling.temperatureWeights(
      df, df.columns(2), length(col(df.columns(1))).cast("long") % 7 + 1,
      alphaNum = 3, alphaDen = 4), docsD, docsR)
    // weights frame columns (source, weight) are FIXED by contract; only
    // the docs-side names are generic.
    check("mixtureEpochPlanWeighted")(df => Sampling.mixtureEpochPlanWeighted(
      df, df.columns(2), df.columns(0), length(col(df.columns(1))).cast("long") % 7 + 1,
      weights = Seq(("s1", 2L)).toDF("source", "weight"), budget = 200L),
      docsD, docsR)
    check("mixtureEpochMaterialize")(df => Sampling.mixtureEpochMaterialize(
      df, df.columns(2), df.columns(0), length(col(df.columns(1))).cast("long") % 7 + 1,
      weights = Map("s1" -> 2L), budget = 200L, shards = 2)
      .drop(df.columns(1)), docsD, docsR)
    check("contiguousPack")(df => Packing.contiguousPack(
      df.select(col(df.columns(4)), col(df.columns(2)),
        (col(df.columns(2)) % 5 + 1).as("ztok")),
      df.columns(4), df.columns(2), "ztok", capacity = 8L), evD, evR)
    check("contiguousPackSharded")(df => Packing.contiguousPackSharded(
      df.select(col(df.columns(4)), col(df.columns(2)),
        (col(df.columns(2)) % 5 + 1).as("ztok")),
      df.columns(4), df.columns(2), "ztok", capacity = 8L, shards = 2),
      evD, evR)
    check("shardedPrefix.sum")(df => ShardedPrefix.exclusivePrefixSum(
      df, df.columns(4), df.columns(2), lit(1L), "zout", shards = 2),
      evD, evR)
    check("shardedPrefix.rank")(df => ShardedPrefix.globalRank(
      df, df.columns(4), df.columns(2), "zrank", shards = 2), evD, evR)
  }
}
