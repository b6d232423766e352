package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.Dedup

/** Streaming faces of the round-9 ingest operators: incremental
  * classification against a static corpus (q126's zero-state plan-literal
  * twin — label equality with the batch path despite the different band
  * key representation) and the per-source ingest quota (one long of
  * state per source, cap enforced ACROSS micro-batches).
  */
class StreamingIncrementalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and then naps all afternoon " +
      "in the warm summer sun while birds sing overhead in the old oak tree"

  /** One parquet file per batch inside a fresh watch dir, so
    * maxFilesPerTrigger=1 replays each row set as its own micro-batch.
    */
  private def watchDirOf(batches: Seq[DataFrame]): String = {
    val dir = java.nio.file.Files.createTempDirectory("stream_incr")
    dir.toFile.deleteOnExit()
    batches.zipWithIndex.foreach { case (df, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"stream_incr_src$i")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).head
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(part), dir.resolve(f"batch_$i%03d.parquet"))
    }
    dir.toString
  }

  test("incrementalClassified labels equal the batch twin across micro-batches") {
    val existing = Seq(
      (1L, base),
      (2L, "completely different content about spark catalyst optimizer rules " +
        "and distributed shuffle exchange planning for large analytical joins"))
      .toDF("doc_id", "text")
    val batch1 = Seq((11L, base), (12L, base.replace("warm", "hot")))
    val batch2 = Seq((13L, "entirely novel text on minhash banding recall and " +
      "jaccard similarity estimation over shingled token streams"))
    val dirStr = watchDirOf(Seq(
      batch1.toDF("doc_id", "text"), batch2.toDF("doc_id", "text")))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dirStr)
    val q = EventStream.runToMemory(
      DocumentStream.incrementalClassified(stream, existing),
      "incr_labels", OutputMode.Append())
    try {
      val got = spark.sql("SELECT doc_id, status FROM incr_labels")
        .as[(Long, String)].collect().sortBy(_._1).toSeq
      val want = Dedup.incrementalClassify(
          existing, (batch1 ++ batch2).toDF("doc_id", "text"), "doc_id", "text")
        .as[(Long, String)].collect().sortBy(_._1).toSeq
      assert(got == want, "stream labels diverge from batch twin")
      assert(got.map(_._2) == Seq("exact_dup", "near_dup", "new"))
      // zero-state screen: no state store rows
      assert(q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
    } finally q.stop()
  }

  test("streaming IVF delta maintenance: foreachBatch folds arrival batches, probe equals rebuild") {
    import graft.operators.{IvfIndex, Similarity}
    val e = graft.Tables.embeddings(spark, SparkTestSession.sf0001)
    val basePart = e.filter(col("vec_id") % 5 =!= 4)
    // arrivals in two micro-batches (the accumulating-segment case the
    // overwrite-mode appendDelta cannot express)
    val arr1 = e.filter(col("vec_id") % 10 === 4)
    val arr2 = e.filter(col("vec_id") % 10 === 9)
    val prefix = "graft_ivf_stream_spec"
    IvfIndex.build(basePart, "vec_id", "embedding", nlist = 16, prefix = prefix)
    graft.operators.Bucketing.dropWithLocation(spark, IvfIndex.deltaTable(prefix))
    val dirStr = watchDirOf(Seq(arr1, arr2))
    val stream = spark.readStream.schema(e.schema)
      .option("maxFilesPerTrigger", 1).parquet(dirStr)
    val q = stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        IvfIndex.appendDeltaBatch(batch, "vec_id", "embedding", prefix = prefix)
      }
      .start()
    try {
      q.processAllAvailable()
      // both batches landed in the accumulating segment
      assert(spark.table(IvfIndex.deltaTable(prefix)).count()
        == arr1.count() + arr2.count())
      // probe(base ∪ accumulated deltas) == merged-corpus rebuild with the
      // frozen base centroids — batch count and arrival order irrelevant
      val seg = IvfIndex.probeSegments(
        spark, e.filter(col("vec_id") < 8), "vec_id", "embedding",
        k = 5, nprobe = 2, prefix = prefix)
        .orderBy("q_id", "rank").collect()
      val rebuilt = Similarity.cosineTopKIvf(
        e, e.filter(col("vec_id") < 8), "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 2,
        centroidsOpt = Some(Similarity.centroids(basePart, "vec_id", "embedding", 16)))
        .orderBy("q_id", "rank").collect()
      assert(seg.length > 0 && seg.sameElements(rebuilt))
    } finally q.stop()
  }

  test("streaming rollup maintenance: served MV equals the from-scratch rollup; replay moves only the additive cells") {
    import graft.operators.Bucketing
    import graft.queries.MvPhases
    val mk = (ids: Range) => ids.map(i =>
      (if (i % 2 == 0) "A" else "N", if (i % 3 == 0) "F" else "O",
        (i % 50 + 1).toDouble, 900.0 + i))
      .toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
    val existing = mk(0 until 20)
    val b1 = mk(20 until 30)
    val b2 = mk(30 until 40)
    val tbl = "graft_mv_stream_spec"
    Bucketing.dropWithLocation(spark, tbl)
    MvPhases.refreshBatch(existing, tbl)
    val dirStr = watchDirOf(Seq(b1, b2))
    val schema = StructType(Seq(
      StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dirStr)
    val q = stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        MvPhases.refreshBatch(batch, tbl)
      }
      .start()
    def served() = spark.table(tbl).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.toSeq.drop(2)).toMap
    try {
      q.processAllAvailable()
      val scratch = MvPhases.partials(
        existing.unionByName(b1).unionByName(b2)).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.toSeq.drop(2)).toMap
      assert(served() == scratch,
        "served rollup diverges from the from-scratch partials")
      // replay: cnt/sums double-count the replayed batch's cells (the
      // additive side that carries the exactly-once contract); min/max
      // are idempotent and must not move
      MvPhases.refreshBatch(b2, tbl)
      val after = served()
      scratch.foreach { case (k, v) =>
        assert(after(k)(3) == v(3) && after(k)(4) == v(4),
          s"replay moved min/max for $k: the monoid side must be idempotent")
      }
      assert(after.values.map(_.head.asInstanceOf[Long]).sum == 50L,
        "replayed additive side should double-count (40 + 10 rows)")
    } finally q.stop()
  }

  test("streaming FK-rollup maintenance (q255): served sk rollup equals from-scratch; replay double-counts the additive cells") {
    import graft.operators.Bucketing
    import graft.queries.MvPhases
    val mk = (ids: Range) => ids.map(i =>
      ((i % 7 + 1).toLong, (i % 50 + 1).toDouble))
      .toDF("l_suppkey", "l_quantity")
    val existing = mk(0 until 20)
    val b1 = mk(20 until 30)
    val b2 = mk(30 until 40)
    val tbl = "graft_mv_sk_stream_spec"
    Bucketing.dropWithLocation(spark, tbl)
    MvPhases.refreshBatchSk(existing, tbl)
    val dirStr = watchDirOf(Seq(b1, b2))
    val schema = StructType(Seq(
      StructField("l_suppkey", LongType),
      StructField("l_quantity", DoubleType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dirStr)
    val q = stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        MvPhases.refreshBatchSk(batch, tbl)
      }
      .start()
    def served() = spark.table(tbl).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDecimal(2))).toMap
    try {
      q.processAllAvailable()
      val scratch = MvPhases.partialsSk(
        existing.unionByName(b1).unionByName(b2)).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDecimal(2))).toMap
      assert(served() == scratch,
        "served FK rollup diverges from the from-scratch partials")
      // Replay: BOTH cells of this rollup are additive (count + sum),
      // so a replayed batch double-counts everywhere — the exactly-once
      // contract rides the ingest batch id, same as q251's cnt/sums.
      MvPhases.refreshBatchSk(b2, tbl)
      assert(served().values.map(_._1).sum == 50L,
        "replayed additive side should double-count (40 + 10 rows)")
    } finally q.stop()
  }

  test("streaming FK-rollup retraction (q257): a CDC delete feed folds negatively; served == scratch over the remaining rows") {
    import graft.operators.Bucketing
    import graft.queries.MvPhases
    val mk = (ids: Range) => ids.map(i =>
      ((i % 7 + 1).toLong, (i % 50 + 1).toDouble))
      .toDF("l_suppkey", "l_quantity")
    val full = mk(0 until 40)
    // two delete micro-batches: rows 0-9, then rows 10-19
    val d1 = mk(0 until 10)
    val d2 = mk(10 until 20)
    val tbl = "graft_mv_sk_retract_spec"
    Bucketing.dropWithLocation(spark, tbl)
    MvPhases.refreshBatchSk(full, tbl)
    val dirStr = watchDirOf(Seq(d1, d2))
    val schema = StructType(Seq(
      StructField("l_suppkey", LongType),
      StructField("l_quantity", DoubleType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dirStr)
    val q = stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        MvPhases.refreshRetractSk(batch, tbl)
      }
      .start()
    try {
      q.processAllAvailable()
      val served = spark.table(tbl).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDecimal(2))).toMap
      val scratch = MvPhases.partialsSk(mk(20 until 40)).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDecimal(2))).toMap
      assert(served == scratch,
        "served rollup after streamed retractions diverges from scratch")
    } finally q.stop()
  }

  test("streaming TS-rollup maintenance (q267): hourly cells fold per event batch; served == scratch; replay double-counts") {
    import graft.operators.Bucketing
    import graft.queries.MvPhases
    val hour = MvPhases.HourNs
    val mk = (ids: Range) => ids.map(i =>
      (i.toLong * (hour / 10), if (i % 2 == 0) "click" else "view",
        (i % 50 + 1).toDouble))
      .toDF("ts", "event_type", "value")
    val existing = mk(0 until 20)
    val b1 = mk(20 until 30)
    val b2 = mk(30 until 40)
    val tbl = "graft_mv_ts_stream_spec"
    Bucketing.dropWithLocation(spark, tbl)
    MvPhases.refreshBatchTs(existing, tbl)
    val dirStr = watchDirOf(Seq(b1, b2))
    val schema = StructType(Seq(
      StructField("ts", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dirStr)
    val q = stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        MvPhases.refreshBatchTs(batch, tbl)
      }
      .start()
    def served() = spark.table(tbl).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDecimal(3)))
      .toMap
    try {
      q.processAllAvailable()
      val scratch = MvPhases.partialsTs(
        existing.unionByName(b1).unionByName(b2)).collect()
        .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDecimal(3)))
        .toMap
      assert(served() == scratch,
        "served TS rollup diverges from the from-scratch partials")
      // replay: both cells additive -> double-counts (exactly-once
      // rides the ingest batch id, as on every additive fold)
      MvPhases.refreshBatchTs(b2, tbl)
      assert(served().values.map(_._1).sum == 50L,
        "replayed additive side should double-count (40 + 10 rows)")
    } finally q.stop()
  }

  test("streaming delete maintenance (q258): each delete batch recomputes only touched cells; served == scratch over survivors") {
    import graft.operators.Bucketing
    import graft.queries.MvPhases
    // full returnflag-rollup row shape (cnt, sums, min/max, col counts)
    val mk = (ids: Range) => ids.map(i =>
      (if (i % 2 == 0) "A" else "N", if (i % 3 == 0) "F" else "O",
        (i % 50 + 1).toDouble, 900.0 + i))
      .toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
    val full = mk(0 until 40)
    // delete ALL of 'A'/'F' first (cells vanish), then a slice of 'N'/'O'
    val d1 = mk(0 until 40).filter(col("l_returnflag") === "A" &&
      col("l_linestatus") === "F")
    val d2 = mk(0 until 10).filter(col("l_returnflag") === "N")
    val tbl = "graft_mv_del_stream_spec"
    Bucketing.dropWithLocation(spark, tbl)
    MvPhases.refreshBatch(full, tbl)
    val dirStr = watchDirOf(Seq(d1, d2))
    val schema = StructType(Seq(
      StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dirStr)
    // the live remaining fact shrinks as deletes land; the spec tracks
    // it the same way a CDC consumer's base table would
    val deletedSoFar = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val q = stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        deletedSoFar.synchronized {
          deletedSoFar += batch.localCheckpoint()
          val remaining = deletedSoFar.foldLeft(full)((acc, d) =>
            acc.exceptAll(d))
          MvPhases.refreshDeleteBatch(batch, tbl, remaining)
        }
      }
      .start()
    try {
      q.processAllAvailable()
      val survivors = full.exceptAll(d1).exceptAll(d2)
      val served = spark.table(tbl).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.toSeq.drop(2)).toMap
      val scratch = MvPhases.partials(survivors).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.toSeq.drop(2)).toMap
      assert(served == scratch,
        "served rollup after streamed deletes diverges from scratch")
      assert(!served.keySet.exists(_ == ("A", "F")),
        "a fully-deleted cell must vanish")
    } finally q.stop()
  }

  test("streaming profile maintenance: served ANALYZE surface equals the batch fold; replay moves only the additive side") {
    import graft.operators.{Bucketing, Profile}
    val cols = Seq("doc_id", "lang")
    val mk = (ids: Range) => ids.map(i =>
      (i.toLong, if (i % 3 == 0) null else s"l${i % 4}")).toDF("doc_id", "lang")
    val existing = mk(0 until 20)
    val b1 = mk(20 until 30)
    val b2 = mk(30 until 40)
    val cntT = "graft_prof_cnt_stream_spec"
    val regT = "graft_prof_reg_stream_spec"
    Bucketing.dropWithLocation(spark, cntT)
    Bucketing.dropWithLocation(spark, regT)
    Profile.refreshBatch(existing, cols, p = 6, cntT, regT)
    val dirStr = watchDirOf(Seq(b1, b2))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dirStr)
    val q = stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Profile.refreshBatch(batch, cols, p = 6, cntT, regT)
      }
      .start()
    def served() = Profile.servedProfile(spark, cntT, regT, p = 6)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    try {
      q.processAllAvailable()
      val all = existing.unionByName(b1).unionByName(b2)
      val scratch = Profile.foldProfiles(
        Seq(Profile.countStats(all, cols)),
        Seq(Profile.profileSketch(all, cols, p = 6)), p = 6)
        .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
      assert(served() == scratch,
        "served profile diverges from the from-scratch batch fold")
      // replay contract: the register side is a max-monoid (no-op under
      // replay); the count side is additive and DOES move — which is why
      // it carries the exactly-once batch-id contract
      Profile.refreshBatch(b2, cols, p = 6, cntT, regT)
      val after = served()
      assert(after("doc_id")(2) == scratch("doc_id")(2),
        "replay changed s_scaled: the max side must be idempotent")
      assert(after("doc_id").head == 50L,
        "replayed additive side should double-count (40 + 10 rows)")
    } finally q.stop()
  }

  test("streaming histogram maintenance: frozen-bounds cells fold additively; drift cells catch out-of-range arrivals") {
    import graft.operators.{Bucketing, Profile}
    val (mn, mx, b) = (0.0, 8.0, 4)
    val mk = (vs: Seq[Double]) => vs.toDF("v")
    val existing = mk(Seq(0.0, 1.0, 3.0, 5.0, 7.0))
    val b1 = mk(Seq(2.0, 6.0, 8.0))
    val b2 = mk(Seq(1.5, 9.5, -1.0)) // two out-of-range arrivals: drift
    val table = "graft_hist_stream_spec"
    Bucketing.dropWithLocation(spark, table)
    Profile.histRefreshBatch(existing, "v", mn, mx, b, table)
    val dirStr = watchDirOf(Seq(b1, b2))
    val schema = StructType(Seq(StructField("v", DoubleType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dirStr)
    val q = stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Profile.histRefreshBatch(batch, "v", mn, mx, b, table)
      }
      .start()
    def served() = spark.table(table).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    try {
      q.processAllAvailable()
      // served == frozen-bounds cells of everything seen, batch-count
      // and arrival-order independent
      val all = existing.unionByName(b1).unionByName(b2)
      val scratch = Profile.bucketizeFrozen(all, "v", mn, mx, b)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(served() == scratch,
        "served cells diverge from the from-scratch frozen bucketing")
      // the drift cells carry the out-of-range mass explicitly
      assert(served()(-1L) == 1L && served()(4L) == 1L,
        "out-of-range arrivals must land in the drift cells")
      // additive contract: replay double-counts (exactly-once batch ids
      // are the guard in production, unlike the register max-merge)
      Profile.histRefreshBatch(b2, "v", mn, mx, b, table)
      assert(served()(4L) == 2L, "replayed additive fold must move")
    } finally q.stop()
  }

  test("streaming HLL maintenance: foreachBatch re-max equals full sketch; replayed batch is a no-op") {
    import graft.operators.HyperLogLog
    val mk = (ids: Range, salt: String) =>
      ids.map(i => (i.toLong, s"tok$salt${i % 7} shared$i common"))
        .toDF("doc_id", "text")
        .select((col("doc_id") % 2).cast("string").as("src"),
          explode(split(col("text"), " ")).as("tok"))
    val existing = mk(0 until 20, "a")
    val b1 = mk(20 until 30, "b")
    val b2 = mk(30 until 40, "c")
    val table = "graft_hll_stream_spec"
    graft.operators.Bucketing.dropWithLocation(spark, table)
    HyperLogLog.refreshBatch(
      HyperLogLog.registers(existing, "tok", Seq("src"), p = 4), table, Seq("src"))
    val dirStr = watchDirOf(Seq(b1, b2))
    val schema = StructType(Seq(
      StructField("src", StringType), StructField("tok", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dirStr)
    val q = stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        HyperLogLog.refreshBatch(
          HyperLogLog.registers(batch, "tok", Seq("src"), p = 4), table, Seq("src"))
      }
      .start()
    def canon() = spark.table(table).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    try {
      q.processAllAvailable()
      // served table == from-scratch sketch of everything seen
      val full = HyperLogLog.registers(
        existing.unionByName(b1).unionByName(b2), "tok", Seq("src"), p = 4)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
        .sortBy(x => (x._1, x._2)).toSeq
      assert(canon() == full, "served registers diverge from full sketch")
      // the max-monoid serving property: AT-LEAST-ONCE is enough — a
      // replayed batch re-maxes the same cells, table unchanged (the
      // additive folds need exactly-once batch ids here instead)
      HyperLogLog.refreshBatch(
        HyperLogLog.registers(b2, "tok", Seq("src"), p = 4), table, Seq("src"))
      assert(canon() == full, "replayed batch changed the served registers")
    } finally q.stop()
  }

  test("streaming twin-fingerprint maintenance: foreachBatch fold equals full recompute; replay is structure-exact") {
    import graft.operators.{Bucketing, Triangles}
    // two triangles bridged later: batch edges arrive in two micro-batches
    val b1 = Seq((0L, 1L), (0L, 2L), (1L, 2L), (10L, 11L))
    val b2 = Seq((10L, 12L), (11L, 12L), (2L, 10L))
    val fpT = "graft_twinfp_stream_spec"
    val edT = "graft_twined_stream_spec"
    Bucketing.dropWithLocation(spark, fpT)
    Bucketing.dropWithLocation(spark, edT)
    val dirStr = watchDirOf(Seq(
      b1.toDF("doc_a", "doc_b"), b2.toDF("doc_a", "doc_b")))
    val schema = StructType(Seq(
      StructField("doc_a", LongType), StructField("doc_b", LongType)))
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dirStr)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Triangles.refreshFingerprintsBatch(batch, fpT, edT, "doc_a", "doc_b")
      }
      .start()
    def served() = spark.table(fpT).collect()
      .map(r => (r.getLong(0), r.get(1))).toMap
    try {
      q.processAllAvailable()
      val full = Triangles.adjacencyFingerprints(
          (b1 ++ b2).toDF("doc_a", "doc_b"), "doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.get(1))).toMap
      assert(served() == full, "served fingerprints diverge from full recompute")
      // adjacency is a SET: replaying a batch re-derives identical
      // fingerprints (the edge table gains duplicate rows, storage-only)
      Triangles.refreshFingerprintsBatch(
        b2.toDF("doc_a", "doc_b"), fpT, edT, "doc_a", "doc_b")
      assert(served() == full, "replayed batch changed the served structure")
    } finally q.stop()
  }

  test("streaming LM fold: foreachBatch-trained model scores equal the batch twin; replay exact") {
    import graft.operators.ImportanceModels
    // Training docs stream in micro-batches; scoring corpus is static.
    val train1 = Seq((1L, "the cat sat on the mat"), (2L, "the dog sat on the rug"))
    val train2 = Seq((3L, "a cat and a dog sat together on the mat"))
    val corpus = (train1 ++ train2 ++ Seq(
      (10L, "the cat sat quietly"),
      (11L, "quantum flux capacitors hum softly")))
      .toDF("doc_id", "text")
    val lmT = "graft_lmfold_stream_spec"
    graft.operators.Bucketing.dropWithLocation(spark, lmT)
    val dirStr = watchDirOf(Seq(
      train1.toDF("doc_id", "text"), train2.toDF("doc_id", "text")))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dirStr)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        ImportanceModels.foldLmBatch(batch, id, lmT, "text", "doc_id")
      }
      .start()
    def servedScores() = {
      val (lm, tot) = ImportanceModels.lmFromFolds(spark, lmT)
      ImportanceModels.scoreAgainstLm(
          ImportanceModels.bigramBucketStream(corpus, "text", "doc_id"),
          "doc_id", lm, tot, ImportanceModels.LmBuckets)
        .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    }
    try {
      q.processAllAvailable()
      // folded-model scores == one-shot training on the union (the
      // batch twin): counts are additive across disjoint batches and
      // the scoring arithmetic is shared code.
      val trainIds = (train1 ++ train2).map(_._1).toSet
      val batchTwin = ImportanceModels.bigramLmScore(
          corpus, "text", "doc_id",
          trainPred = col("doc_id").isInCollection(trainIds))
        .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
      val got = servedScores()
      assert(got.nonEmpty && got == batchTwin,
        "folded-model scores diverge from the batch-trained twin")
      // exactly-once under at-least-once delivery: a replayed batch
      // overwrites ONLY its own batch_id partition with identical rows
      ImportanceModels.foldLmBatch(
        train2.toDF("doc_id", "text"), 1L, lmT, "text", "doc_id")
      assert(servedScores() == batchTwin,
        "replayed batch changed the served model")
    } finally q.stop()
  }

  test("streaming DSIR fold: served stats score equal to the batch twin; replay and compaction exact") {
    import graft.operators.ImportanceModels
    val b1 = Seq((1L, "the cat sat on the mat", "en"), (2L, "le chat noir dort", "fr"))
    val b2 = Seq((3L, "the dog and the cat play", "en"), (4L, "der hund schlaeft tief", "de"))
    val corpus = (b1 ++ b2).toDF("doc_id", "text", "lang")
    val statsT = "graft_dsirfold_stream_spec"
    graft.operators.Bucketing.dropWithLocation(spark, statsT)
    ImportanceModels.foldDsirBatch(
      b1.toDF("doc_id", "text", "lang"), 0L, statsT, "text", "doc_id",
      targetPred = col("lang") === "en")
    ImportanceModels.foldDsirBatch(
      b2.toDF("doc_id", "text", "lang"), 1L, statsT, "text", "doc_id",
      targetPred = col("lang") === "en")
    def served() = ImportanceModels.scoreAgainstDsirStats(
        ImportanceModels.dsirOccurrences(corpus, "text", "doc_id"),
        "doc_id", ImportanceModels.dsirFromFolds(spark, statsT))
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val twin = ImportanceModels.dsirWeights(
        corpus, "text", "doc_id", targetPred = col("lang") === "en")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(twin.nonEmpty && served() == twin,
      "folded stats score diverges from the batch twin")
    // replay: batch 1 re-lands its own partition with identical rows
    ImportanceModels.foldDsirBatch(
      b2.toDF("doc_id", "text", "lang"), 1L, statsT, "text", "doc_id",
      targetPred = col("lang") === "en")
    assert(served() == twin, "replayed batch changed the served stats")
    // compaction (quiesced stream): one batch_id = -1 partition, same view
    ImportanceModels.compactFolds(spark, statsT)
    assert(spark.table(statsT).select("batch_id").distinct()
      .as[Long].collect().toSeq == Seq(-1L))
    assert(served() == twin, "compaction changed the served stats")
    // post-compaction batches keep folding into the same table
    ImportanceModels.foldDsirBatch(
      Seq((5L, "the sun is warm", "en")).toDF("doc_id", "text", "lang"),
      2L, statsT, "text", "doc_id", targetPred = col("lang") === "en")
    val grown = (b1 ++ b2 ++ Seq((5L, "the sun is warm", "en")))
      .toDF("doc_id", "text", "lang")
    val twin2 = ImportanceModels.dsirWeights(
        grown, "text", "doc_id", targetPred = col("lang") === "en")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val served2 = ImportanceModels.scoreAgainstDsirStats(
        ImportanceModels.dsirOccurrences(grown, "text", "doc_id"),
        "doc_id", ImportanceModels.dsirFromFolds(spark, statsT))
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(served2 == twin2, "post-compaction fold diverges from the batch twin")
  }

  test("canonicalRouted equals the batch mixed-pair routing; zero state") {
    import graft.operators.Components
    val sparkText = "completely different content about spark catalyst " +
      "optimizer rules and distributed shuffle exchange planning for " +
      "large analytical joins"
    val existing = Seq(
      (2L, base),
      (4L, base.replace("warm", "hot")),   // likely clusters with 2
      (6L, sparkText))                     // singleton cluster
      .toDF("doc_id", "text")
    val exIds = Set(2L, 4L, 6L)
    val b1 = Seq((11L, base),              // exact dup -> routes to 2's cluster
      (13L, sparkText.replace("large", "huge")))
    val b2 = Seq((15L, "entirely novel text on minhash banding recall and " +
      "jaccard similarity estimation over shingled token streams")) // -> null
    val incoming = (b1 ++ b2).toDF("doc_id", "text")
    // Independent batch expectation (the q144 composition, raw-long band
    // structs vs the stream's string keys): union mine -> existing-only
    // pairs -> components -> mixed edges -> min matched canonical.
    val pairs = Dedup.lshCandidatePairs(
        Dedup.minhashSignatures(existing.unionByName(incoming), "text", "doc_id", 16),
        "doc_id", 16, bands = 2)
      .select("doc_a", "doc_b")
    val inEx = (c: org.apache.spark.sql.Column) => c.isin(exIds.toSeq: _*)
    val comp = Components.connectedComponents(
      pairs.filter(inEx(col("doc_a")) && inEx(col("doc_b"))),
      numPartitions = Some(2))
    val fullComp = existing.select(col("doc_id").as("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
    val mixed = pairs.filter(inEx(col("doc_a")) =!= inEx(col("doc_b")))
      .select(
        when(inEx(col("doc_a")), col("doc_b")).otherwise(col("doc_a")).as("inc_id"),
        when(inEx(col("doc_a")), col("doc_a")).otherwise(col("doc_b")).as("ex_id"))
    val routed = mixed.join(fullComp, col("ex_id") === col("id"))
      .groupBy("inc_id").agg(min("comp").as("canonical_id"))
    val want = incoming.select("doc_id")
      .join(routed, col("doc_id") === col("inc_id"), "left")
      .select(col("doc_id"), col("canonical_id"))
      .as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
    // Stream side: batch-refreshed band->canonical table, row-local probe.
    val bandCan = DocumentStream.bandCanonicalTable(existing, comp)
    val dirStr = watchDirOf(Seq(
      b1.toDF("doc_id", "text"), b2.toDF("doc_id", "text")))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dirStr)
    val q = EventStream.runToMemory(
      DocumentStream.canonicalRouted(stream, bandCan),
      "canon_routed", OutputMode.Append())
    try {
      val got = spark.sql("SELECT doc_id, canonical_id FROM canon_routed")
        .as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
      assert(got == want, s"stream routing diverges: $got vs $want")
      // sanity on the fixture's intent: the exact dup routes somewhere,
      // the novel doc routes nowhere
      assert(got.find(_._1 == 11L).get._2.nonEmpty)
      assert(got.find(_._1 == 15L).get._2.isEmpty)
      // zero-state: broadcast joins only
      assert(q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
    } finally q.stop()
  }

  test("splitAssigned equals the batch cluster-safe split; zero state") {
    // The q146 ingest twin: arrivals get train/val/test by the CLUSTER id
    // from a static serving map (novel docs = own-id singleton cluster),
    // via one broadcast stream-static left join + the row-local md5
    // bucket. Fed the same map, assignments must equal the batch form
    // row for row — including a doc ABSENT from the map (the novel path).
    val comp = Seq((2L, 2L), (4L, 2L), (6L, 6L)).toDF("id", "comp")
    val b1 = Seq((2L, "x"), (4L, "x"))
    val b2 = Seq((6L, "x"), (15L, "x")) // 15 is novel: comp = own id
    val dirStr = watchDirOf(Seq(
      b1.toDF("doc_id", "text"), b2.toDF("doc_id", "text")))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dirStr)
    val q = EventStream.runToMemory(
      DocumentStream.splitAssigned(stream, comp),
      "split_assigned", OutputMode.Append())
    try {
      val got = spark.sql("SELECT doc_id, comp, split FROM split_assigned")
        .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
      val want = (b1 ++ b2).toDF("doc_id", "text").select(col("doc_id"))
        .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("comp"), col("doc_id")).as("comp"))
        .withColumn("split", graft.operators.Sampling.splitLabel(
          col("comp"), trainPct = 80, valPct = 10, salt = "csplit:"))
        .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
      assert(got == want, s"stream split diverges: $got vs $want")
      // cluster-safety at the twin level: same cluster -> same split
      assert(got.groupBy(_._2).values.forall(_.map(_._3).distinct.size == 1))
      // the novel doc fell back to its own id
      assert(got.find(_._1 == 15L).get._2 == 15L)
      // zero-state: broadcast join only
      assert(q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
    } finally q.stop()
  }

  test("canonicalAssigned equals the batch canonical assignment; zero state") {
    // The q150 ingest twin: arrivals resolve their cluster from the
    // serving map (novel doc -> own-id singleton), then take the
    // cluster's rank-aware canonical from the materialized canonical
    // table; a cluster with no canonical row is 'new' (decision pending
    // batch-side) and the arrival becomes its own canonical. Fed the
    // same two tables, the stream must equal the batch form row for row
    // across all three paths: existing cluster with a canonical (2, 4),
    // existing cluster WITHOUT one (6 — singleton in the map, no edged
    // canonical), and a doc absent from the map entirely (15).
    val comp = Seq((2L, 2L), (4L, 2L), (6L, 6L)).toDF("id", "comp")
    val canon = Seq((2L, 4L)).toDF("comp", "canonical_id")
    val b1 = Seq((2L, "x"), (4L, "x"))
    val b2 = Seq((6L, "x"), (15L, "x"))
    val dirStr = watchDirOf(Seq(
      b1.toDF("doc_id", "text"), b2.toDF("doc_id", "text")))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dirStr)
    val q = EventStream.runToMemory(
      DocumentStream.canonicalAssigned(stream, comp, canon),
      "canon_assigned", OutputMode.Append())
    try {
      val got = spark.sql(
          "SELECT doc_id, comp, canonical_id, status FROM canon_assigned")
        .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
      val want = DocumentStream.canonicalAssigned(
          (b1 ++ b2).toDF("doc_id", "text"), comp, canon)
        .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
      assert(got == want, s"stream canonical diverges: $got vs $want")
      // the three paths, pinned explicitly
      assert(got.find(_._1 == 2L).get == ((2L, 2L, 4L, "existing")))
      assert(got.find(_._1 == 4L).get == ((4L, 2L, 4L, "existing")))
      assert(got.find(_._1 == 6L).get == ((6L, 6L, 6L, "new")))
      assert(got.find(_._1 == 15L).get == ((15L, 15L, 15L, "new")))
      // zero-state: stream-static joins only
      assert(q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
    } finally q.stop()
  }

  test("quotaCapped admits first N per source within AND across batches") {
    val batches = Seq(
      Seq(("a", 1L), ("a", 2L), ("b", 10L)),
      Seq(("a", 3L), ("b", 11L), ("b", 12L)),
      Seq(("a", 4L), ("b", 13L)))
    val dirStr = watchDirOf(batches.map(_.toDF("source", "doc_id")))
    val schema = StructType(Seq(
      StructField("source", StringType), StructField("doc_id", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dirStr)
    val q = EventStream.runToMemory(
      DocumentStream.quotaCapped(stream, maxDocsPerSource = 3L).toDF(),
      "quota_docs", OutputMode.Append())
    try {
      val got = spark.sql("SELECT source, doc_id, source_seq FROM quota_docs")
        .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._3)).toSeq
      // cap 3: a admits 1,2 (batch 1) + 3 (batch 2), rejects 4 (batch 3);
      // b admits 10 (batch 1) + 11,12 (batch 2), rejects 13.
      assert(got == Seq(
        ("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L),
        ("b", 10L, 1L), ("b", 11L, 2L), ("b", 12L, 3L)))
      // equals the batch twin fed the same (ordered) arrivals
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("doc_id")
      val want = batches.flatten.toDF("source", "doc_id")
        .withColumn("source_seq", row_number().over(w).cast("long"))
        .filter(col("source_seq") <= 3)
        .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._3)).toSeq
      assert(got == want)
      // O(sources) state: exactly one state row per source
      assert(q.lastProgress.stateOperators.map(_.numRowsTotal).sum == 2)
    } finally q.stop()
  }

  test("tokenQuotaCapped: prefix token budget within AND across batches; OOV and empty docs per the encode contract") {
    // lexicon: aa -> 1 token, bbb -> 2, cc -> 3. Docs mix lexicon words,
    // OOV words (zz - contribute 0), non-[a-z] tokens (dropped), and one
    // doc with no lexicon word at all (absent from output entirely).
    val lex = Seq(("aa", 1L), ("bbb", 2L), ("cc", 3L)).toDF("word", "n_tokens_w")
    val batches = Seq(
      Seq(("a", 1L, "aa bbb"), ("a", 2L, "cc zz"), ("b", 10L, "aa aa")),
      Seq(("a", 3L, "aa X9"), ("a", 4L, "aa"), ("b", 11L, "zz 42")),
      Seq(("b", 12L, "bbb cc")))
    val dirStr = watchDirOf(batches.map(_.toDF("source", "doc_id", "text")))
    val schema = StructType(Seq(
      StructField("source", StringType), StructField("doc_id", LongType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dirStr)
    val q = EventStream.runToMemory(
      DocumentStream.tokenQuotaCapped(stream, lex, budget = 7L).toDF(),
      "tok_quota", OutputMode.Append())
    try {
      val got = spark.sql(
        "SELECT source, doc_id, n_tokens, cum_tokens FROM tok_quota")
        .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
      // a: doc1 = 3 (aa+bbb), doc2 = 3 (cc, zz OOV -> 0), doc3 = 1,
      //    doc4 = 1 -> cum 3, 6, 7, 8: doc4 overflows (prefix semantics).
      // b: doc10 = 2, doc11 absent (no lexicon word), doc12 = 5 -> cum 2, 7.
      assert(got == Seq(
        ("a", 1L, 3L, 3L), ("a", 2L, 3L, 6L), ("a", 3L, 1L, 7L),
        ("b", 10L, 2L, 2L), ("b", 12L, 5L, 7L)))
      // equals the batch prefix twin fed the same arrivals: cum over id
      // order INCLUDES every seen doc, keep cum <= budget.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("doc_id")
        .rowsBetween(Long.MinValue, 0)
      val ntok = Map("aa" -> 1L, "bbb" -> 2L, "cc" -> 3L)
      val want = batches.flatten
        .map { case (s, id, text) =>
          (s, id, text.split("\\s+").toSeq
            .filter(_.matches("^[a-z]+$")).map(ntok.getOrElse(_, 0L)).sum)
        }
        .filter(_._3 > 0)
        .toDF("source", "doc_id", "n_tokens")
        .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .filter(col("cum_tokens") <= 7L)
        .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(got == want)
      // O(sources) state: one long per source
      assert(q.lastProgress.stateOperators.map(_.numRowsTotal).sum == 2)
    } finally q.stop()
  }

  test("tokenQuotaCapped with the TRAINED lexicon equals the q206-style batch window") {
    // Integration face: stream the fixture corpus against
    // BpeTrainer.lexicon and pin equality with the batch encode +
    // prefix window at the same budget.
    val docs = graft.Tables.documents(spark, graft.SparkTestSession.sf0001)
      .select("source", "doc_id", "text")
    val lex = graft.operators.BpeTrainer.lexicon(docs, "text")
    try {
      val dirStr = watchDirOf(Seq(docs.toDF()))
      val stream = spark.readStream.schema(docs.schema).parquet(dirStr)
      val budget = 2000L
      val q = EventStream.runToMemory(
        DocumentStream.tokenQuotaCapped(stream, lex, budget).toDF(),
        "tok_quota_fix", OutputMode.Append())
      try {
        val got = spark.sql(
          "SELECT source, doc_id, n_tokens, cum_tokens FROM tok_quota_fix")
          .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("doc_id")
          .rowsBetween(Long.MinValue, 0)
        val want = graft.operators.BpeTrainer.encode(docs, "text", "doc_id")
          .join(docs.select("source", "doc_id"), Seq("doc_id"))
          .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
          .filter(col("cum_tokens") <= budget)
          .select("source", "doc_id", "n_tokens", "cum_tokens")
          .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
        assert(got.nonEmpty && got == want)
      } finally q.stop()
    } finally graft.operators.Checkpoints.release(lex)
  }

  test("streaming BPE vocab fold: foreachBatch-folded retrain equals from-scratch; replay exact") {
    import graft.operators.BpeTrainer
    // Two micro-batches of training text; the folded vocabulary must
    // retrain to the same merge table as one-shot training on the union.
    val batch1 = Seq((1L, "low low lower"), (2L, "lowest low lower"))
    val batch2 = Seq((3L, "newer new newest"), (4L, "wider wide new"))
    val all = (batch1 ++ batch2).toDF("doc_id", "text")
    val vT = "graft_bpefold_stream_spec"
    graft.operators.Bucketing.dropWithLocation(spark, vT)
    val dirStr = watchDirOf(Seq(
      batch1.toDF("doc_id", "text"), batch2.toDF("doc_id", "text")))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dirStr)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        BpeTrainer.foldVocabBatch(batch, id, vT, "text")
      }
      .start()
    def servedMerges() = BpeTrainer
      .mergeTableFromVocab(BpeTrainer.vocabFromFolds(spark, vT))
      .as[(Int, String, String, String, Long)].collect().toSeq.sortBy(_._1)
    try {
      q.processAllAvailable()
      val want = BpeTrainer.mergeTable(all, "text")
        .as[(Int, String, String, String, Long)].collect().toSeq.sortBy(_._1)
      val got = servedMerges()
      assert(got.nonEmpty && got == want,
        "folded-vocab retrain diverges from the from-scratch merge table")
      // exactly-once under at-least-once delivery: a replayed batch
      // overwrites ONLY its own batch_id partition with identical rows
      BpeTrainer.foldVocabBatch(batch2.toDF("doc_id", "text"), 1L, vT, "text")
      assert(servedMerges() == want, "replayed batch changed the served model")
    } finally q.stop()
  }

  test("fertilityScreened equals the batch fertility screen; zero state") {
    // q209's streaming twin: same corpus, same trained lexicon, row-local
    // plan-literal costing — output must match the batch join form
    // row for row, with nothing in the state store.
    val docs = graft.Tables.documents(spark, graft.SparkTestSession.sf0001)
      .select("source", "doc_id", "text")
    val lex = graft.operators.BpeTrainer.lexicon(docs, "text")
    try {
      val dirStr = watchDirOf(Seq(docs.toDF()))
      val stream = spark.readStream.schema(docs.schema).parquet(dirStr)
      val q = EventStream.runToMemory(
        DocumentStream.fertilityScreened(stream, lex),
        "fert_scr", OutputMode.Append())
      try {
        val got = spark.sql(
          "SELECT doc_id, n_chars, n_tokens, kept FROM fert_scr")
          .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
        val want = graft.operators.BpeTrainer
          .fertilityScreen(docs, "text", "doc_id")
          .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
        assert(got.nonEmpty && got == want)
        // zero state: the screen is pure row-local expressions
        assert(q.lastProgress == null ||
          q.lastProgress.stateOperators.isEmpty ||
          q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
      } finally q.stop()
    } finally graft.operators.Checkpoints.release(lex)
  }

  test("anomalyScored equals the batch z-scores fed the same stats; zero state") {
    import graft.operators.Anomaly
    // 16 inliers + outlier per the sqrt(n-1) bound; one constant group
    val history = ((1L to 16L).map(i => (i, 7L, "click", 10.0)) ++
      Seq((17L, 7L, "click", 1000.0)) ++
      (18L to 21L).map(i => (i, 8L, "view", 5.0)))
      .toDF("event_id", "user_id", "event_type", "value")
    val stats = Anomaly.groupStats(history, Seq("user_id", "event_type"), "value")
    val batches = Seq(
      Seq((101L, 7L, "click", 10.0), (102L, 7L, "click", 1000.0)),
      Seq((103L, 8L, "view", 5.0), (104L, 9L, "click", 42.0))) // unseen group
    val dirStr = watchDirOf(batches.map(
      _.toDF("event_id", "user_id", "event_type", "value")))
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dirStr)
    val q = EventStream.runToMemory(
      EventStream.anomalyScored(stream, stats), "anomaly_scored",
      OutputMode.Append())
    try {
      val got = spark.sql(
          "SELECT event_id, value, z, is_anomaly FROM anomaly_scored")
        .as[(Long, Double, Double, Boolean)].collect().sortBy(_._1).toSeq
      // batch twin: score the SAME arrivals against the SAME stats
      val want = batches.flatten
        .toDF("event_id", "user_id", "event_type", "value")
        .join(broadcast(stats), Seq("user_id", "event_type"), "left")
        .select(col("event_id"), col("value"),
          when(col("__std") > 0,
            (col("value") - col("__mean")) / col("__std")).otherwise(0.0).as("z"),
          when(col("__std") > 0,
            abs((col("value") - col("__mean")) / col("__std")) > 3.0)
            .otherwise(false).as("is_anomaly"))
        .as[(Long, Double, Double, Boolean)].collect().sortBy(_._1).toSeq
      assert(got == want)
      assert(got.find(_._1 == 102L).exists(_._4), "streamed outlier not flagged")
      assert(got.find(_._1 == 104L).exists(r => r._3 == 0.0 && !r._4),
        "unseen group should score 0 / unflagged")
      assert(q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
    } finally q.stop()
  }

  test("streaming CDC chunk screen equals the batch ingest intermediate; zero state") {
    import graft.operators.CdcChunks
    val existing = Seq(
      (0L, base),
      (2L, "wholly separate existing corpus body with distinct words only"))
      .toDF("doc_id", "text")
    val batch1 = Seq((11L, "prefix tokens here " + base)) // resyncs into doc 0
    val batch2 = Seq((13L, "an arrival with entirely novel content and no shared chunks"))
    val exFps = CdcChunks.chunks(existing, "doc_id", "text", 3, 8)
      .select(col("fp"))
    val dirStr = watchDirOf(Seq(
      batch1.toDF("doc_id", "text"), batch2.toDF("doc_id", "text")))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dirStr)
    val q = EventStream.runToMemory(
      DocumentStream.cdcChunkFlagged(stream, exFps),
      "cdc_flags", OutputMode.Append())
    try {
      val got = spark.sql(
          "SELECT doc_id, chunk_start, chunk_end, n_chunk_tokens, fp, is_dup FROM cdc_flags")
        .as[(Long, Long, Long, Long, String, Boolean)].collect().toSet
      // batch twin: chunk the union of arrivals, flag against existing fps
      val exSet = exFps.as[String].collect().toSet
      val want = CdcChunks.chunks(
          (batch1 ++ batch2).toDF("doc_id", "text"), "doc_id", "text", 3, 8)
        .as[(Long, Long, Long, Long, String)].collect()
        .map(c => (c._1, c._2, c._3, c._4, c._5, exSet(c._5))).toSet
      assert(got == want, "stream chunk flags diverge from batch twin")
      // the resyncing arrival has dup chunks, the novel one none
      assert(got.exists(c => c._1 == 11L && c._6))
      assert(got.filter(_._1 == 13L).forall(!_._6))
      // zero-state screen
      assert(q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
    } finally q.stop()
  }

  test("crossModalCurated equals the batch q213 capstone selection on ordered arrivals") {
    import graft.operators.{BpeTrainer, SemDedup, TextAnalysis, Sampling}
    import graft.queries.TextQueries
    val docs = graft.Tables.documents(spark, graft.SparkTestSession.sf0001)
      .select("source", "doc_id", "text")
    val emb = graft.Tables.embeddings(spark, graft.SparkTestSession.sf0001)
    val lex = BpeTrainer.lexicon(docs, "text")
    val budget = 3000L // the q213 registry's BpeBudget
    try {
      val semKept = SemDedup.screen(emb, "vec_id", "embedding")
        .filter(col("kept")).select(col("vec_id").as("doc_id"))
        .localCheckpoint(true)
      // batch twin: the q213 registry body verbatim
      val keep = TextAnalysis.repetitionStats(
          docs, "doc_id", "text",
          TextQueries.RepTopWordMax, TextQueries.RepDup3Max)
        .filter(col("keep")).select("doc_id")
      val enc = BpeTrainer.encode(docs, "text", "doc_id")
        .select(col("doc_id"), col("n_tokens"))
      val scored = docs.select(
          col("doc_id"), col("source"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        .join(keep, Seq("doc_id"), "left_semi")
        .join(semKept, Seq("doc_id"), "left_semi")
        .join(enc, Seq("doc_id"))
      val want = Sampling.fillTokenBudget(
          scored, "source", "quality", "doc_id", "n_tokens", budget)
        .select("source", "doc_id", "quality", "n_tokens", "cum_tokens")
        .as[(String, Long, Double, Long, Long)].collect()
        .sortBy(r => (r._1, r._2)).toSeq

      // one file = one micro-batch: the in-batch (quality DESC, id)
      // sort makes the arrivals trivially ordered per the contract
      val dirStr = watchDirOf(Seq(docs.toDF()))
      val stream = spark.readStream.schema(docs.schema).parquet(dirStr)
      val q = EventStream.runToMemory(
        DocumentStream.crossModalCurated(
          stream, semKept, lex, budget,
          TextQueries.RepTopWordMax, TextQueries.RepDup3Max).toDF(),
        "xmodal_cur", OutputMode.Append())
      try {
        val got = spark.sql(
          "SELECT source, doc_id, quality, n_tokens, cum_tokens FROM xmodal_cur")
          .as[(String, Long, Double, Long, Long)].collect()
          .sortBy(r => (r._1, r._2)).toSeq
        assert(got.nonEmpty && got == want)
        // the gates genuinely cut: admitted set is a strict subset
        assert(got.size < docs.count())
        // O(sources) state: one long per source that admitted anything
        assert(q.lastProgress.stateOperators.map(_.numRowsTotal).sum ==
          got.map(_._1).distinct.size)
      } finally q.stop()
    } finally graft.operators.Checkpoints.release(lex)
  }
}
