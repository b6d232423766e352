package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Randomized properties for the round-13 incremental-fold operators:
  * the claims these operators stand on are ALGEBRAIC (hit-count
  * additivity across disjoint gram sets; the sketch-union monoid), so
  * they deserve randomized inputs, not just the fixture slices the
  * registry queries pin. Seeded; batch-style (few Spark jobs over many
  * generated cases, the TextPropertySpec discipline).
  */
class FoldPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(1337)

  /** Random docs over a small vocabulary, so gram/token overlap between
    * independently drawn sets is common (the interesting regime — large
    * vocabularies make every set disjoint and the fold trivially right).
    */
  private def randomDocs(n: Int, idBase: Long): Seq[(Long, String)] = {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    (0 until n).map { i =>
      val len = 3 + rnd.nextInt(10)
      (idBase + i, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
  }

  test("benchmark fold == from-scratch union on 20 random (corpus, v1, v2) triples") {
    (0 until 20).foreach { trial =>
      val corpus = randomDocs(6 + rnd.nextInt(6), 1000).toDF("doc_id", "text")
      val v1 = randomDocs(1 + rnd.nextInt(3), 2000).toDF("doc_id", "text")
      val v2 = randomDocs(1 + rnd.nextInt(3), 3000).toDF("doc_id", "text")
      val n = 2 + rnd.nextInt(3)
      val stored = Decontaminate.report(corpus, v1, "text", "doc_id", n)
      val grams = Decontaminate.benchGramSet(v1, "text", n)
      val (updated, updatedGrams) =
        Decontaminate.foldNewBenchmark(stored, grams, corpus, v2, "text", "doc_id", n)
      def canon(df: DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1).toSeq
      val full = Decontaminate.report(corpus, v1.unionByName(v2), "text", "doc_id", n)
      assert(canon(updated) == canon(full), s"trial $trial (n=$n)")
      assert(updatedGrams.collect().map(_.getString(0)).sorted.toSeq
        == Decontaminate.benchGramSet(v1.unionByName(v2), "text", n)
          .collect().map(_.getString(0)).sorted.toSeq, s"gram set, trial $trial")
    }
  }

  test("count-min merge: shard-merge == full sketch; commutative/associative; replay DOUBLES (not idempotent)") {
    def toks(docs: Seq[(Long, String)]): DataFrame =
      docs.toDF("doc_id", "text").select(explode(split(col("text"), " ")).as("tok"))
    def sk(docs: Seq[(Long, String)]) = CountMin.sketch(toks(docs), "tok", depth = 4, width = 16)
    def canon(df: DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(x => (x._1, x._2)).toSeq
    (0 until 10).foreach { trial =>
      val a = randomDocs(4 + rnd.nextInt(6), 100)
      val b = randomDocs(4 + rnd.nextInt(6), 200)
      val c = randomDocs(4 + rnd.nextInt(6), 300)
      val ab = CountMin.merge(sk(a), sk(b))
      assert(canon(ab) == canon(CountMin.merge(sk(b), sk(a))), s"commutativity, trial $trial")
      assert(canon(CountMin.merge(ab, sk(c)))
        == canon(CountMin.merge(sk(a), CountMin.merge(sk(b), sk(c)))),
        s"associativity, trial $trial")
      // the serving property q162 stands on: disjoint-shard merge == full sketch
      assert(canon(CountMin.merge(ab, sk(c))) == canon(sk(a ++ b ++ c)),
        s"merge == full, trial $trial")
      // and the documented caveat: sum is NOT idempotent — replaying a
      // shard doubles every one of its cells (why the streaming fold
      // needs the engine's exactly-once batch ids where HLL's max would
      // shrug a replay off)
      val doubled = canon(CountMin.merge(sk(a), sk(a)))
      assert(doubled == canon(sk(a)).map { case (r0, c0, n) => (r0, c0, 2 * n) },
        s"replay doubling, trial $trial")
    }
  }

  test("HDR merge: shard-merge == full sketch; commutative/associative; replay doubles (additive like count-min)") {
    def vals(docs: Seq[(Long, String)]): DataFrame =
      docs.toDF("doc_id", "text")
        .select((col("doc_id") % 3).cast("string").as("g"),
          size(split(col("text"), " ")).cast("long").as("v"))
    def sk(docs: Seq[(Long, String)]) = HdrSketch.sketch(vals(docs), "v", Seq("g"), subBits = 2)
    def canon(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2, x._3)).toSeq
    (0 until 10).foreach { trial =>
      val a = randomDocs(4 + rnd.nextInt(6), 100)
      val b = randomDocs(4 + rnd.nextInt(6), 200)
      val c = randomDocs(4 + rnd.nextInt(6), 300)
      val ab = HdrSketch.merge(sk(a), sk(b), Seq("g"))
      assert(canon(ab) == canon(HdrSketch.merge(sk(b), sk(a), Seq("g"))),
        s"commutativity, trial $trial")
      assert(canon(HdrSketch.merge(ab, sk(c), Seq("g")))
        == canon(HdrSketch.merge(sk(a), HdrSketch.merge(sk(b), sk(c), Seq("g")), Seq("g"))),
        s"associativity, trial $trial")
      // the serving property q163 stands on: disjoint-shard merge == full sketch
      assert(canon(HdrSketch.merge(ab, sk(c), Seq("g"))) == canon(sk(a ++ b ++ c)),
        s"merge == full, trial $trial")
      // additive-monoid caveat shared with count-min: replay doubles cells
      assert(canon(HdrSketch.merge(sk(a), sk(a), Seq("g")))
        == canon(sk(a)).map { case (g, e, s, n) => (g, e, s, 2 * n) },
        s"replay doubling, trial $trial")
    }
  }

  test("KMV mergeRegisters: shard-merge == full sketch; commutative/associative; kmin idempotent, n_docs doubles") {
    import graft.functions.KMinSketch
    def reg(docs: Seq[(Long, String)]): DataFrame =
      docs.toDF("doc_id", "text")
        .select((col("doc_id") % 3).cast("string").as("g"),
          graft.operators.TextAnalysis.portableHash32(col("text")).as("h"))
        .groupBy("g")
        .agg(KMinSketch.kmin(col("h"), 4).as("kmin"), count(lit(1)).as("n_docs"))
    def canon(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getSeq[Long](1).toList, r.getLong(2)))
      .sortBy(_._1).toSeq
    (0 until 10).foreach { trial =>
      val a = randomDocs(4 + rnd.nextInt(6), 100)
      val b = randomDocs(4 + rnd.nextInt(6), 200)
      val c = randomDocs(4 + rnd.nextInt(6), 300)
      def m(x: DataFrame, y: DataFrame) = KMinSketch.mergeRegisters(x, y, Seq("g"), k = 4)
      val ab = m(reg(a), reg(b))
      assert(canon(ab) == canon(m(reg(b), reg(a))), s"commutativity, trial $trial")
      assert(canon(m(ab, reg(c))) == canon(m(reg(a), m(reg(b), reg(c)))),
        s"associativity, trial $trial")
      // the serving property q164 stands on: disjoint-shard merge == full sketch
      assert(canon(m(ab, reg(c))) == canon(reg(a ++ b ++ c)), s"merge == full, trial $trial")
      // the split replay contract: kmin shrugs a replay off (set-min,
      // idempotent), n_docs doubles (count, additive-only)
      assert(canon(m(reg(a), reg(a)))
        == canon(reg(a)).map { case (g, km, n) => (g, km, 2 * n) },
        s"replay contract, trial $trial")
    }
  }

  test("HLL merge monoid laws on random shards: commutative, idempotent, associative, == full sketch") {
    def toks(docs: Seq[(Long, String)]): DataFrame =
      docs.toDF("doc_id", "text")
        .select((col("doc_id") % 3).cast("string").as("g"),
          explode(split(col("text"), " ")).as("tok"))
    def canon(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sortBy(x => (x._1, x._2)).toSeq
    (0 until 10).foreach { trial =>
      val a = randomDocs(4 + rnd.nextInt(6), 100)
      val b = randomDocs(4 + rnd.nextInt(6), 200)
      val c = randomDocs(4 + rnd.nextInt(6), 300)
      def sk(docs: Seq[(Long, String)]) =
        HyperLogLog.registers(toks(docs), "tok", Seq("g"), p = 4)
      val ab = HyperLogLog.merge(sk(a), sk(b), Seq("g"))
      assert(canon(ab) == canon(HyperLogLog.merge(sk(b), sk(a), Seq("g"))),
        s"commutativity, trial $trial")
      assert(canon(HyperLogLog.merge(sk(a), sk(a), Seq("g"))) == canon(sk(a)),
        s"idempotence, trial $trial")
      assert(canon(HyperLogLog.merge(ab, sk(c), Seq("g")))
        == canon(HyperLogLog.merge(sk(a), HyperLogLog.merge(sk(b), sk(c), Seq("g")), Seq("g"))),
        s"associativity, trial $trial")
      // the serving property q160 stands on: shard-merge == full sketch
      assert(canon(HyperLogLog.merge(ab, sk(c), Seq("g"))) == canon(sk(a ++ b ++ c)),
        s"merge == full, trial $trial")
    }
  }
}
