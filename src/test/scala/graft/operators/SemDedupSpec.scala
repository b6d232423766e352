package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Ground truth for [[SemDedup.screen]]: a scalar twin (quantize ->
  * argmax cell -> integer tau predicate) reproduces the whole output on
  * a planted-dup fixture; the survivor set is exactly the greedy
  * lowest-id keepers; trained-centroid plumbing preserves the output
  * contract.
  */
class SemDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ids < nlist are the deterministic centroids (orthogonal axes);
  // planted dups live at ids >= nlist: 4/5 collapse onto centroid 0,
  // 8 onto centroid 2 (after rescale — cosine ignores magnitude), 6 is
  // an in-cell NON-dup (assigns to cell 1 at cosine ~0.25 < tau), and
  // 7 is the zero vector (excluded: cosine undefined).
  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 0.0f, 1.0f)),
    (4L, Array(0.99f, 0.02f, 0.0f, 0.0f)),   // dup of 0
    (5L, Array(0.98f, -0.01f, 0.01f, 0.0f)), // dup of 0 AND 4
    (6L, Array(-0.2f, 0.3f, -0.8f, -0.8f)),  // cell 1, below tau: kept
    (7L, Array(0.0f, 0.0f, 0.0f, 0.0f)),     // zero: excluded
    (8L, Array(0.0f, 2.0f, 2.01f, 0.0f))     // dup of centroid 2
  )

  private val Nlist = 4
  private val TauNum = 7
  private val TauDen = 20

  /** Shared scalar-twin primitives: int8 codes + exact integer dot. */
  private def codesOf(v: Array[Float]): Array[Long] = {
    val iv = v.map(x => math.floor(x.toDouble * Quantize.Shift).toLong)
    val s = if (iv.isEmpty) 0L else iv.map(math.abs).max
    iv.map { x =>
      if (s == 0L) 0L
      else if (x >= 0L) x * 127 / s
      else -((-x * 127) / s)
    }
  }
  private def dot(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => x * y }.sum

  /** Scalar re-implementation of the full chain on int8 codes. */
  private def scalarScreen(
      vs: Seq[(Long, Array[Float])]): Map[Long, (Long, Long, Boolean)] = {
    val nz = vs.map { case (id, v) => (id, codesOf(v)) }
      .filter { case (_, q) => q.exists(_ != 0L) }
    val cents = nz.filter(_._1 < Nlist)
    val asg = nz.map { case (id, q) =>
      val nrm = math.sqrt(dot(q, q).toDouble)
      val cell = cents
        .map { case (cid, cq) =>
          (cid, dot(q, cq).toDouble / (nrm * math.sqrt(dot(cq, cq).toDouble)))
        }
        .sortBy { case (cid, csim) => (-csim, cid) }
        .head._1
      (id, q, dot(q, q), cell)
    }
    asg.map { case (id, q, nsq, cell) =>
      val nd = asg.count { case (id2, q2, nsq2, cell2) =>
        val d = dot(q2, q)
        cell2 == cell && id2 < id && d > 0 &&
          TauDen.toLong * TauDen * d * d >= TauNum.toLong * TauNum * nsq2 * nsq
      }
      id -> ((cell, nd.toLong, nd == 0))
    }.toMap
  }

  private def runScreen(centroidsOpt: Option[org.apache.spark.sql.DataFrame] = None) =
    SemDedup.screen(
      vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
      nlist = Nlist, tauNum = TauNum, tauDen = TauDen,
      centroidsOpt = centroidsOpt)

  test("screen equals the scalar twin on the planted-dup fixture") {
    val got = runScreen().collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got == scalarScreen(vecs))
  }

  test("planted dups drop, keepers and in-cell non-dups survive, zero vector is excluded") {
    val got = runScreen().collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L, 6L, 8L)) // 7 excluded
    assert(got.filter(_._2).keySet == Set(0L, 1L, 2L, 3L, 6L)) // lowest-id keepers
  }

  test("transitive dup evidence: 5 counts both 0 and 4 as lower-id tau-neighbors") {
    val got = runScreen().collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(5L) == 2L)
  }

  test("greedy self-consistency: no survivor has a lower-id tau-neighbor in its cell") {
    // kept=false rows all carry evidence; kept=true rows carry none.
    val rows = runScreen().collect()
    assert(rows.forall(r => (r.getLong(2) == 0L) == r.getBoolean(3)))
  }

  /** Scalar twin of the D4 chain: survivors of [[scalarScreen]], ranked
    * in-cell by (csim to own centroid DESC, id), integer drop boundary.
    */
  private def scalarPrune(
      vs: Seq[(Long, Array[Float])],
      dropNum: Int, dropDen: Int): Map[Long, (Long, Long, Long, Boolean)] = {
    val nz = vs.map { case (id, v) => (id, codesOf(v)) }
      .filter { case (_, q) => q.exists(_ != 0L) }
    val cents = nz.filter(_._1 < Nlist)
      .map { case (cid, cq) => (cid, cq, math.sqrt(dot(cq, cq).toDouble)) }
    val screen = scalarScreen(vs)
    val surv = nz
      .filter { case (id, _) => screen(id)._3 } // kept by the tau screen
      .map { case (id, q) =>
        val nrm = math.sqrt(dot(q, q).toDouble)
        val (cell, csim) = cents
          .map { case (cid, cq, cnrm) =>
            (cid, dot(q, cq).toDouble / (nrm * cnrm))
          }
          .sortBy { case (cid, cs) => (-cs, cid) }
          .head
        (id, cell, csim)
      }
    surv.groupBy(_._2).toSeq.flatMap { case (_, cellVs) =>
      val ranked = cellVs.sortBy { case (id, _, cs) => (-cs, id) }
      val n = ranked.size.toLong
      ranked.zipWithIndex.map { case ((id, cell, _), i) =>
        val rank = i + 1L
        id -> ((cell, rank, n, rank * dropDen > n * dropNum))
      }
    }.toMap
  }

  test("prototypePrune equals the scalar D4 twin on the planted-dup fixture") {
    val got = SemDedup.prototypePrune(
      vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
      nlist = Nlist, tauNum = TauNum, tauDen = TauDen,
      dropNum = 1, dropDen = 3).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(got == scalarPrune(vecs, 1, 3))
  }

  test("prune covers exactly the screen survivors; centroids rank most prototypical") {
    val pruned = SemDedup.prototypePrune(
      vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
      nlist = Nlist, tauNum = TauNum, tauDen = TauDen,
      dropNum = 1, dropDen = 3).collect()
    assert(pruned.map(_.getLong(0)).toSet == Set(0L, 1L, 2L, 3L, 6L))
    // each centroid sits in its own cell at csim = 1 -> proto_rank 1
    val rankOf = pruned.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(Seq(0L, 1L, 2L, 3L).forall(rankOf(_) == 1L))
    // cell 1 holds {1, 6}: the centroid is pruned at drop=1/3 (rank
    // 1*3 <= 2*1 is false... boundary check below), 6 survives
    val keptOf = pruned.map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    // n_cell=2, dropNum/dropDen=1/3: rank*3 > 2 holds for both ranks ->
    // nothing drops in 2-vector cells; singleton cells keep their only
    // member (rank*3 > 1). The integer boundary never over-drops.
    assert(keptOf.values.forall(identity))
    val strict = SemDedup.prototypePrune(
      vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
      nlist = Nlist, tauNum = TauNum, tauDen = TauDen,
      dropNum = 1, dropDen = 2).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    // at drop=1/2 the 2-vector cell {1, 6} drops its rank-1 member (the
    // centroid, csim = 1) and keeps the diverse shell member 6
    assert(!strict(1L) && strict(6L))
    // singletons still survive: rank 1*2 > 1*1
    assert(strict(0L) && strict(2L) && strict(3L))
  }

  // Arrivals for the stored-index probe: 100 sits in 0's tau-ball
  // (dropped against the index), 101 spreads across +/- axes so its
  // best-centroid csim ties between cells 0 and 1 (exercising the
  // lowest-cell tie-break) and stays below tau everywhere (kept), 102
  // is the zero vector (excluded).
  private val arrivals = Seq(
    (100L, Array(0.97f, 0.03f, 0.0f, 0.0f)),
    (101L, Array(0.1f, 0.1f, -1.0f, -1.0f)),
    (102L, Array(0.0f, 0.0f, 0.0f, 0.0f))
  )

  /** Scalar twin of the stored-index probe: kept index members (from
    * [[scalarScreen]]) probed by each arrival under the all-prior rule.
    */
  private def scalarProbe(
      idx: Seq[(Long, Array[Float])],
      arr: Seq[(Long, Array[Float])]): Map[Long, (Long, Long, Boolean)] = {
    val nzIdx = idx.map { case (id, v) => (id, codesOf(v)) }
      .filter { case (_, q) => q.exists(_ != 0L) }
    val cents = nzIdx.filter(_._1 < Nlist)
      .map { case (cid, cq) => (cid, cq, math.sqrt(dot(cq, cq).toDouble)) }
    def cellOf(q: Array[Long]): Long = {
      val nrm = math.sqrt(dot(q, q).toDouble)
      cents.map { case (cid, cq, cnrm) => (cid, dot(q, cq).toDouble / (nrm * cnrm)) }
        .sortBy { case (cid, cs) => (-cs, cid) }.head._1
    }
    val screen = scalarScreen(idx)
    val keptIdx = nzIdx.filter { case (id, _) => screen(id)._3 }
      .map { case (id, q) => (q, dot(q, q), cellOf(q)) }
    arr.map { case (id, v) => (id, codesOf(v)) }
      .filter { case (_, q) => q.exists(_ != 0L) }
      .map { case (id, q) =>
        val nsq = dot(q, q)
        val cell = cellOf(q)
        val n = keptIdx.count { case (qi, ni, ci) =>
          val d = dot(qi, q)
          ci == cell && d > 0 &&
            TauDen.toLong * TauDen * d * d >= TauNum.toLong * TauNum * ni * nsq
        }
        id -> ((cell, n.toLong, n == 0))
      }.toMap
  }

  test("probeIndex screens arrivals against the persisted artifacts (all-prior rule)") {
    val idxDf = vecs.toDF("vec_id", "embedding")
    val cents = SemDedup.centroidTable(idxDf, "vec_id", "embedding", nlist = Nlist)
    val kept = SemDedup.keptCodes(
      idxDf, "vec_id", "embedding", nlist = Nlist,
      tauNum = TauNum, tauDen = TauDen)
    val got = SemDedup.probeIndex(
      arrivals.toDF("vec_id", "embedding"), kept, cents,
      "vec_id", "embedding", tauNum = TauNum, tauDen = TauDen).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got == scalarProbe(vecs, arrivals))
    // the fixture exercises all three verdicts
    assert(got.keySet == Set(100L, 101L)) // zero vector excluded
    assert(!got(100L)._3 && got(100L)._2 >= 1L) // in 0's tau-ball: dropped
    assert(got(101L)._3 && got(101L)._1 == 0L)  // tie-broken to cell 0, kept
  }

  /** Scalar twin of the cell-confinement miss audit: exact all-pairs
    * tau graph on the slice vs its same-cell subset.
    */
  private def scalarMissAudit(
      vs: Seq[(Long, Array[Float])]): (Long, Long, Long, Double) = {
    val nz = vs.map { case (id, v) => (id, codesOf(v)) }
      .filter { case (_, q) => q.exists(_ != 0L) }
    val cents = nz.filter(_._1 < Nlist)
      .map { case (cid, cq) => (cid, cq, math.sqrt(dot(cq, cq).toDouble)) }
    def cellOf(q: Array[Long]): Long = {
      val nrm = math.sqrt(dot(q, q).toDouble)
      cents.map { case (cid, cq, cnrm) =>
        (cid, dot(q, cq).toDouble / (nrm * cnrm))
      }.sortBy { case (cid, cs) => (-cs, cid) }.head._1
    }
    val asg = nz.map { case (id, q) => (id, q, dot(q, q), cellOf(q)) }
    val tp = for {
      (ia, qa, na, ca) <- asg
      (ib, qb, nb, cb) <- asg
      if ia < ib
      d = dot(qa, qb)
      if d > 0 &&
        TauDen.toLong * TauDen * d * d >= TauNum.toLong * TauNum * na * nb
    } yield (ca, cb)
    val nEx = tp.size.toLong
    val nIn = tp.count { case (ca, cb) => ca == cb }.toLong
    val miss = nEx - nIn
    (nEx, nIn, miss, if (nEx == 0) 0.0 else miss.toDouble / nEx.toDouble)
  }

  test("cellMissAudit counts boundary-straddling tau pairs the screen cannot see") {
    // 9/10 are a planted tau-pair straddling the cell 0 / cell 1
    // boundary (cos ~0.994, but they argmax into different cells) —
    // exactly the miss class the audit exists to count.
    val aud = vecs ++ Seq(
      (9L, Array(0.9f, 1.0f, 0.0f, 0.0f)),  // cell 1
      (10L, Array(1.0f, 0.9f, 0.0f, 0.0f))) // cell 0
    val got = SemDedup.cellMissAudit(
      aud.toDF("vec_id", "embedding"), "vec_id", "embedding",
      nlist = Nlist, tauNum = TauNum, tauDen = TauDen, maxId = 100L)
      .collect().head
    val exp = scalarMissAudit(aud)
    assert(
      (got.getLong(0), got.getLong(1), got.getLong(2), got.getDouble(3)) == exp)
    assert(got.getLong(2) >= 1L) // the planted boundary pair IS missed
    assert(got.getLong(1) >= 1L) // and in-cell tau pairs are NOT counted as missed
  }

  test("cellMissAudit with no tau pairs reports zeros, not division artifacts") {
    // orthogonal axes only: every cross pair has dot = 0 (excluded by d > 0)
    val got = SemDedup.cellMissAudit(
      vecs.take(4).toDF("vec_id", "embedding"), "vec_id", "embedding",
      nlist = Nlist, tauNum = TauNum, tauDen = TauDen, maxId = 100L)
      .collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getDouble(3))
      == ((0L, 0L, 0L, 0.0)))
  }

  test("trained-centroid plumbing: same coverage and schema, verdicts re-derive") {
    val cents = Similarity.trainedCentroids(
      Quantize.int8(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding")
        .filter(col("scale") > 0)
        .select(col("vec_id"), col("qvec").cast("array<float>").as("q")),
      "vec_id", "q", nlist = 2, seed = 7L, maxIter = 5)
    val got = runScreen(Some(cents))
    assert(got.columns.toSeq ==
      Seq("vec_id", "cell", "n_dup_lower", "kept"))
    val rows = got.collect()
    assert(rows.map(_.getLong(0)).toSet == Set(0L, 1L, 2L, 3L, 4L, 5L, 6L, 8L))
    assert(rows.forall(r => (r.getLong(2) == 0L) == r.getBoolean(3)))
  }

  /** [[codesOf]] for the double-typed blended vectors
    * [[SemDedup.plantClusters]] emits.
    */
  private def codesOfD(v: Array[Double]): Array[Long] = {
    val iv = v.map(x => math.floor(x * Quantize.Shift).toLong)
    val s = if (iv.isEmpty) 0L else iv.map(math.abs).max
    iv.map { x =>
      if (s == 0L) 0L
      else if (x >= 0L) x * 127 / s
      else -((-x * 127) / s)
    }
  }

  test("plantClusters reproduces the scalar blend bit for bit; the planted audit equals its scalar twin") {
    val k = 2
    val plantedDf = SemDedup.plantClusters(
      vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
      k = k, maxId = 100L)
    val planted = plantedDf.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    // 7/8 + 1/8 are exact binary fractions: the Spark zip_with and this
    // scalar loop must agree to the last bit (that is what lets the
    // DuckDB oracle re-derive the q215 fixture verbatim).
    val exp = vecs.map { case (id, v) =>
      val a = vecs.find(_._1 == id % k).get._2
      id -> a.zip(v).map { case (x, y) =>
        0.875 * x.toDouble + 0.125 * y.toDouble }
    }.toMap
    assert(planted.keySet == exp.keySet)
    assert(planted.forall { case (id, arr) => arr.sameElements(exp(id)) })
    // the zero vector blends to 7/8 of its anchor: clustered, nonzero
    assert(planted(7L).exists(_ != 0.0))

    // audit over the planted corpus at nlist = k vs a scalar twin on
    // the scalar blend (codes, argmax, all-pairs tau, cell subset)
    val got = SemDedup.cellMissAudit(
      plantedDf, "vec_id", "embedding",
      nlist = k, tauNum = TauNum, tauDen = TauDen, maxId = 100L)
      .collect().head
    val nz = exp.toSeq.sortBy(_._1)
      .map { case (id, v) => (id, codesOfD(v)) }
      .filter { case (_, q) => q.exists(_ != 0L) }
    val cents = nz.filter(_._1 < k)
      .map { case (cid, cq) => (cid, cq, math.sqrt(dot(cq, cq).toDouble)) }
    def cellOf(q: Array[Long]): Long = {
      val nrm = math.sqrt(dot(q, q).toDouble)
      cents.map { case (cid, cq, cnrm) =>
        (cid, dot(q, cq).toDouble / (nrm * cnrm))
      }.sortBy { case (cid, cs) => (-cs, cid) }.head._1
    }
    val asg = nz.map { case (id, q) => (id, q, dot(q, q), cellOf(q)) }
    val tp = for {
      (ia, qa, na, ca) <- asg
      (ib, qb, nb, cb) <- asg
      if ia < ib
      d = dot(qa, qb)
      if d > 0 &&
        TauDen.toLong * TauDen * d * d >= TauNum.toLong * TauNum * na * nb
    } yield (ca, cb)
    val nEx = tp.size.toLong
    val nIn = tp.count { case (ca, cb) => ca == cb }.toLong
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) ==
      ((nEx, nIn, nEx - nIn)))
    // the planted regime is tau-pair-RICH (in-cluster cosines ~0.9+):
    // the audit has real pairs to confine, unlike sparse isotropic toys
    assert(nEx >= 10L)
    assert(nIn >= 10L)
  }

  test("trainedCentroids k=1 is the corpus mean; screen with it is the exhaustive all-pairs verdict") {
    val df = vecs.toDF("vec_id", "embedding")
    val codes = Quantize.int8(df, "vec_id", "embedding")
      .filter(col("scale") > 0)
      .select(col("vec_id"), col("qvec").cast("array<float>").as("q"))
    val cents = Similarity.trainedCentroids(codes, "vec_id", "q", nlist = 1)
    val crow = cents.collect()
    assert(crow.length == 1 && crow.head.getLong(0) == 0L)
    // the k=1 fixed point: the elementwise mean of the code rows (codes
    // are small exact integers, 8 nonzero rows — the double sum and the
    // /8 are both exact, so equality is bit-level, no tolerance)
    val codeRows = codes.collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val mean = codeRows.transpose.map(c => (c.sum / codeRows.length).toFloat)
    assert(crow.head.getSeq[Float](1).toArray.sameElements(mean))

    // screen with the single trained cell = gated all-pairs lower-id
    // tau dedup with cell constant 0, whatever the learned center is —
    // the q216 oracle device
    val got = runScreen(Some(cents)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    val nz = vecs.map { case (id, v) => (id, codesOf(v)) }
      .filter { case (_, q) => q.exists(_ != 0L) }
    val expScreen = nz.map { case (id, q) =>
      val nsq = dot(q, q)
      val nd = nz.count { case (id2, q2) =>
        val d = dot(q2, q)
        id2 < id && d > 0 &&
          TauDen.toLong * TauDen * d * d >=
            TauNum.toLong * TauNum * dot(q2, q2) * nsq
      }
      id -> ((0L, nd.toLong, nd == 0))
    }.toMap
    assert(got == expScreen)
    // one cell sees strictly more dup evidence than cell-confined q208:
    // every tau pair counts, none escapes across a boundary
    val confined = runScreen()
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(nz.map(_._1).forall(id => got(id)._2 >= confined(id)))
  }

  test("an empty derived centroid table fails loudly instead of emitting zero rows") {
    // id-offset corpus: no ids < nlist, so the default first-nlist
    // quantizer derives nothing — the r16 ADVICE silent-zero case
    val shifted = vecs.map { case (id, v) => (id + 1000L, v) }
    val e = intercept[IllegalArgumentException] {
      SemDedup.screen(
        shifted.toDF("vec_id", "embedding"), "vec_id", "embedding",
        nlist = Nlist, tauNum = TauNum, tauDen = TauDen)
    }
    assert(e.getMessage.contains("empty centroid table"))
  }
}
