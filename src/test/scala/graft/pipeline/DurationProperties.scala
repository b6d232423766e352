package graft.pipeline

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the duration-math and threshold semantics (SURVEY.md
  * §5): the per-operand-truncation law is checked against a reference model
  * implemented directly on Long (the same arithmetic BigInt performs in
  * /root/reference/main.js:158-162), driver-side — the *distributed*
  * behavior is pinned by TracePipelineSpec; these pin the scalar law
  * including the corner where naive differencing is off by one.
  */
object DurationProperties extends Properties("duration") {

  private val nsGen = Gen.chooseNum(0L, 4_102_444_800_000_000_000L) // ~2100 AD

  property("perOperand = e div 1e6 - s div 1e6 for all s <= e") =
    forAll(nsGen, nsGen) { (a, b) =>
      val (s, e) = if (a <= b) (a, b) else (b, a)
      val perOperand = e / 1_000_000L - s / 1_000_000L
      perOperand >= 0 && perOperand == TraceModel.durationMs(s, e)
    }

  property("naive differs from perOperand by at most 1, exactly when remainders straddle") =
    forAll(nsGen, nsGen) { (a, b) =>
      val (s, e) = if (a <= b) (a, b) else (b, a)
      val perOperand = TraceModel.durationMs(s, e)
      val naive = (e - s) / 1_000_000L
      val diff = perOperand - naive
      val straddles = e % 1_000_000L < s % 1_000_000L
      (diff == 0 || diff == 1) && (diff == 1) == straddles
    }

  property("keep-filter threshold is inclusive at 2000") =
    forAll(Gen.chooseNum(0L, 10_000L)) { d =>
      TraceModel.keep(d, 2000L) == (d >= 2000L)
    }
}

/** Scalar reference model of the pipeline's arithmetic. */
object TraceModel {
  def durationMs(startNs: Long, endNs: Long): Long =
    endNs / 1_000_000L - startNs / 1_000_000L
  def keep(durationMs: Long, min: Long): Boolean = durationMs >= min
}
