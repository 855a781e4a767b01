package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import ScanStates._

/** The scan monoids must be associative (any partition split yields the
  * same fold) and must agree with a direct sequential simulation.
  */
class ScanStatesSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  // Random tick stream: ~15% invalid, deltas in [-12, 12].
  private def stream(n: Int): Vector[(Boolean, Int)] =
    Vector.fill(n)((rnd.nextInt(100) >= 15, rnd.nextInt(25) - 12))

  private def foldAt[S](xs: Vector[S], zero: S, comb: (S, S) => S, splits: Seq[Int]): S = {
    val cuts = (0 +: splits.sorted :+ xs.length).distinct
    cuts.sliding(2).map { case Seq(a, b) => xs.slice(a, b).foldLeft(zero)(comb) }
      .foldLeft(zero)(comb)
  }

  test("EligState: split-invariant and matches sequential simulation") {
    val ticks = stream(500)
    val lifted = ticks.map { case (v, _) => eligLift(v) }
    val whole = lifted.foldLeft(eligZero)(eligCombine)
    for (_ <- 1 to 20) {
      val splits = Seq.fill(4)(rnd.nextInt(500))
      assert(foldAt(lifted, eligZero, eligCombine, splits) == whole)
    }
    // sequential truth
    var seen = false; var elig = 0L; var enc = 0L
    ticks.foreach { case (v, _) =>
      if (v && seen) elig += 1
      if (v || seen) enc += 1
      if (v) seen = true
    }
    assert(whole.anyValid == ticks.exists(_._1))
    assert(whole.eligNP == elig)
    assert(whole.encNP == enc)
  }

  test("BarSeg: split-invariant and matches sequential simulation") {
    // Eligible ticks with bar size 4 (stand-in for 144; algebra is
    // size-agnostic — barId/isBoundary are inputs).
    val n = 230
    val barSize = 4
    val ticks = stream(n)
    var seen = false; var eligRn = 0L
    val lifted = ticks.map { case (v, d) =>
      val isElig = v && seen
      if (v) seen = true
      if (isElig) {
        eligRn += 1
        val barId = (eligRn - 1) / barSize
        barLift(isElig = true, barId, d, isBoundary = eligRn % barSize == 0)
      } else barZero
    }
    val whole = lifted.foldLeft(barZero)(barCombine)
    for (_ <- 1 to 50) {
      val splits = Seq.fill(5)(rnd.nextInt(n))
      assert(foldAt(lifted, barZero, barCombine, splits) == whole)
    }
    // sequential truth
    var k = 0L; var sm = 0L; var sx = 0L
    var curMin = Int.MaxValue; var curMax = Int.MinValue; var open = false
    var rn = 0L; var seen2 = false
    ticks.foreach { case (v, d) =>
      if (v && seen2) {
        rn += 1
        curMin = math.min(curMin, d); curMax = math.max(curMax, d); open = true
        if (rn % barSize == 0) {
          k += 1; sm += curMin; sx += curMax
          curMin = Int.MaxValue; curMax = Int.MinValue; open = false
        }
      }
      if (v) seen2 = true
    }
    val (ck, csm, csx, cmn, cmx, copen) = barCumulative(whole)
    assert((ck, csm, csx) == ((k, sm, sx)))
    assert(copen == open)
    if (open) assert((cmn, cmx) == ((curMin, curMax)))
  }
}
