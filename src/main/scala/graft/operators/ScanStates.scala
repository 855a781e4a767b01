package graft.operators

/** Monoid state algebras for the fused hot-loop scans ([[TickPipeline.hotLoopChunked]]).
  *
  * The reference hot loop (reference: src/TickHotLoopF32.jl:287-437) is a
  * strictly causal per-tick recurrence, so each piece of its state lowers
  * to an associative segment summary suitable for the two-pass [[Scan]]:
  *
  *   - [[EligState]]: "has a valid tick been seen" plus eligible/encoder
  *     row counts. Eligibility of a row depends on whether any valid tick
  *     preceded it, so a segment carries BOTH branch counts (with/without
  *     a prior valid tick) — the conditional-prefix monoid.
  *   - [[BarSeg]]: the cumulative bar-normalization statistics
  *     (completed-bar count + sums of per-bar winsorized-delta min/max,
  *     reference: src/TickHotLoopF32.jl:383-405). A segment summarizes its
  *     contribution to the first bar it touches, the bars it closes
  *     outright, and the still-open tail bar — O(1) state regardless of
  *     segment length, associative because bar membership (bar_id) is
  *     globally known from the eligible-row number.
  */
object ScanStates {

  // ------------------------------------------------------------- EligState
  /** @param anyValid segment contains a valid-price tick
    * @param eligNP  eligible rows if NO valid tick precedes the segment
    * @param encNP   encoder-called rows (non-pre) under the same branch
    * @param eligP   eligible rows if a valid tick DOES precede the segment
    * @param encP    encoder-called rows under that branch
    */
  final case class EligState(anyValid: Boolean, eligNP: Long, encNP: Long,
      eligP: Long, encP: Long)

  val eligZero: EligState = EligState(anyValid = false, 0L, 0L, 0L, 0L)

  /** Lift one tick: valid ticks are `first` (not eligible) without a prior
    * valid tick and eligible with one; invalid ticks are `pre` (encoder
    * not called) without and `hold` (encoder called with zero ratio) with.
    */
  def eligLift(valid: Boolean): EligState =
    if (valid) EligState(anyValid = true, eligNP = 0L, encNP = 1L, eligP = 1L, encP = 1L)
    else EligState(anyValid = false, eligNP = 0L, encNP = 0L, eligP = 0L, encP = 1L)

  def eligCombine(a: EligState, b: EligState): EligState =
    EligState(
      a.anyValid || b.anyValid,
      a.eligNP + (if (a.anyValid) b.eligP else b.eligNP),
      a.encNP + (if (a.anyValid) b.encP else b.encNP),
      a.eligP + b.eligP,
      a.encP + b.encP)

  // ---------------------------------------------------------------- BarSeg
  /** Segment summary of eligible-tick contributions to 144-tick stats bars.
    *
    * Empty encodes "no eligible ticks". Otherwise:
    *   - (firstBar, firstMin, firstMax, firstClosed): contribution to the
    *     first touched bar and whether its boundary tick lies in-segment;
    *   - (midK, midSumMin, midSumMax): bars closed in-segment AFTER the
    *     first touched bar (their full min/max is known locally);
    *   - (tailBar, tailMin, tailMax) if hasTail: the still-open trailing
    *     bar (equals the first bar iff the segment touches only one bar
    *     and never closes it).
    */
  final case class BarSeg(
      empty: Boolean,
      firstBar: Long, firstMin: Int, firstMax: Int, firstClosed: Boolean,
      midK: Long, midSumMin: Long, midSumMax: Long,
      hasTail: Boolean, tailBar: Long, tailMin: Int, tailMax: Int)

  val barZero: BarSeg = BarSeg(empty = true, 0L, 0, 0, firstClosed = false,
    0L, 0L, 0L, hasTail = false, 0L, 0, 0)

  /** Lift one tick: non-eligible ticks are the identity; an eligible tick
    * contributes (d, d) to its bar and closes it iff it is the boundary
    * (144th) tick.
    */
  def barLift(isElig: Boolean, barId: Long, d: Int, isBoundary: Boolean): BarSeg =
    if (!isElig) barZero
    else BarSeg(empty = false, barId, d, d, firstClosed = isBoundary,
      0L, 0L, 0L, hasTail = !isBoundary, barId, d, d)

  /** Associative combine. Adjacent segments: `b`'s first touched bar is
    * `a`'s open tail bar when `a` has one (eligible ticks number bars
    * contiguously), else a strictly later bar.
    */
  def barCombine(a: BarSeg, b: BarSeg): BarSeg = normalize(barCombine0(a, b))

  // Canonical form: closed-tail segments carry zeroed tail fields, so
  // structurally-equal states compare equal regardless of fold shape.
  private def normalize(s: BarSeg): BarSeg =
    if (s.empty || s.hasTail) s
    else s.copy(tailBar = 0L, tailMin = 0, tailMax = 0)

  private def barCombine0(a: BarSeg, b: BarSeg): BarSeg = {
    if (a.empty) return b
    if (b.empty) return a
    if (a.hasTail && b.firstBar == a.tailBar) {
      // b's head contribution merges into a's open tail bar.
      val m = math.min(a.tailMin, b.firstMin)
      val x = math.max(a.tailMax, b.firstMax)
      if (a.firstBar == a.tailBar && !a.firstClosed) {
        // a touches a single open bar: the merged bar is also a's first.
        if (b.firstClosed)
          BarSeg(empty = false, a.firstBar, m, x, firstClosed = true,
            b.midK, b.midSumMin, b.midSumMax,
            b.hasTail, b.tailBar, b.tailMin, b.tailMax)
        else
          // b never closes it either, so b touched only this bar: the
          // merged contribution is both the result's first and its tail.
          BarSeg(empty = false, a.firstBar, m, x, firstClosed = false,
            0L, 0L, 0L, hasTail = true, a.firstBar, m, x)
      } else if (b.firstClosed) {
        // merged bar closes inside b -> counts as a mid bar of the result.
        BarSeg(empty = false, a.firstBar, a.firstMin, a.firstMax, a.firstClosed,
          a.midK + 1 + b.midK, a.midSumMin + m + b.midSumMin, a.midSumMax + x + b.midSumMax,
          b.hasTail, b.tailBar, b.tailMin, b.tailMax)
      } else {
        // merged bar stays open: it is the result's tail (b touched only it).
        BarSeg(empty = false, a.firstBar, a.firstMin, a.firstMax, a.firstClosed,
          a.midK + b.midK, a.midSumMin + b.midSumMin, a.midSumMax + b.midSumMax,
          hasTail = true, a.tailBar, m, x)
      }
    } else {
      // a ended exactly at a boundary (no open tail): b's bars are all new.
      val (bk, bsm, bsx) =
        if (b.firstClosed) (b.midK + 1, b.midSumMin + b.firstMin, b.midSumMax + b.firstMax)
        else (b.midK, b.midSumMin, b.midSumMax)
      val openFirst = !b.firstClosed && b.hasTail && b.tailBar == b.firstBar
      BarSeg(empty = false, a.firstBar, a.firstMin, a.firstMax, a.firstClosed,
        a.midK + bk, a.midSumMin + bsm, a.midSumMax + bsx,
        hasTail = b.hasTail,
        tailBar = if (b.hasTail) b.tailBar else 0L,
        tailMin = if (openFirst) b.firstMin else b.tailMin,
        tailMax = if (openFirst) b.firstMax else b.tailMax)
    }
  }

  /** Cumulative interpretation of a from-stream-start fold:
    * (closed-bar count, sum of closed-bar mins, sum of closed-bar maxes,
    * open-bar min, open-bar max, open-bar exists).
    */
  def barCumulative(s: BarSeg): (Long, Long, Long, Int, Int, Boolean) =
    if (s.empty) (0L, 0L, 0L, 0, 0, false)
    else {
      val k = s.midK + (if (s.firstClosed) 1L else 0L)
      val sm = s.midSumMin + (if (s.firstClosed) s.firstMin.toLong else 0L)
      val sx = s.midSumMax + (if (s.firstClosed) s.firstMax.toLong else 0L)
      (k, sm, sx, s.tailMin, s.tailMax, s.hasTail)
    }
}
