package graft.functions

/** Anti-aliasing decimation FIR design (reference: src/FIRFilter.jl:35-86).
  *
  * The reference designs an equiripple low-pass with Parks-McClellan
  * (Remez exchange) at the Kaiser-estimated order (M=21 → order 1054,
  * 1055 taps by its own Kaiser estimate; the source comment citing 1087
  * taps overstates it). This port keeps the identical specification
  * surface — passband 80% of the new Nyquist, 0.1 dB passband ripple,
  * 80 dB stopband, Kaiser order estimate forced even — and THE SHIPPED
  * COEFFICIENTS ARE TRUE EQUIRIPPLE AT EVERY SUPPORTED M, including the
  * reference's own orders (M=21 → 1054, M=144 → 7222): the exchange
  * ([[remezLowpass]]) runs on the stable FIRST barycentric form with
  * log-space node weights, a per-band Chebyshev-clustered error grid
  * (the edge-most ripple pair compresses ~n² tighter than a uniform
  * grid's step and silently vanishes above order ~1000 otherwise), an
  * alternation-preserving pair-removal candidate trim, and — above order
  * ~400, where a cold start degenerates — reference scaling
  * ([[remezLowpassScaled]]): converge a half-order design and seed the
  * next exchange with its stretched extremal set, doubling up a ladder.
  * The Kaiser-windowed sinc ([[kaiserLowpass]]) remains only as the
  * documented fallback if the exchange ever fails to converge
  * (FirFilterSpec asserts it does NOT ship at M∈{4,21,144}).
  * Design runs once on the driver; coefficients ship to executors as a
  * literal array.
  */
object FirFilter {

  /** Zeroth-order modified Bessel function of the first kind (series). */
  private def besselI0(x: Double): Double = {
    var sum = 1.0; var term = 1.0; var k = 1
    while (term > 1e-16 * sum && k < 1000) {
      val t = x / (2.0 * k)
      term *= t * t
      sum += term
      k += 1
    }
    sum
  }

  /** Kaiser order estimate, matching the reference's formula
    * (FIRFilter.jl:55-62): order = ceil((A - 8) / (2.285 * 2π * Δf)),
    * forced even for a Type-I linear-phase filter.
    */
  def kaiserOrder(attenDb: Double, transitionWidth: Double): Int = {
    val est = math.ceil((attenDb - 8.0) / (2.285 * 2.0 * math.Pi * transitionWidth)).toInt
    if (est % 2 == 1) est + 1 else est
  }

  /** Derived design parameters shared by both design methods. */
  private final case class Spec(
      fPass: Double, fStop: Double, deltaP: Double, deltaS: Double,
      atten: Double, order: Int)

  private def specFor(m: Int, fs: Double, aPassDb: Double, aStopDb: Double,
      passbandFraction: Double): Spec = {
    require(m >= 2, s"decimation factor must be >= 2: $m")
    val fNyqNew = fs / (2.0 * m)
    val fPass = passbandFraction * fNyqNew / fs // normalized (cycles/sample)
    val fStop = fNyqNew / fs
    val deltaP = (math.pow(10, aPassDb / 20) - 1) / (math.pow(10, aPassDb / 20) + 1)
    val deltaS = math.pow(10, -aStopDb / 20)
    val atten = -20.0 * math.log10(math.min(deltaP, deltaS))
    Spec(fPass, fStop, deltaP, deltaS, atten, kaiserOrder(atten, fStop - fPass))
  }

  /** Kaiser-windowed sinc at the spec's estimated order (the round-3
    * design, kept as the documented fallback path).
    */
  def kaiserLowpass(
      m: Int,
      fs: Double = 1.0,
      aPassDb: Double = 0.1,
      aStopDb: Double = 80.0,
      passbandFraction: Double = 0.8): Array[Double] = {
    val sp = specFor(m, fs, aPassDb, aStopDb, passbandFraction)
    val beta =
      if (sp.atten > 50) 0.1102 * (sp.atten - 8.7)
      else if (sp.atten >= 21) 0.5842 * math.pow(sp.atten - 21, 0.4) + 0.07886 * (sp.atten - 21)
      else 0.0
    val order = sp.order
    val n = order + 1
    val fc = (sp.fPass + sp.fStop) / 2.0 // normalized cutoff (cycles/sample)
    val mid = order / 2.0
    val i0b = besselI0(beta)
    val h = Array.tabulate(n) { i =>
      val x = i - mid
      val sinc = if (x == 0.0) 2.0 * fc else math.sin(2.0 * math.Pi * fc * x) / (math.Pi * x)
      val w = besselI0(beta * math.sqrt(math.max(0.0, 1.0 - (x / mid) * (x / mid)))) / i0b
      sinc * w
    }
    normalizeDc(h)
  }

  /** Barycentric-Lagrange interpolant through (x_k, y_k) whose node
    * weights are kept in LOG space (logw, sgn) and combined per
    * evaluation point with log-sum-exp. At orders in the thousands the
    * weights span hundreds of decades — any fixed global normalization
    * underflows the terms that dominate far from the densest node
    * cluster, which is exactly why textbook Parks-McClellan
    * implementations die above ~1000 taps.
    */
  private final class Bary(xs: Array[Double], var ys: Array[Double]) {
    private val n = xs.length
    private val logw = new Array[Double](n)
    private val sgnw = new Array[Double](n)
    locally {
      var k = 0
      while (k < n) {
        var s = 0.0; var neg = 0
        var j = 0
        while (j < n) {
          if (j != k) {
            val d = xs(k) - xs(j)
            if (d < 0) neg += 1
            s -= math.log(math.abs(d))
          }
          j += 1
        }
        logw(k) = s
        sgnw(k) = if (neg % 2 == 0) 1.0 else -1.0
        k += 1
      }
    }
    def apply(xv: Double): Double = {
      // FIRST (modified Lagrange) barycentric form — backward stable for
      // arbitrary node sets (Higham 2004), unlike the second form whose
      // denominator cancels catastrophically at points mid-gap between
      // the two bands: P(x) = Σ_j ℓ_j(x) y_j with
      // log|ℓ_j(x)| = Σ_i log|x - x_i| - log|x - x_j| + log w_j.
      // Thread-safe (local scratch): the exchange evaluates the error
      // grid from a parallel loop at high orders.
      val lt = new Array[Double](n) // per-point log terms
      var logL = 0.0
      var negAll = 0
      var j = 0
      while (j < n) {
        val d = xv - xs(j)
        if (math.abs(d) < 1e-15) return ys(j)
        val ld = math.log(math.abs(d))
        lt(j) = ld // stash: reused below instead of a second log()
        logL += ld
        if (d < 0) negAll += 1
        j += 1
      }
      var mx = Double.NegativeInfinity
      j = 0
      while (j < n) {
        lt(j) = logL - lt(j) + logw(j)
        if (lt(j) > mx) mx = lt(j)
        j += 1
      }
      var acc = 0.0
      j = 0
      while (j < n) {
        // sign(ℓ_j) = sign(∏_{i≠j}(x - x_i)) * sgn(w_j)
        val negOthers = if (xv - xs(j) < 0) negAll - 1 else negAll
        val s = (if (negOthers % 2 == 0) 1.0 else -1.0) * sgnw(j)
        acc += s * math.exp(lt(j) - mx) * ys(j)
        j += 1
      }
      acc * math.exp(mx)
    }
  }

  /** Parks-McClellan equiripple low-pass via Remez exchange (reference:
    * src/FIRFilter.jl:64-75 calls DSP.jl's `remez` with exactly these
    * two bands). Type-I (even order, odd taps): H(f) = P(cos 2πf) with
    * P of degree r = order/2, equioscillating between the weighted band
    * targets at r+2 extremal frequencies. See [[Bary]] for the numerical
    * treatment that keeps the exchange solvable at order ~7000.
    *
    * @return taps, or None if the exchange failed to converge
    */
  def remezLowpass(
      order: Int,
      fPass: Double,
      fStop: Double,
      wPass: Double,
      wStop: Double,
      gridDensity: Int = 16,
      maxIter: Int = 40): Option[Array[Double]] =
    remezCore(order, fPass, fStop, wPass, wStop, gridDensity, maxIter, null)
      .map { case (_, interp) => interpToTaps(order, interp) }

  /** The exchange itself. Returns the converged extremal frequencies
    * (for reference scaling to a higher order) plus the converged
    * interpolant; `init` seeds the extremal set (null = the classic
    * proportional per-band guess).
    */
  private def remezCore(
      order: Int,
      fPass: Double,
      fStop: Double,
      wPass: Double,
      wStop: Double,
      gridDensity: Int,
      maxIter: Int,
      init: Array[Double]): Option[(Array[Double], Bary)] = {
    require(order % 2 == 0, s"Type-I design needs an even order: $order")
    val r = order / 2            // polynomial degree in x = cos(2πf)
    val nExt = r + 2             // equioscillation count
    // Degenerate exchange: with fewer than 4 extrema one band gets < 2
    // nodes and the per-band initial guess divides by zero (nStopE-1).
    // Order 2 is below any meaningful equiripple design — report the
    // documented non-convergence instead of throwing.
    if (nExt < 4) return None
    // ---- dense evaluation grid over both bands, Chebyshev-clustered
    // WITHIN each band (uniform in θ with f = lo + (hi-lo)(1-cosθ)/2):
    // the equiripple error's extrema compress toward BOTH edges of each
    // band, and a uniform-in-f grid provably loses the edge-most ripple
    // pair once their spacing (~width·π²/2n² near an edge) falls under
    // the grid step — observed as a deterministic 2-short candidate
    // count at order 1054 that no uniform density up to 64 fixed.
    val nGrid = math.max(gridDensity * nExt, 256)
    val passFrac = math.max(0.05, math.min(0.95,
      fPass / (fPass + (0.5 - fStop))))
    val nPassG = math.max(8, math.round(nGrid * passFrac).toInt)
    val nStopG = math.max(8, nGrid - nPassG)
    val grid = new Array[Double](nPassG + nStopG)
    var g = 0
    while (g < nPassG) { // f in [0, fPass]
      grid(g) = fPass * 0.5 * (1.0 - math.cos(math.Pi * g / (nPassG - 1.0)))
      g += 1
    }
    while (g < nPassG + nStopG) { // f in [fStop, 0.5]
      val j = g - nPassG
      grid(g) = fStop + (0.5 - fStop) * 0.5 *
        (1.0 - math.cos(math.Pi * j / (nStopG - 1.0)))
      g += 1
    }
    val gx = grid.map(f => math.cos(2.0 * math.Pi * f))
    def desired(f: Double): Double = if (f <= fPass) 1.0 else 0.0
    def weight(f: Double): Double = if (f <= fPass) wPass else wStop
    // ---- initial extremal guess: per-band counts proportional to the
    // band's grid share, both edges of both bands included (the classic
    // PM initialization).
    var ext =
      if (init != null) { require(init.length == nExt); init }
      else {
        // Positions uniform in f per band (NOT uniform grid indices: the
        // grid clusters at band edges, and an index-uniform guess would
        // leave band centers unsupported — interpolant blows up 1e19).
        val nPassE = math.max(2, math.min(nExt - 2,
          math.round(nExt * nPassG.toDouble / grid.length).toInt))
        val nStopE = nExt - nPassE
        val pass = Array.tabulate(nPassE)(k => fPass * k / (nPassE - 1.0))
        val stop = Array.tabulate(nStopE)(k =>
          fStop + (0.5 - fStop) * k / (nStopE - 1.0))
        pass ++ stop
      }
    var delta = 0.0
    var converged = false
    var it = 0
    var lastInterp: Bary = null
    while (it < maxIter && !converged) {
      val x = ext.map(f => math.cos(2.0 * math.Pi * f))
      // δ solved from the equioscillation constraint at the LAST extremal
      // point. The interpolant through the first nExt-1 extrema at the
      // δ-offset targets is affine in δ:
      //   P_δ(x) = P_0(x) − δ·Q(x),
      // with P_0 interpolating D_k and Q interpolating σ_k/W_k. Forcing
      // P_δ(x_last) = D_last − σ_last·δ/W_last gives
      //   δ = (P_0(x_last) − D_last) / (Q(x_last) − σ_last/W_last).
      // This replaces the textbook Σw_k-ratio formula, whose alternating
      // sums cancel below double precision once the exchange has a few
      // hundred nodes — the two evaluations here are backward-stable
      // first-form interpolations instead.
      val nn = nExt - 1
      val cx = java.util.Arrays.copyOf(x, nn)
      val d0 = Array.tabulate(nn)(k => desired(ext(k)))
      val q0 = Array.tabulate(nn) { k =>
        (if (k % 2 == 0) 1.0 else -1.0) / weight(ext(k))
      }
      val bary = new Bary(cx, d0)
      val xLast = x(nExt - 1)
      val p0Last = bary(xLast)
      bary.ys = q0
      val qLast = bary(xLast)
      val sgnLast = if ((nExt - 1) % 2 == 0) 1.0 else -1.0
      delta = (p0Last - desired(ext(nExt - 1))) /
        (qLast - sgnLast / weight(ext(nExt - 1)))
      val cy = Array.tabulate(nn) { k =>
        val sign = if (k % 2 == 0) 1.0 else -1.0
        desired(ext(k)) - sign * delta / weight(ext(k))
      }
      bary.ys = cy
      val interp = bary
      lastInterp = interp
      // ---- error on the grid, pick the new alternating extrema.
      // Parallel: each grid point is an independent O(nExt) barycentric
      // evaluation — at order 7222 this pass is ~2·10⁸ log/exp calls and
      // dominates the design wall-clock.
      val err = new Array[Double](grid.length)
      java.util.stream.IntStream.range(0, grid.length).parallel().forEach { gi =>
        val f = grid(gi)
        val e = weight(f) * (desired(f) - interp(gx(gi)))
        // cap overflowed evaluations: ±Inf stays a valid huge candidate
        // for the exchange instead of poisoning signum/products with NaN
        err(gi) = if (e.isInfinity) math.signum(e) * 1e300
                  else if (e.isNaN) 0.0 else e
      }
      // local |err| maxima with alternation (multiple exchange): one best
      // candidate per sign run, then the best nExt-long window.
      // Candidate extrema: local maxima of |err| with the four band-edge
      // grid points always included (the equiripple error attains extrema
      // at band edges even when grid neighbors don't make them local
      // maxima), then alternation enforced by keeping the larger |err| of
      // same-sign neighbors.
      val cand = scala.collection.mutable.ArrayBuffer.empty[Int]
      val edgeIdx = Set(0, nPassG - 1, nPassG, grid.length - 1)
      g = 0
      while (g < grid.length) {
        val e = err(g)
        val isMax = edgeIdx.contains(g) ||
          ((g == 0 || math.abs(e) >= math.abs(err(g - 1))) &&
           (g == grid.length - 1 || math.abs(e) > math.abs(err(g + 1))))
        if (isMax) {
          if (cand.nonEmpty && math.signum(err(cand.last)) == math.signum(e)) {
            if (math.abs(e) > math.abs(err(cand.last))) { cand.remove(cand.length - 1); cand += g }
          } else cand += g
        }
        g += 1
      }
      if (sys.env.contains("GRAFT_REMEZ_DEBUG")) {
        var maxE0 = 0.0
        var gg = 0
        while (gg < grid.length) { maxE0 = math.max(maxE0, math.abs(err(gg))); gg += 1 }
        val passC = cand.count(_ < nPassG)
        System.err.println(f"[remez] it=$it delta=$delta%.6e maxE=$maxE0%.6e cand=${cand.length} need=$nExt passC=$passC")
      }
      if (cand.length < nExt) return None // degenerate — not enough alternations
      // Trim excess candidates by removing ADJACENT pairs of locally
      // smallest |err| (removing two neighbors of opposite sign keeps the
      // remaining sequence alternating and never evicts the global max —
      // the convergence proof requires it to stay). The old end-only trim
      // provably diverges when the cold start yields many excess
      // candidates: dropping 20+ nodes from the band ends evicts the
      // edge extrema and the next interpolant swings to 1e11.
      if ((cand.length - nExt) % 2 == 1) {
        if (math.abs(err(cand.head)) <= math.abs(err(cand.last))) cand.remove(0)
        else cand.remove(cand.length - 1)
      }
      while (cand.length > nExt) {
        var bi = 0; var bv = Double.MaxValue
        var i = 0
        while (i < cand.length - 1) {
          val v = math.max(math.abs(err(cand(i))), math.abs(err(cand(i + 1))))
          if (v < bv) { bv = v; bi = i }
          i += 1
        }
        cand.remove(bi + 1); cand.remove(bi)
      }
      val newExt = Array.tabulate(nExt)(k => grid(cand(k)))
      // convergence: largest grid error within 1e-4 relative of |δ|
      var maxE = 0.0
      g = 0
      while (g < grid.length) { maxE = math.max(maxE, math.abs(err(g))); g += 1 }
      converged = (maxE - math.abs(delta)) <= 1e-4 * math.abs(delta)
      ext = newExt
      it += 1
    }
    if (!converged || lastInterp == null) return None
    Some((ext, lastInterp))
  }

  /** Sample the converged interpolant at order+1 uniform frequencies and
    * inverse real-even DFT to the symmetric impulse response.
    */
  private def interpToTaps(order: Int, interp: Bary): Array[Double] = {
    val r = order / 2
    val n = order + 1 // odd
    val hf = new Array[Double](r + 1)
    java.util.stream.IntStream.rangeClosed(0, r).parallel().forEach { k =>
      hf(k) = interp(math.cos(2.0 * math.Pi * k / n))
    }
    val hh = new Array[Double](n)
    java.util.stream.IntStream.range(0, n).parallel().forEach { i =>
      // h[i] = (1/n) [H(0) + 2 Σ_{k=1}^{r} H(k/n) cos(2πk(i - r)/n)]
      var s = hf(0)
      var k = 1
      while (k <= r) { s += 2.0 * hf(k) * math.cos(2.0 * math.Pi * k * (i - r) / n); k += 1 }
      hh(i) = s / n
    }
    hh
  }

  /** Reference-scaled Remez: converge the exchange at a ladder of
    * doubling orders, seeding each rung's extremal set by per-band
    * index interpolation of the previous rung's converged extrema (the
    * publicly documented technique behind robust Parks-McClellan
    * implementations at degrees in the thousands — a near-optimal
    * starting reference keeps every quantity in the exchange well away
    * from the cancellation regime that kills the cold-started iteration
    * above order ~400).
    */
  def remezLowpassScaled(
      order: Int,
      fPass: Double,
      fStop: Double,
      wPass: Double,
      wStop: Double,
      gridDensity: Int = 16,
      maxIter: Int = 40): Option[Array[Double]] = {
    require(order % 2 == 0, s"Type-I design needs an even order: $order")
    // Ladder: target, target/2, ... down to a cold-startable base.
    val ladder = Iterator.iterate(order)(o => (o / 2 + 1) / 2 * 2)
      .takeWhile(_ > 250).toList.reverse
    if (ladder.isEmpty) // small order: the cold start is already reliable
      return remezCore(order, fPass, fStop, wPass, wStop, gridDensity,
        maxIter, null).map { case (_, i) => interpToTaps(order, i) }
    val base = math.max(4, (ladder.head / 2 + 1) / 2 * 2)
    // One rung: seed from the converged lower-order extrema. The
    // proportional band allocation can be off by a node pair at the
    // doubled order (the seeded interpolant then oscillates 2 short and
    // the exchange degenerates, observed at 528 -> 1054) — retry the
    // rung shifting nodes between the bands before giving up.
    def rung(prevExt: Array[Double], o: Int): Option[(Array[Double], Bary)] = {
      val r = Iterator(0, 1, -1, 2, -2, 3, 4, 5, 6)
        .map { dPass =>
          val seeded = scaleExtrema(prevExt, o / 2 + 2, fPass, fStop, dPass)
          remezCore(o, fPass, fStop, wPass, wStop, gridDensity, maxIter, seeded)
        }
        .collectFirst { case Some(r) => r }
      if (sys.env.contains("GRAFT_REMEZ_DEBUG")) r.foreach { case (e, _) =>
        System.err.println(s"[remez] rung order=$o converged: " +
          s"pass=${e.count(_ <= fPass)} stop=${e.count(_ >= fStop)}")
      }
      r
    }
    // Climb prevOrder -> target; when the direct rung fails (a 2x step is
    // too aggressive for some band geometries — the seeded interpolant
    // swings to O(1/deltaS) mid-band and the error loses alternations),
    // bisect: converge an intermediate order first. Depth-bounded.
    def climb(prevOrder: Int, prevExt: Array[Double], target: Int,
        depth: Int): Option[(Array[Double], Bary)] =
      rung(prevExt, target).orElse {
        if (depth >= 4 || target - prevOrder < 16) {
          System.err.println(s"[remez] ladder rung $prevOrder -> $target failed")
          None
        } else {
          val mid = ((prevOrder + target) / 2 + 1) / 2 * 2
          climb(prevOrder, prevExt, mid, depth + 1).flatMap { case (extMid, _) =>
            climb(mid, extMid, target, depth + 1)
          }
        }
      }
    var cur = remezCore(base, fPass, fStop, wPass, wStop,
      gridDensity, maxIter, null).map { case (e, i) => (base, e, i) }
    for (o <- ladder if cur.isDefined) {
      val (prevOrder, prevExt, _) = cur.get
      cur = climb(prevOrder, prevExt, o, 0).map { case (e, i) => (o, e, i) }
    }
    cur match {
      case Some((o, _, interp)) if o == order => Some(interpToTaps(order, interp))
      case _ => None
    }
  }

  /** Stretch a converged extremal set to `nExt2` nodes: split at the band
    * gap, give each band a node count proportional to its share (≥ 2),
    * and linearly interpolate each band's index-parameterized extremal
    * curve at the new resolution. Band edges stay pinned exactly.
    */
  private def scaleExtrema(ext: Array[Double], nExt2: Int,
      fPass: Double, fStop: Double, dPass: Int = 0): Array[Double] = {
    val pass = ext.filter(_ <= fPass)
    val stop = ext.filter(_ >= fStop)
    val nPass2 = math.max(2, math.min(nExt2 - 2,
      math.round(nExt2 * pass.length.toDouble / ext.length).toInt + dPass))
    val nStop2 = nExt2 - nPass2
    // A band the converged set barely touched (narrow passband at large
    // M) stretches from its bounds instead of a degenerate 0/1-node fit.
    def stretch(src: Array[Double], n2: Int, lo: Double, hi: Double): Array[Double] =
      if (src.length < 2)
        Array.tabulate(n2)(k => lo + (hi - lo) * k / math.max(1, n2 - 1))
      else
        Array.tabulate(n2) { k =>
          val t = k.toDouble * (src.length - 1) / (n2 - 1)
          val i = math.min(src.length - 2, t.toInt)
          val fr = t - i
          src(i) * (1 - fr) + src(i + 1) * fr
        }
    stretch(pass, nPass2, 0.0, fPass) ++ stretch(stop, nStop2, fStop, 0.5)
  }

  private def normalizeDc(h: Array[Double]): Array[Double] = {
    // Normalize to exactly unit DC gain so a constant-price stream yields
    // that price back (the property FirFilterSpec pins down).
    val s = h.sum
    h.map(_ / s)
  }

  /** Design the decimation-by-M anti-aliasing low-pass: Remez equiripple
    * at the Kaiser-estimated order (the reference's method), falling back
    * to the Kaiser-windowed sinc if the exchange does not converge.
    *
    * @return taps (order+1 coefficients, symmetric, unit DC gain)
    */
  def designDecimationFilter(
      m: Int,
      fs: Double = 1.0,
      aPassDb: Double = 0.1,
      aStopDb: Double = 80.0,
      passbandFraction: Double = 0.8): Array[Double] = {
    val sp = specFor(m, fs, aPassDb, aStopDb, passbandFraction)
    // Reference-scaled exchange first (converges at every shipped order,
    // including M=21 -> 1054 and M=144 -> 7222); retry on a denser grid
    // when it degenerates (extrema closer than the grid step collapse
    // into one candidate). Each retry is O(density · nExt²) per
    // iteration, so densities are bounded for very high orders.
    val densities = if (sp.order > 3000) Seq(16, 24) else Seq(16, 32, 64)
    densities.iterator
      .map(gd => remezLowpassScaled(sp.order, sp.fPass, sp.fStop,
        wPass = 1.0 / sp.deltaP, wStop = 1.0 / sp.deltaS, gridDensity = gd))
      .collectFirst { case Some(h) => h }
      .map(normalizeDc)
      .getOrElse(kaiserLowpass(m, fs, aPassDb, aStopDb, passbandFraction))
  }

  /** Frequency response magnitude at normalized frequency f (cycles/sample). */
  def responseAt(h: Array[Double], f: Double): Double = {
    var re = 0.0; var im = 0.0
    var i = 0
    while (i < h.length) {
      val w = 2.0 * math.Pi * f * i
      re += h(i) * math.cos(w)
      im -= h(i) * math.sin(w)
      i += 1
    }
    math.hypot(re, im)
  }

  /** Predefined designs for the reference's supported decimations
    * (FIRFilter.jl:107-115). Lazily cached — design is O(taps²) in the
    * response check but O(taps) to build.
    */
  lazy val m21: Array[Double] = designDecimationFilter(21)
  lazy val m144: Array[Double] = designDecimationFilter(144)

  def predefined(m: Int): Array[Double] = m match {
    case 21 => m21
    case 144 => m144
    case other => designDecimationFilter(other)
  }
}
