package graft.functions

/** Anti-aliasing decimation FIR design (reference: src/FIRFilter.jl:35-86).
  *
  * The reference designs an equiripple low-pass with Remez exchange at
  * the Kaiser-estimated order (M=21 → order 1054, 1055 taps by its own Kaiser estimate; the source comment citing 1087 taps overstates it). This port
  * keeps the identical specification surface — passband 80% of the new
  * Nyquist, 0.1 dB passband ripple, 80 dB stopband, Kaiser order
  * estimate forced even — but uses a Kaiser-windowed sinc design instead
  * of Remez exchange: at order ~1086 the barycentric Remez solve is
  * numerically fragile, while the windowed design meets the same dB spec
  * (verified by the frequency-response test in FirFilterSpec) and is a
  * pure, reproducible driver-side computation. Design runs once on the
  * driver; coefficients ship to executors as a literal array.
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

  /** Design the decimation-by-M anti-aliasing low-pass.
    *
    * @return taps (order+1 coefficients, symmetric, unit DC gain)
    */
  def designDecimationFilter(
      m: Int,
      fs: Double = 1.0,
      aPassDb: Double = 0.1,
      aStopDb: Double = 80.0,
      passbandFraction: Double = 0.8): Array[Double] = {
    require(m >= 2, s"decimation factor must be >= 2: $m")
    val fNyqNew = fs / (2.0 * m)
    val fPass = passbandFraction * fNyqNew
    val fStop = fNyqNew
    val deltaP = (math.pow(10, aPassDb / 20) - 1) / (math.pow(10, aPassDb / 20) + 1)
    val deltaS = math.pow(10, -aStopDb / 20)
    val atten = -20.0 * math.log10(math.min(deltaP, deltaS))
    val order = kaiserOrder(atten, (fStop - fPass) / fs)
    val beta =
      if (atten > 50) 0.1102 * (atten - 8.7)
      else if (atten >= 21) 0.5842 * math.pow(atten - 21, 0.4) + 0.07886 * (atten - 21)
      else 0.0
    val n = order + 1
    val fc = (fPass + fStop) / 2.0 / fs // normalized cutoff (cycles/sample)
    val mid = order / 2.0
    val i0b = besselI0(beta)
    val h = Array.tabulate(n) { i =>
      val x = i - mid
      val sinc = if (x == 0.0) 2.0 * fc else math.sin(2.0 * math.Pi * fc * x) / (math.Pi * x)
      val w = besselI0(beta * math.sqrt(math.max(0.0, 1.0 - (x / mid) * (x / mid)))) / i0b
      sinc * w
    }
    // Normalize to exactly unit DC gain so a constant-price stream yields
    // that price back (the property FirFilterSpec pins down).
    val s = h.sum
    h.map(_ / s)
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
