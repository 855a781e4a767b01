package graft.functions

import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSpec
import graft.config.BarConfig
import graft.operators.TickPipeline

/** FIR design spec targets + distributed convolution semantics
  * (reference: src/FIRFilter.jl:35-86, src/BarProcessor.jl:345-358).
  */
class FirFilterSpec extends SparkSpec {
  import spark.implicits._

  test("M=21 design hits the reference's Kaiser order formula: 1055 taps") {
    // The reference's comment claims "order ≈ 1086 (1087 taps)"
    // (FIRFilter.jl:69) but its own Kaiser estimate — ceil((80-8) /
    // (2.285*2π*0.2/(2*21))) = 1054, forced even — yields 1055 taps; we
    // reproduce the formula, not the comment.
    assert(FirFilter.m21.length == 1055)
  }

  test("unit DC gain, symmetric (linear phase)") {
    val h = FirFilter.m21
    assert(math.abs(h.sum - 1.0) < 1e-12)
    (0 until h.length / 2).foreach(i =>
      assert(math.abs(h(i) - h(h.length - 1 - i)) < 1e-15))
  }

  private def checkSpec(h: Array[Double], m: Int, label: String): Unit = {
    val fNyqNew = 1.0 / (2.0 * m)
    // passband samples
    Seq(0.0, 0.3, 0.6, 0.79).map(_ * 0.8 * fNyqNew).foreach { f =>
      val db = 20 * math.log10(FirFilter.responseAt(h, f))
      assert(math.abs(db) <= 0.1, s"$label passband $f -> $db dB")
    }
    // stopband samples (from the new Nyquist up)
    Seq(1.0, 1.5, 3.0, 8.0).map(_ * fNyqNew).filter(_ <= 0.5).foreach { f =>
      val db = 20 * math.log10(FirFilter.responseAt(h, f))
      assert(db <= -78.0, s"$label stopband $f -> $db dB")
    }
  }

  test("meets the dB spec: <=0.1 dB passband ripple, >=78 dB stopband") {
    checkSpec(FirFilter.m21, 21, "m21")
  }

  test("T29: shipped AND Kaiser designs meet the dB spec at M=21 and M=144") {
    // The shipped predefined() design is the reference's design method —
    // Remez equiripple at the Kaiser-estimated order (reference
    // FIRFilter.jl:64-75 via DSP.jl remez) — with the Kaiser windowed
    // sinc as documented fallback only. Both paths are held to the same
    // dB spec at both reference decimations.
    checkSpec(FirFilter.m21, 21, "shipped m21")
    checkSpec(FirFilter.kaiserLowpass(21), 21, "kaiser m21")
    checkSpec(FirFilter.m144, 144, "shipped m144")
    checkSpec(FirFilter.kaiserLowpass(144), 144, "kaiser m144")
  }

  test("T29: shipped M=21 and M=144 are TRUE equiripple, not the Kaiser fallback") {
    // Equiripple at the (conservative) Kaiser-estimated order lands
    // ~-102 dB stopband; the windowed sinc at the same order only
    // reaches ~-81 dB. A stopband beyond -95 dB at full tap count is
    // therefore proof the exchange converged at the reference's own
    // orders (1054 / 7222) — the round-4 parity gap, now closed by the
    // reference-scaled exchange on the Chebyshev-clustered grid.
    for ((h, m, taps) <- Seq((FirFilter.m21, 21, 1055), (FirFilter.m144, 144, 7223))) {
      assert(h.length == taps)
      val fNyqNew = 1.0 / (2.0 * m)
      val stopDb = Seq(1.0, 1.5, 3.0, 8.0).map(_ * fNyqNew).filter(_ <= 0.5)
        .map(f => 20 * math.log10(FirFilter.responseAt(h, f))).max
      assert(stopDb <= -95.0, s"shipped m$m stopband only $stopDb dB — " +
        "Kaiser fallback shipped; the exchange regressed")
    }
  }

  test("T29: Remez exchange reaches true equiripple at a moderate order (M=4)") {
    // M=4 -> order 202: the exchange converges and ships; the result is
    // a genuine equiripple (stopband attenuation well beyond the
    // windowed design's, here < -100 dB vs Kaiser's -87 dB).
    val h = FirFilter.designDecimationFilter(4)
    checkSpec(h, 4, "remez m4")
    val fNyqNew = 1.0 / 8.0
    val stopDb = Seq(1.0, 1.5, 2.0, 3.0).map(_ * fNyqNew).filter(_ <= 0.5)
      .map(f => 20 * math.log10(FirFilter.responseAt(h, f))).max
    assert(stopDb <= -95.0, s"equiripple stopband only $stopDb dB — " +
      "looks like the Kaiser fallback shipped at M=4")
  }

  test("T29: degenerate exchange (order 2) returns None, not a crash") {
    // order 2 -> nExt = 3: one band would get a single extremum and the
    // per-band initial guess would divide by zero without the guard.
    assert(FirFilter.remezLowpass(2, 0.1, 0.2, 1.0, 1.0).isEmpty)
  }

  test("constant price stream convolves to that price (after warm-up)") {
    val n = 21
    val ticks = (1 to 2200).map(i => (i.toLong, 41000))
      .toDF("tick_idx", "raw_price").withColumn("timestamp", lit(0L))
    val lastBar = 2200 / n // firBarAverages alone also scatters past the
    // data's end; bars() filters those via the cnt==n join, so cap here.
    val avgs = TickPipeline.firBarAverages(ticks, n)
      .where(col("bar_idx") <= lastBar)
      .orderBy("bar_idx").select($"bar_idx", $"bar_average_raw")
      .as[(Long, Int)].collect()
    // After the 1055-tap buffer fills (bar >= ceil(1055/21)=51), the
    // unit-DC-gain filter must reproduce the constant price exactly.
    avgs.filter(_._1 >= 51).foreach { case (b, a) =>
      assert(a == 41000, s"bar $b -> $a")
    }
    // Early bars see the zero padding -> strictly smaller output.
    assert(avgs.head._2 < 41000)
  }

  test("FIR bars integrate into the bar chain") {
    val cfg = BarConfig(enabled = true, ticksPerBar = 21, barMethod = "FIR")
    val prices = (1 to 130).map(i => 41000 + (i * 13 % 40))
    val ticks = prices.zipWithIndex.map { case (p, i) => (i + 1L, p) }
      .toDF("tick_idx", "raw_price").withColumn("timestamp", lit(0L))
    val out = TickPipeline.bars(ticks, cfg)
    assert(out.count() == 6) // 130/21 complete bars
    val row = out.orderBy("bar_idx").select($"bar_price_delta").as[Int].head()
    assert(row == 0) // first bar delta
  }
}
