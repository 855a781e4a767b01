package graft.operators

import org.apache.spark.sql.functions.lit

import graft.SparkSpec
import graft.config.BarConfig

/** Bar processor semantics + OHLC invariants (reference:
  * src/BarProcessor.jl; invariants scripts/validate_bar_processing.jl:63-85).
  */
class BarsSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = BarConfig(enabled = true, ticksPerBar = 21,
    normalizationWindowBars = 120, barMethod = "boxcar")

  private def mkTicks(prices: Seq[Int]) =
    prices.zipWithIndex.map { case (p, i) => (i + 1L, p) }
      .toDF("tick_idx", "raw_price").withColumn("timestamp", lit(7L))

  test("floor(N/B) complete bars; partial bar dropped") {
    val bars = TickPipeline.bars(mkTicks((1 to 50).map(40000 + _)), cfg)
    assert(bars.count() == 2) // 50 ticks / 21 -> 2 complete + 8-tick partial
  }

  test("OHLC, boxcar average, first-bar delta and derivative quirk") {
    val prices = (1 to 42).map(i => 40000 + (i * 17 % 50))
    val out = TickPipeline.bars(mkTicks(prices), cfg)
      .orderBy("bar_idx")
      .select($"bar_idx", $"bar_open_raw", $"bar_high_raw", $"bar_low_raw",
        $"bar_close_raw", $"bar_average_raw", $"bar_price_delta",
        $"bar_signal_re", $"bar_signal_im", $"bar_normalization")
      .collect()
    val b1 = prices.take(21); val b2 = prices.slice(21, 42)
    assert(out(0).getInt(1) == b1.head && out(0).getInt(4) == b1.last)
    assert(out(0).getInt(2) == b1.max && out(0).getInt(3) == b1.min)
    val avg1 = math.floor((b1.max + b1.min + b1.last) / 3.0 + 0.5).toInt
    val avg2 = math.floor((b2.max + b2.min + b2.last) / 3.0 + 0.5).toInt
    assert(out(0).getInt(5) == avg1 && out(1).getInt(5) == avg2)
    assert(out(0).getInt(6) == 0) // first bar delta
    assert(out(1).getInt(6) == avg2 - avg1)
    // norm never recalculated before bar 120 -> 1.0
    assert(out(0).getDouble(9) == 1.0)
    // first bar derivative quirk: prev_normalized = 0 -> huge imaginary
    assert(out(0).getDouble(8) == avg1.toDouble / 1.0 * 4.0)
  }

  test("property: OHLC invariants hold for seeded random price streams") {
    val rnd = new scala.util.Random(42)
    (1 to 10).foreach { _ =>
      val prices = List.fill(63)(39000 + rnd.nextInt(5001))
      val rows = TickPipeline.bars(mkTicks(prices), cfg)
        .select($"bar_high_raw", $"bar_low_raw", $"bar_open_raw", $"bar_close_raw")
        .as[(Int, Int, Int, Int)].collect()
      assert(rows.length == 3)
      rows.foreach { case (h, l, o, c) =>
        assert(h >= l && h >= o && h >= c && l <= o && l <= c)
      }
    }
  }

  test("normalization recalc fires exactly every window-th bar") {
    val small = cfg.copy(ticksPerBar = 2, normalizationWindowBars = 3)
    // 12 ticks -> 6 bars; recalc at bars 3 and 6
    val prices = Seq(100, 110, 100, 120, 100, 130, 100, 140, 100, 150, 100, 160)
      .map(_ + 40000)
    val out = TickPipeline.bars(mkTicks(prices), small)
      .orderBy("bar_idx").select($"bar_normalization").as[Double].collect()
    assert(out(0) == 1.0 && out(1) == 1.0)          // before first recalc
    assert(out(2) != 1.0)                            // recalc at bar 3
    assert(out(3) == out(2) && out(4) == out(2))     // cached until bar 6
    assert(out(5) != out(2))                         // recalc at bar 6
  }
}
