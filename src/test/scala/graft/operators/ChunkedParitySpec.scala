package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.config.SignalConfig

/** The scalable (prefix-scan) pipeline variants must agree row-for-row,
  * bit-for-bit with the window formulations the DuckDB oracle mirrors.
  */
class ChunkedParitySpec extends SparkSpec {
  import spark.implicits._

  private val cfg = SignalConfig(minPrice = 39000, maxPrice = 44000,
    maxJump = 50, winsorizeDeltaThreshold = 10,
    tickDerivativeImagScale = 2.0f, cpmModulationIndex = 0.5f)

  // Deterministic pseudo-random tick stream with holds, clips, replicas,
  // and enough rows to cross several 144-tick bars and partitions.
  private lazy val lines: DataFrame = {
    val rnd = new scala.util.Random(7)
    (1 to 800).map { i =>
      val price = 39000 + rnd.nextInt(5200) - 100
      (i.toLong, f"2025031$i%01d 070000 0000000".take(23), price, 1 + rnd.nextInt(3))
    }.toDF("line_idx", "ts_str", "last", "volume").repartition(5)
  }

  private def collectAll(df: DataFrame): Seq[Seq[Any]] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect().map(_.toSeq.toVector).toVector
      .sortBy(_.mkString("|"))
  }

  test("expandVolumeChunked == expandVolume") {
    val a = collectAll(TickPipeline.expandVolume(lines))
    val b = collectAll(TickPipeline.expandVolumeChunked(lines))
    assert(a == b)
  }

  Seq("derivative", "hexad16", "cpm", "amc").foreach { enc =>
    test(s"hotLoopChunked == hotLoop for $enc") {
      val ticks = TickPipeline.expandVolume(lines)
        .select("tick_idx", "timestamp", "raw_price", "price_delta")
      val a = collectAll(TickPipeline.hotLoop(ticks, cfg.copy(encoderType = enc)))
      val b = collectAll(TickPipeline.hotLoopChunked(ticks, cfg.copy(encoderType = enc)))
      assert(a == b)
    }
  }

  test("hotLoopChunked handles the no-valid-ticks edge") {
    val ticks = (1L to 5L).map(i => (i, 10, 0))
      .toDF("tick_idx", "raw_price", "price_delta")
    val out = TickPipeline.hotLoopChunked(ticks, cfg)
      .select($"signal_re", $"status_flag").as[(Double, Int)].collect()
    assert(out.forall(r => r._1 == 0.0 && r._2 == 0)) // all pre, FLAG_OK
  }
}
