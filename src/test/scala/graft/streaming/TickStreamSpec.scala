package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.config.SignalConfig

class TickStreamSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = SignalConfig(minPrice = 39000, maxPrice = 44000,
    maxJump = 50, winsorizeDeltaThreshold = 10, encoderType = "derivative",
    tickDerivativeImagScale = 2.0f)

  private def mkTicks(n: Int): Seq[TickIn] = {
    val rnd = new scala.util.Random(13)
    (1 to n).map(i => TickIn(i.toLong, 7L, 39000 + rnd.nextInt(5200) - 100,
      if (i == 1) 0 else rnd.nextInt(41) - 20))
  }

  test("streaming hot loop equals the sequential fold across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val ticks = mkTicks(600)
    val expected = HotLoopStep.run(ticks, cfg)

    val input = MemoryStream[TickIn]
    val out = TickStream.hotLoopStream(input.toDS(), cfg)
    val ckpt = Files.createTempDirectory("ckpt").toString
    val query = out.writeStream
      .format("memory").queryName("hotloop_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      // three micro-batches -> state must carry across
      input.addData(ticks.take(200): _*); query.processAllAvailable()
      input.addData(ticks.slice(200, 400): _*); query.processAllAvailable()
      input.addData(ticks.drop(400): _*); query.processAllAvailable()
      val got = spark.table("hotloop_out").as[TickOut]
        .collect().sortBy(_.tick_idx).toSeq
      assert(got == expected)
    } finally query.stop()
  }

  test("streaming f32 hot loop tracks the batch double pipeline to 1e-5") {
    val ticks = mkTicks(500)
    val seq = HotLoopStep.run(ticks, cfg)
    val batch = graft.operators.TickPipeline.hotLoop(
      ticks.toDF(), cfg)
      .select($"tick_idx", $"signal_re", $"signal_im", $"normalization", $"status_flag")
      .as[(Long, Double, Double, Double, Int)].collect().sortBy(_._1)
    seq.zip(batch).foreach { case (f32, (idx, re, im, norm, flag)) =>
      assert(f32.tick_idx == idx)
      assert(f32.status_flag.toInt == flag, s"flag at $idx")
      assert(math.abs(f32.normalization - norm) <= 1e-4 * math.abs(norm) + 1e-6, s"norm at $idx")
      assert(math.abs(f32.signal_re - re) <= 1e-4 * math.abs(re) + 1e-5, s"re at $idx")
      assert(math.abs(f32.signal_im - im) <= 1e-4 * math.abs(im) + 1e-5, s"im at $idx")
    }
  }

  test("broadcast fan-out: priority lossless, others drop and count") {
    implicit val sqlCtx = spark.sqlContext
    val ticks = mkTicks(300)
    val input = MemoryStream[TickIn]
    val enriched = TickStream.hotLoopStream(input.toDS(), cfg)
    val prio = new TickStream.ConsumerStats("prio", TickStream.Priority, 64)
    val mon = new TickStream.ConsumerStats("mon", TickStream.Monitoring, 100)
    val ckpt = Files.createTempDirectory("ckpt2").toString
    val query = TickStream.broadcastTo(enriched, Seq(prio, mon), ckpt)
    try {
      input.addData(ticks: _*)
      query.processAllAvailable()
      assert(prio.messagesSent.get() == 300 && prio.messagesDropped.get() == 0)
      assert(mon.messagesSent.get() == 100)
      assert(mon.messagesDropped.get() == 200) // buffer 100, drop the rest
      assert(prio.queue.size == 300 && mon.queue.size == 100)
    } finally query.stop()
  }

  test("event-time windowed aggregation with watermark (Q18)") {
    val events = Seq(
      ("2024-01-01 00:00:10", "click", 1.0), ("2024-01-01 00:00:50", "click", 2.0),
      ("2024-01-01 00:01:10", "view", 3.0), ("2024-01-01 00:02:05", "click", 4.0))
      .toDF("ts_s", "event_type", "value")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val out = TickStream.windowedEventCounts(events, "1 minute", "10 minutes")
      .select($"event_type", $"events", $"sum_value")
      .as[(String, Long, Double)].collect().toSet
    // 00:00:10 and 00:00:50 share the [00:00, 00:01) window
    assert(out == Set(("click", 2L, 3.0), ("view", 1L, 3.0), ("click", 1L, 4.0)))
  }
}
