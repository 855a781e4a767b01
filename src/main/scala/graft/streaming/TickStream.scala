package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.config.SignalConfig

/** Structured Streaming variant of the tick pipeline (SURVEY.md §2B
  * Q18-Q20; reference: the channel-based pipeline of
  * src/PipelineOrchestrator.jl + src/TripleSplitSystem.jl).
  *
  * The reference is a single sequential stream; the streaming hot loop
  * preserves exactly that semantics with `flatMapGroupsWithState` on a
  * single key (state = [[HotLoopState]], the same step function as the
  * reference-parity tests). Micro-batches replace the channel; for
  * multi-symbol scale-out, key by instrument instead — each group is an
  * independent sequential stream.
  */
object TickStream {

  /** Streaming file source -> parsed ticks. The text source preserves
    * per-file order; `volume`-expansion and tick indexing happen inside
    * the stateful step so they survive across micro-batches.
    */
  def readTickStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.option("maxFilesPerTrigger", 1).text(dir)

  /** Stateful hot loop over a parsed tick stream. Input rows must carry
    * (tick_idx, timestamp, raw_price, price_delta); rows within a
    * micro-batch are sorted by tick_idx before folding.
    */
  def hotLoopStream(ticks: Dataset[TickIn], cfg: SignalConfig): Dataset[TickOut] = {
    import ticks.sparkSession.implicits._
    ticks
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[HotLoopState, TickOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, it, state: GroupState[HotLoopState]) =>
          var s = state.getOption.getOrElse(HotLoopState())
          val outs = it.toSeq.sortBy(_.tick_idx).map { t =>
            val (s2, o) = HotLoopStep.step(s, t, cfg)
            s = s2
            o
          }
          state.update(s)
          outs.iterator
      }
  }

  /** Consumer types (reference: src/TripleSplitSystem.jl:16-20). */
  sealed trait ConsumerType
  case object Priority extends ConsumerType   // lossless, backpressures
  case object Monitoring extends ConsumerType // drop-on-full
  case object Analytics extends ConsumerType  // drop-on-full

  /** Per-consumer delivery stats (reference: TripleSplitSystem.jl:272-305). */
  final class ConsumerStats(val name: String, val kind: ConsumerType, val bufferSize: Int) {
    val messagesSent = new AtomicLong
    val messagesDropped = new AtomicLong
    val queue = new ConcurrentLinkedQueue[TickOut]()
    def fillRatio: Double =
      if (bufferSize == 0) 0.0 else queue.size.toDouble / bufferSize
  }

  /** Multi-consumer broadcast with the reference's priority/drop policy:
    * PRIORITY consumers always receive every row (in Spark, a normal
    * sink — backpressure is intrinsic to micro-batching); MONITORING /
    * ANALYTICS consumers drop (and count) rows beyond their buffer.
    * Implemented as one `foreachBatch` fan-out so all consumers observe
    * the same micro-batch — mirroring broadcast_to_all!
    * (TripleSplitSystem.jl:172-259).
    */
  def broadcastTo(
      enriched: Dataset[TickOut],
      consumers: Seq[ConsumerStats],
      checkpoint: String,
      deliver: (ConsumerStats, Seq[TickOut]) => Unit = enqueueDeliver): StreamingQuery =
    enriched.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: Dataset[TickOut], _: Long) =>
        val rows = batch.orderBy(col("tick_idx")).collect().toSeq
        consumers.foreach {
          case c if c.kind == Priority =>
            deliver(c, rows)
            c.messagesSent.addAndGet(rows.size)
          case c =>
            val room = math.max(0, c.bufferSize - c.queue.size)
            val (take, drop) = rows.splitAt(room)
            deliver(c, take)
            c.messagesSent.addAndGet(take.size)
            c.messagesDropped.addAndGet(drop.size)
        }
      }
      .start()

  private def enqueueDeliver(c: ConsumerStats, rows: Seq[TickOut]): Unit =
    rows.foreach(c.queue.add)

  /** Event-time windowed aggregation with watermark over the events table
    * shape (Q18): tumbling count + sum per window and type.
    */
  def windowedEventCounts(events: DataFrame, window: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("events"), sum("value").as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("events"), col("sum_value"))
}
