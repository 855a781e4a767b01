package graft.model

import org.apache.spark.sql.types._

/** Status-flag bitmask, mirroring the reference's constants
  * (reference: src/BroadcastMessage.jl:68-72).
  */
object Flags {
  val OK: Int        = 0x00
  val MALFORMED: Int = 0x01
  val HOLDLAST: Int  = 0x02
  val CLIPPED: Int   = 0x04
  val AGC_LIMIT: Int = 0x08
}

/** Tick-level record, the engine's fundamental row type
  * (reference: src/BroadcastMessage.jl:41-49). The reference's
  * ComplexF32 `complex_signal` is flattened to two float columns —
  * Spark has no complex type and flat columns are columnar-friendly.
  */
case class TickRecord(
    tick_idx: Long,
    timestamp: Long, // first 8 ASCII chars packed 8 bits/char (VolumeExpansion.jl:46-59)
    raw_price: Int,
    price_delta: Int,
    normalization: Float,
    signal_re: Float,
    signal_im: Float,
    status_flag: Byte
)

/** Bar-level record, populated once per `ticks_per_bar` ticks
  * (reference: src/BroadcastMessage.jl:51-64).
  */
case class BarRecord(
    bar_idx: Long,
    bar_ticks: Int,
    bar_volume: Int,
    bar_open_raw: Int,
    bar_high_raw: Int,
    bar_low_raw: Int,
    bar_close_raw: Int,
    bar_average_raw: Int,
    bar_price_delta: Int,
    bar_signal_re: Float,
    bar_signal_im: Float,
    bar_normalization: Float,
    bar_flags: Byte,
    bar_end_timestamp: Long
)

object Schemas {
  /** Raw tick-file line schema after parsing (T2):
    * "yyyymmdd hhmmss uuuuuuu;bid;ask;last;volume".
    */
  val parsedLine: StructType = StructType(Seq(
    StructField("line_idx", LongType, nullable = false),
    StructField("ts_str", StringType, nullable = false),
    StructField("bid", IntegerType, nullable = false),
    StructField("ask", IntegerType, nullable = false),
    StructField("last", IntegerType, nullable = false),
    StructField("volume", IntegerType, nullable = false)
  ))

  val tick: StructType = StructType(Seq(
    StructField("tick_idx", LongType, nullable = false),
    StructField("timestamp", LongType, nullable = false),
    StructField("raw_price", IntegerType, nullable = false),
    StructField("price_delta", IntegerType, nullable = false),
    StructField("normalization", FloatType, nullable = false),
    StructField("signal_re", FloatType, nullable = false),
    StructField("signal_im", FloatType, nullable = false),
    StructField("status_flag", ByteType, nullable = false)
  ))
}
