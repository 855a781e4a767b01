package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.StructType

/** Distributed sequential scan over a totally-ordered DataFrame.
  *
  * Generalizes the two-pass prefix technique (see [[Ordered]]) to any
  * '''monoid-combinable''' running state: row index, prefix sums,
  * lag/hold-last ("last seen value"), phase accumulators — everything the
  * reference computes with per-tick mutable state
  * (reference: src/TickHotLoopF32.jl:53-83) — without a single-partition
  * window:
  *
  *   1. per-partition fold of `lift`/`combine` (parallel),
  *   2. driver-side exclusive scan over the per-partition states
  *      (one state per partition — tiny),
  *   3. per-partition re-scan emitting output columns, seeded with the
  *      partition's incoming state (parallel).
  *
  * Requirements: `combine` associative with identity `zero`; the input
  * must already be partition-ordered consistently with the desired total
  * order (e.g. produced by `repartitionByRange.sortWithinPartitions` or
  * a freshly-read file source).
  */
object Scan {

  /** @param emit (stateBeforeRow, row) => appended column values */
  def scan[S: scala.reflect.ClassTag](
      df: DataFrame,
      appended: Seq[org.apache.spark.sql.types.StructField],
      zero: S,
      lift: Row => S,
      combine: (S, S) => S,
      emit: (S, Row) => Seq[Any]): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(df.schema.fields ++ appended)
    // localCheckpoint (MEMORY_AND_DISK) + lineage truncation: pass 2 and
    // any task retry read the exact rows pass 1 folded — recomputation
    // through a not-order-stable shuffle could silently disagree with the
    // pass-1 partials for non-commutative combines. Block loss now fails
    // loudly instead of corrupting; ContextCleaner reclaims the blocks
    // once the returned DataFrame is unreferenced.
    val rdd = df.rdd.localCheckpoint()
    val partials: Array[(Int, S)] = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = zero; it.foreach(r => s = combine(s, lift(r))); Iterator((pid, s))
      }
      .collect()
    val byPid = partials.sortBy(_._1).map(_._2)
    val offsets = byPid.scanLeft(zero)(combine)
    val bc = spark.sparkContext.broadcast(offsets)
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = bc.value(pid)
      it.map { r =>
        val extra = emit(acc, r)
        acc = combine(acc, lift(r))
        Row.fromSeq(r.toSeq ++ extra)
      }
    }
    spark.createDataFrame(out, schema)
  }
}
