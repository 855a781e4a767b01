package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Storage-layout helpers for the 100 TB deployment shape: bucketed
  * tables make repeated equi-joins/aggregations on the bucket key
  * shuffle-free (both sides pre-hashed into the same bucket files), and
  * partitioned directories give coarse partition pruning before a single
  * row is read. Local tests drive the same code paths Spark uses on a
  * real warehouse — the layout metadata, not the cluster, is what
  * removes the exchanges.
  */
object Warehouse {

  /** Write `df` as a bucketed (and per-bucket sorted) external parquet
    * table. Joins and aggregations keyed on `bucketCols` between tables
    * bucketed with the SAME bucket count plan without a shuffle
    * (`WarehouseSpec` pins the no-Exchange plan).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      nBuckets: Int,
      bucketCols: Seq[String],
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Write `df` as directory-partitioned parquet: one directory per
    * distinct `partitionCols` value; reads with a predicate on those
    * columns prune whole directories at planning time.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Read a partitioned dataset written by [[writePartitioned]]. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Compact a small-file dataset into ~`targetRowsPerFile`-row files —
    * the operational fix for the classic 100 TB failure mode where
    * thousands of streaming micro-batch or over-parallel writes leave
    * millions of KB-scale files and every subsequent scan pays a
    * per-file open. One count (cheap: parquet footer metadata), one
    * round-robin repartition to the computed file budget, one write;
    * `maxRecordsPerFile` caps stragglers when rows skew. Returns
    * (filesBefore, filesAfter).
    */
  def compact(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      targetRowsPerFile: Long): (Int, Int) = {
    def parquetFiles(p: String): Int =
      graft.util.Fs.listFiles(spark, p).count(_.endsWith(".parquet"))
    val before = parquetFiles(inPath)
    val df = spark.read.parquet(inPath)
    val n = df.count()
    val nFiles = math.max(1, ((n + targetRowsPerFile - 1) / targetRowsPerFile).toInt)
    df.repartition(nFiles)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", targetRowsPerFile)
      .parquet(outPath)
    (before, parquetFiles(outPath))
  }

  /** Morton (Z-order) value of two columns, each linearly quantized to
    * 16 bits over its [lo, hi] range and bit-interleaved into one
    * 32-bit key. Sorting by this key clusters BOTH dimensions at once,
    * which is what makes multi-dimensional min/max data skipping work:
    * a layout sorted by one column alone has file-level bounds spanning
    * the full domain of every other column, so a 2-D predicate can
    * prune on one dimension only.
    */
  def zValue(a: org.apache.spark.sql.Column, aLo: Long, aHi: Long,
             b: org.apache.spark.sql.Column, bLo: Long, bHi: Long): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    def scale16(c: org.apache.spark.sql.Column, lo: Long, hi: Long) = {
      val span = math.max(1L, hi - lo)
      least(lit(65535L), greatest(lit(0L),
        (c.cast("long") - lit(lo)) * 65535L / lit(span)))
    }
    val x = scale16(a, aLo, aHi)
    val y = scale16(b, bLo, bHi)
    (0 until 16).map { i =>
      (shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` Z-order-clustered on two long-valued columns: range
    * bounds come from one tiny min/max aggregate, rows are
    * range-partitioned AND sorted by the interleaved Morton key, so
    * each output file owns a compact 2-D bounding box. Parquet's
    * per-file/row-group min-max stats then prune 2-D predicates on
    * EITHER OR BOTH dimensions — the layout is the index. Scale shape:
    * one agg + one range exchange + a local sort; no driver data path.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      colA: String,
      colB: String,
      nFiles: Int): Unit = {
    import org.apache.spark.sql.functions._
    val r = df.agg(
      min(col(colA).cast("long")), max(col(colA).cast("long")),
      min(col(colB).cast("long")), max(col(colB).cast("long"))).head()
    val z = zValue(col(colA), r.getLong(0), r.getLong(1),
      col(colB), r.getLong(2), r.getLong(3))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
