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
}
