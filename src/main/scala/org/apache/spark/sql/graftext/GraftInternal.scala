package org.apache.spark.sql.graftext

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Bridge to `SparkSession.internalCreateDataFrame` (scoped
  * `private[sql]` in Spark 4), letting graft's scan operators hand
  * `RDD[InternalRow]` back to Catalyst without a Row round-trip — the
  * same pattern Spark's own data sources use. Living inside the
  * `org.apache.spark.sql` namespace is the standard extension-library
  * technique (see [[GraftColumns]]).
  */
object GraftInternal {
  def internalCreateDataFrame(
      spark: SparkSession,
      rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
