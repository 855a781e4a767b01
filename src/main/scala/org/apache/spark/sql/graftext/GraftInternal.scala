package org.apache.spark.sql.graftext

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, ExperimentalMethods, SparkSession}
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

  /** [[internalCreateDataFrame]] variant that DECLARES the rows' true
    * physical layout: globally range-partitioned and sorted ascending by
    * `sortCols` (what `repartitionByRange(...).sortWithinPartitions(...)`
    * + an order-preserving mapPartitions produces). The plan enters
    * Catalyst as a [[LogicalRDD]] carrying `RangePartitioning` +
    * `SortOrder` instead of `UnknownPartitioning`, so EnsureRequirements /
    * RemoveRedundantSorts can elide a downstream `orderBy` on the same
    * keys — the Exchange+Sort that otherwise re-sorts already-ordered
    * scan output (optimization guide §2.4: remove shuffles outright when
    * the data is already partitioned/ordered as needed).
    *
    * CONTRACT (caller-asserted, not checked): within each partition rows
    * are non-descending in `sortCols`, and every row of partition i
    * orders <= every row of partition i+1. Declaring an untrue layout
    * silently corrupts downstream sorts/joins.
    */
  def internalCreateDataFrameOrdered(
      spark: SparkSession,
      rdd: RDD[InternalRow],
      schema: StructType,
      sortCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, SortOrder}
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    import org.apache.spark.sql.execution.LogicalRDD
    val session = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val attrs = schema.fields.toSeq.map(f =>
      AttributeReference(f.name, f.dataType, f.nullable, f.metadata)())
    val byName = attrs.map(a => a.name -> a).toMap
    val order = sortCols.map(c => SortOrder(byName(c), Ascending))
    val part = RangePartitioning(order, rdd.getNumPartitions)
    org.apache.spark.sql.classic.Dataset.ofRows(session,
      LogicalRDD(attrs, rdd, part, order, isStreaming = false, None)(session))
  }

  /** `Dataset.ofRows` (`private[sql]`): wrap a hand-built logical plan —
    * e.g. graft's [[graft.plans.TopKPerKeyPlan]] custom operator — as a
    * public DataFrame.
    */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The session's [[ExperimentalMethods]] (planner strategy / optimizer
    * rule injection point for an already-built session).
    */
  def experimental(spark: SparkSession): ExperimentalMethods =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental

  /** `NormalizeFloatingNumbers.normalize` (`private[sql]`): canonicalize
    * -0.0/0.0 and NaN bit patterns in an expression used as a grouping
    * key. Catalyst applies this automatically to Aggregate/Window/Join
    * keys but NOT to custom logical nodes, so graft's own key-clustered
    * operators (TopKPerKey) must normalize their keys themselves or
    * float keys split groups the built-in operators would merge.
    * Self-guarding: returns the expression unchanged when its type has
    * no normalization to do.
    */
  def normalizeFloatingNumbers(
      e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)
}
