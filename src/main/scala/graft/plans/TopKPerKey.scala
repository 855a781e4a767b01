package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftext.GraftInternal

/** Whole-operator Catalyst extension: top-k rows per key under a total
  * sort order, planned as a custom logical node → strategy → physical
  * operator pair (the third extension tier, beyond codegen'd
  * [[graft.functions.VectorExpressions expressions]] and the
  * [[GraftExtensions optimizer rules]]).
  *
  * WHY an operator and not `row_number() OVER (...) <= k`: WindowExec
  * must globally sort every row of every key group within each
  * partition and buffer whole groups; at 100 TB the per-partition sort
  * is O(n log n) in ALL rows and the shuffle carries ALL rows. This
  * operator keeps a k-bounded binary heap per key: O(n log k) time,
  * O(#keys · k) memory, and — because the strategy plans a PARTIAL pass
  * below the exchange (the hash-aggregate discipline applied to top-k)
  * — the shuffle carries at most #partitions · #keys · k rows instead
  * of n. The rank window is what the 10-queries-a-day user writes; this
  * is what the nightly 100 TB job should run.
  *
  * Semantics: rows whose rank under `order` (a TOTAL order — callers
  * must include a tiebreak column, or results are nondeterministic like
  * any rank-over-ties) is ≤ k within their key group, emitted in
  * arbitrary order with unchanged schema. Exactly the rows the window
  * formulation keeps, proven by the q66 oracle and the parity spec.
  */
case class TopKPerKeyPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"top-k needs k >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Plans [[TopKPerKeyPlan]] as partial-exec → (EnsureRequirements
  * inserts the key shuffle) → final-exec, exactly how partial/final
  * hash aggregation is planned.
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      val flushKeys = org.apache.spark.sql.internal.SQLConf.get
        .getConfString(TopKPerKeyExec.PartialFlushKeysConf,
          TopKPerKeyExec.PartialFlushKeys.toString).toInt
      require(flushKeys >= 1,
        s"${TopKPerKeyExec.PartialFlushKeysConf} must be >= 1, got $flushKeys")
      TopKPerKeyExec(keys, order, k, partial = false, flushKeys,
        TopKPerKeyExec(keys, order, k, partial = true, flushKeys,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap per-key top-k over `child`'s rows. The partial instance
  * accepts any child distribution (it only shrinks data ahead of the
  * shuffle); the final instance requires clustering by the keys, which
  * EnsureRequirements satisfies with a hash exchange. Each partition
  * holds a java.util.PriorityQueue per key whose head is the WORST
  * retained row (reverse ordering), so admission is one compare and
  * replacement is O(log k).
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    flushKeys: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution) else Seq(ClusteredDistribution(keys))

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortExprs = order
    val childOutput = child.output
    val isPartial = partial
    val flushKeysCap = flushKeys
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // "Better" = smaller under the generated ordering (earlier in
      // sorted order); the heap is reversed so peek() is the worst kept.
      val ord = GenerateOrdering.generate(sortExprs, childOutput)
      val rev = ord.reverse
      import scala.jdk.CollectionConverters._
      // STREAMING flush discipline: each flushed epoch is fully EMITTED
      // downstream before the next epoch's map is grown — consumption
      // pauses while an epoch drains (the consumer pulls), so live
      // memory is at most the draining epoch + the growing map, i.e.
      // O(2 · flushKeys · k) rows regardless of input size or key
      // cardinality. (The previous formulation chained every flushed
      // epoch onto one lazy iterator consumed only AFTER the whole
      // input: on near-unique keys — exactly the case flushing targets
      // — all ~n retained rows stayed referenced at once.)
      // The final pass cannot flush (it must see a whole group); its
      // bound is O(#keys-in-partition · k) — the same shape as a hash
      // aggregate on the same key, and the reason the key shuffle
      // precedes it.
      new Iterator[InternalRow] {
        private var heaps =
          new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
        private var emit: Iterator[InternalRow] = Iterator.empty

        private def insert(row: InternalRow): Unit = {
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null) {
            heap = new java.util.PriorityQueue[InternalRow](kLocal, rev)
            heaps.put(key.copy(), heap)
          }
          if (heap.size() < kLocal) {
            heap.add(row.copy())
          } else if (ord.compare(row, heap.peek()) < 0) {
            heap.poll()
            heap.add(row.copy())
          }
        }

        private def drain(
            m: java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]): Iterator[InternalRow] =
          m.values().iterator().asScala.flatMap(_.iterator().asScala)

        private def advance(): Unit = {
          while (!emit.hasNext && heaps != null) {
            if (!iter.hasNext) {
              emit = drain(heaps)
              heaps = null // terminal: input and heaps both exhausted
            } else {
              val row = iter.next()
              if (isPartial && heaps.size() >= flushKeysCap &&
                  !heaps.containsKey(keyProj(row))) {
                val full = heaps
                heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
                insert(row)
                emit = drain(full)
              } else {
                insert(row)
              }
            }
          }
        }

        override def hasNext: Boolean = { advance(); emit.hasNext }
        override def next(): InternalRow = { advance(); emit.next() }
      }
    }, preservesPartitioning = true)
  }
}

object TopKPerKeyExec {
  /** Default key-cardinality cap per partial-pass hash map before it
    * flushes its heaps downstream (correct because the flushed union is
    * always a superset of every group's top k — rows are only dropped
    * when k better same-group rows were admitted in their epoch). 64k
    * keys · k rows bounds partial memory regardless of key cardinality.
    * Tunable per session via `spark.graft.topk.partialFlushKeys`: lower
    * it when k is large or rows are wide (the live bound is
    * 2 · flushKeys · k rows), raise it when keys repeat enough that
    * bigger epochs mean better pre-shuffle reduction.
    */
  val PartialFlushKeys: Int = 1 << 16

  /** The session-conf knob name for the partial-pass flush cap. */
  val PartialFlushKeysConf: String = "spark.graft.topk.partialFlushKeys"
}

/** Public entry: `TopK.perKey(df, keys, orderBy, k)`. Arms the planner
  * strategy idempotently on the session, resolves the column names
  * against the analyzed child, and returns the custom plan as a
  * DataFrame — composable with any downstream transformation.
  */
object TopK {
  def perKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderBy: Seq[(String, Boolean)], // (column, ascending)
      k: Int): DataFrame = {
    val spark = df.sparkSession
    armStrategy(spark)
    val analyzed = df.queryExecution.analyzed
    // Resolve names under the session's case-sensitivity setting, like
    // every other DataFrame API (not a stricter exact-match rule).
    val caseSensitive =
      spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    def matches(a: Attribute, n: String): Boolean =
      if (caseSensitive) a.name == n else a.name.equalsIgnoreCase(n)
    def attr(n: String): Attribute = analyzed.output.find(matches(_, n)).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name).mkString(", ")}"))
    // Float/double keys are NORMALIZED (-0.0 → 0.0, NaN bit patterns
    // canonicalized) before grouping: Catalyst's NormalizeFloatingNumbers
    // rule rewrites Aggregate/Window/Join keys but does not know custom
    // logical nodes, so without this a float key would split groups the
    // rank-window formulation merges (the exact-parity contract).
    val keys = keyCols.map(n => GraftInternal.normalizeFloatingNumbers(attr(n)))
    val order = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    GraftInternal.ofRows(spark, TopKPerKeyPlan(keys, order, k, analyzed))
  }

  def armStrategy(spark: SparkSession): Unit = {
    val exp = GraftInternal.experimental(spark)
    if (!exp.extraStrategies.contains(TopKPerKeyStrategy)) {
      exp.extraStrategies = exp.extraStrategies :+ TopKPerKeyStrategy
    }
  }
}
