package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join by key salting.
  *
  * A shuffle join hashes rows to reducers by join key, so one hot key
  * (a few percent of a 100 TB fact table sharing one id) lands on one
  * task and the stage runs at the speed of that straggler. AQE's skew
  * split helps for sort-merge joins reading shuffle files, but salting
  * is the plan-level fix that also composes with bucketing and works for
  * any join the optimizer picks: the fact side appends a random-but-
  * deterministic salt in [0, S), the dimension side is exploded S times
  * (one copy per salt), and the join key becomes (key, salt) — spreading
  * each hot key over S reducers at the cost of S dimension replicas
  * (bounded: dims are the small side by contract).
  */
object Salted {

  /** Equi-join `facts` with the (small) `dims` on `key`, salted `s` ways.
    * Result equals `facts.join(dims, key)` exactly; only the shuffle
    * distribution changes. The salt is derived from fact columns via
    * hash(), so the plan stays deterministic (no rand(): retried tasks
    * must salt identically or a recompute changes the result under
    * non-idempotent sinks).
    *
    * The default salt source is every hashable fact column — map columns
    * are excluded because Spark's hash() rejects MapType at analysis, and
    * hashing wide rows costs; pass an explicit `saltSource` (any one
    * high-cardinality column suffices) to bound that cost.
    */
  def join(facts: DataFrame, dims: DataFrame, key: String, s: Int,
      saltSource: Seq[Column] = Nil): DataFrame = {
    require(s >= 1, s"salt fan-out must be >= 1: $s")
    require(!facts.columns.contains("__salt") && !dims.columns.contains("__salt"),
      "input already has a __salt column — withColumn would clobber it and " +
        "the final drop would silently lose it")
    val src =
      if (saltSource.nonEmpty) saltSource
      else facts.schema.fields.toSeq
        .filterNot(f => hasMapType(f.dataType)).map(f => col(f.name))
    require(src.nonEmpty,
      "no hashable fact columns to derive a deterministic salt from — " +
        "pass an explicit saltSource")
    val salted = facts.withColumn("__salt", pmod(hash(src: _*), lit(s)))
    val exploded = dims.withColumn("__salt",
      explode(sequence(lit(0), lit(s - 1))))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }

  private def hasMapType(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => true
    case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMapType(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType => hasMapType(a.elementType)
    case _ => false
  }
}
