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
    */
  def join(facts: DataFrame, dims: DataFrame, key: String, s: Int,
      saltSource: Seq[Column] = Nil): DataFrame = {
    require(s >= 1, s"salt fan-out must be >= 1: $s")
    require(!facts.columns.contains("__salt") && !dims.columns.contains("__salt"),
      "input already has a __salt column — withColumn would clobber it and " +
        "the final drop would silently lose it")
    val src = if (saltSource.nonEmpty) saltSource else facts.columns.map(col).toSeq
    val salted = facts.withColumn("__salt", pmod(hash(src: _*), lit(s)))
    val exploded = dims.withColumn("__salt",
      explode(sequence(lit(0), lit(s - 1))))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }
}
