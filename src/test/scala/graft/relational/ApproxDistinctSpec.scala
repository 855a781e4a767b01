package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins q25's approximation claim: Spark's `approx_count_distinct`
  * (HLL++) must land within the rsd-implied error bound of the exact
  * distinct count. The DuckDB oracle for q25 only cross-checks the EXACT
  * count (its `approx_within_5pct` column is a literal TRUE — DuckDB has
  * no HLL++ to compare against), so this spec is what makes the approx
  * claim tested rather than declared (see
  * [[RelationalQueries.q25ApproxDistinct]]).
  */
class ApproxDistinctSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("HLL estimate stays within 5 standard deviations at several rsd values") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_returnflag"), col("l_orderkey"))
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty && exact.values.forall(_ > 0))
    for (rsd <- Seq(0.01, 0.02, 0.05)) {
      val approx = li.groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_orderkey"), rsd).as("approx"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      approx.foreach { case (flag, est) =>
        val ex = exact(flag)
        val bound = 5.0 * rsd * ex
        assert(math.abs(est - ex) <= bound,
          s"rsd=$rsd flag=$flag: |$est - $ex| > $bound")
      }
    }
  }

  test("q25's own contract column holds on the driver tables") {
    val rows = RelationalQueries.q25ApproxDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("approx_within_5pct")))
  }
}
