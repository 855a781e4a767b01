package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Storage-layout evidence for the scale story: bucketed tables join
  * without exchanges; partitioned directories prune at planning time.
  */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }.size

  test("bucketed tables equi-join with ZERO shuffle exchanges") {
    val dir = Files.createTempDirectory("buck").toString
    val facts = (1 to 2000).map(i => (i.toLong % 97, i.toLong, i * 2.0))
      .toDF("key", "id", "amount")
    val dims = (0L until 97L).map(k => (k, s"dim$k")).toDF("key", "name")
    Warehouse.writeBucketed(facts, "wh_facts", s"$dir/facts", 8, Seq("key"), Seq("key"))
    Warehouse.writeBucketed(dims, "wh_dims", s"$dir/dims", 8, Seq("key"), Seq("key"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so bucketing (not broadcast) must
      // eliminate the shuffles
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("wh_facts")
        .join(spark.table("wh_dims"), "key")
        .groupBy($"name").agg(sum($"amount").as("total"))
      assert(shuffleCount(joined) <= 1, // only the final tiny group-by may shuffle
        s"bucketed join still shuffles:\n${joined.queryExecution.executedPlan}")
      // the JOIN itself must be exchange-free: check the plan below the agg
      val joinOnly = spark.table("wh_facts").join(spark.table("wh_dims"), "key")
      assert(shuffleCount(joinOnly) == 0,
        s"bucketed equi-join has exchanges:\n${joinOnly.queryExecution.executedPlan}")
      // and it must be correct
      val expected = facts.join(dims, "key").count()
      assert(joinOnly.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS wh_facts")
      spark.sql("DROP TABLE IF EXISTS wh_dims")
    }
  }

  test("bucketed group-by on the bucket key needs no exchange") {
    val dir = Files.createTempDirectory("buckagg").toString
    val facts = (1 to 2000).map(i => (i.toLong % 53, i * 1.5)).toDF("key", "v")
    Warehouse.writeBucketed(facts, "wh_agg", s"$dir/agg", 8, Seq("key"))
    try {
      val agg = spark.table("wh_agg").groupBy($"key").agg(count(lit(1)).as("n"))
      assert(shuffleCount(agg) == 0,
        s"bucketed aggregation shuffles:\n${agg.queryExecution.executedPlan}")
      assert(agg.count() == 53)
    } finally spark.sql("DROP TABLE IF EXISTS wh_agg")
  }

  test("partitioned parquet prunes directories at planning time") {
    val dir = Files.createTempDirectory("part").toString
    val events = (1 to 300).map(i => (i.toLong, s"2024-01-${"%02d".format(i % 5 + 1)}", i * 1.0))
      .toDF("id", "day", "value")
    Warehouse.writePartitioned(events, s"$dir/events", Seq("day"))
    val pruned = Warehouse.readPartitioned(spark, s"$dir/events")
      .where($"day" === "2024-01-03")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("day"),
      s"no partition filter in plan:\n$plan")
    // planning-time proof: the scan's selected partitions must be 1 of 5
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil).size == 1,
      "partition pruning selected more than the one matching directory")
    assert(pruned.count() == 60)
  }
}
