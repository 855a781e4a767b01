package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import org.apache.spark.sql.functions._

/** Runtime-adaptivity pins: the two Spark mechanisms a 100 TB deployment
  * leans on beyond static planning — AQE skew-join splitting (the
  * built-in complement of the deterministic `Salted` join for skew
  * discovered only at runtime) and runtime bloom-filter injection
  * (a selective dimension predicate semi-filters the fact shuffle
  * before the join). Both are exercised on synthetic data with the
  * thresholds scaled down to test size; the assertions pin that the
  * mechanisms actually engage under this session's configuration, not
  * just that the configs exist.
  */
class AdaptiveSpec extends SparkSpec {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    val s = spark
    import s.implicits._
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      // one pathological hot key plus a uniform tail, joined to a
      // uniform right side: the hot key's shuffle partition dwarfs the
      // median and must be split by OptimizeSkewedJoin
      val left = spark.range(0, 60000).select(
        when(col("id") < 50000, 0L).otherwise(col("id")).as("k"),
        concat(lit("payload-payload-payload-"), col("id")).as("pay"))
      val right = spark.range(0, 2000).select(col("id").as("k"),
        col("id").cast("string").as("rv"))
      val joined = left.join(right, "k")
      // execute THIS dataset's own plan so its AQE run finalizes
      // (count() would plan and execute a separate aggregated query)
      assert(joined.collect().length > 0)
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // QueryStageExec nodes are leaves to TreeNode.collect, so assert on
      // the rendered final plan: OptimizeSkewedJoin marks the join
      // `skew=true` and the hot side's reader `AQEShuffleRead skewed`.
      val rendered = finalPlan.toString
      assert(rendered.contains("SortMergeJoin(skew=true)")
          || rendered.contains("ShuffledHashJoin(skew=true)"),
        s"AQE did not mark the join skewed:\n$rendered")
      assert(rendered.contains("AQEShuffleRead skewed"),
        s"the hot partition was not split into reader slices:\n$rendered")
    }
  }

  test("a selective dim filter injects a runtime bloom filter into the fact side") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    val s = spark
    import s.implicits._
    spark.range(0, 200000)
      .select(col("id").as("fk"), (col("id") % 97).as("payload"))
      .write.mode("overwrite").parquet(s"$dir/fact")
    spark.range(0, 5000)
      .select(col("id").as("dk"), (col("id") % 13).as("attr"))
      .write.mode("overwrite").parquet(s"$dir/dim")
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").where(col("attr") === 3)
      val joined = fact.join(dim, col("fk") === col("dk"))
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("bloom_filter") || opt.contains("BloomFilter"),
        s"no runtime bloom filter injected on the fact side:\n$opt")
      assert(joined.count() > 0)
    }
  }
}
