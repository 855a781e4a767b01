package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch q25 decomposition profiler (not part of the driver contract). */
object Prof3 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.tune(spark)
    import spark.implicits._

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      System.err.println(f"[prof3] $name: ${(System.nanoTime() - t0) / 1e9}%.1fs ($n rows)")
    }

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    time("scan count")(li.groupBy($"l_returnflag").agg(count(lit(1))))
    time("countDistinct only")(
      li.groupBy($"l_returnflag").agg(countDistinct($"l_orderkey")))
    time("approx rsd=0.05 only")(
      li.groupBy($"l_returnflag").agg(approx_count_distinct($"l_orderkey", 0.05)))
    time("approx rsd=0.01 only")(
      li.groupBy($"l_returnflag").agg(approx_count_distinct($"l_orderkey", 0.01)))
    time("both rsd=0.01")(
      li.groupBy($"l_returnflag").agg(approx_count_distinct($"l_orderkey", 0.01),
        countDistinct($"l_orderkey")))
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy($"l_returnflag").agg(approx_count_distinct($"l_orderkey", 0.01))
      .explain("formatted")
    spark.stop()
  }
}
