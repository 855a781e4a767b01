package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch single-query repeat profiler (not part of the driver contract). */
object Prof2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val q = sys.env.getOrElse("PROF_QUERY", "t01_tick_parse")
    val reps = sys.env.getOrElse("PROF_REPS", "4").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.tune(spark)

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      System.err.println(f"[prof2] $name: ${(System.nanoTime() - t0) / 1e9}%.1fs ($n rows)")
    }

    for (i <- 1 to reps; name <- q.split(",")) {
      time(s"$name#$i")(SparkEntry.queries(name)(spark, sfDir))
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    spark.stop()
  }
}
