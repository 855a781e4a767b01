package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: t01 isolation — full query repeated, with/without orderBy. */
object Prof5 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.speculation", "true")
      .config("spark.speculation.interval", "1s")
      .config("spark.speculation.multiplier", "4")
      .config("spark.speculation.quantile", "0.75")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.tune(spark)
    def clean(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      System.err.println(f"[prof5] $name: ${(System.nanoTime() - t0) / 1e9}%.1fs ($n rows)")
      clean()
    }
    import graft.operators.{TickPipeline, TickQueries}
    import graft.functions.TickFunctions
    for (i <- 1 to 3)
      time(s"t01 full #$i")(TickQueries.queries("t01_tick_parse")(spark, sfDir))
    // without the trailing orderBy
    val lines = TickPipeline.syntheticTicks(spark, sfDir)
      .withColumn("value",
        when(col("line_idx") % 97 === 0, lit("malformed;data"))
          .when(col("line_idx") % 89 === 0, lit(""))
          .otherwise(concat(col("ts_str"), lit(";"), (col("last") - 1).cast("string"),
            lit(";"), col("last").cast("string"), lit(";"), col("last").cast("string"),
            lit(";"), col("volume").cast("string"))))
      .where(length(trim(col("value"))) > 0)
    time("t01 no-orderBy") {
      TickPipeline.parseTickLines(lines, col("value"), col("line_idx"))
        .select(col("file_pos").as("orig_line"),
          TickFunctions.encodeTimestamp(col("ts_str")).as("ts_packed"),
          col("bid"), col("ask"), col("last"), col("volume"))
    }
    spark.stop()
  }
}
