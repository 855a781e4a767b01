package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling harness (not part of the driver contract). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.tune(spark)

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      System.err.println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.1fs ($n rows)")
    }

    import graft.operators.{TickPipeline, TickQueries}
    val base = TickPipeline.syntheticTicks(spark, sfDir)
    time("synthetic")(base)
    val lines = base
      .withColumn("value",
        when(col("line_idx") % 97 === 0, lit("malformed;data"))
          .when(col("line_idx") % 89 === 0, lit(""))
          .otherwise(concat(col("ts_str"), lit(";"), (col("last") - 1).cast("string"),
            lit(";"), col("last").cast("string"), lit(";"), col("last").cast("string"),
            lit(";"), col("volume").cast("string"))))
      .where(length(trim(col("value"))) > 0)
    time("synthetic+mkline")(lines)
    val parsed = TickPipeline.parseTickLines(lines, col("value"), col("line_idx"))
    time("parsed")(parsed)
    val enc = parsed.select(col("file_pos").as("orig_line"),
      graft.functions.TickFunctions.encodeTimestamp(col("ts_str")).as("ts_packed"),
      col("bid"), col("ask"), col("last"), col("volume"))
    time("parsed+encodeTs")(enc)
    val indexed = graft.operators.Ordered.withGlobalIndex(parsed, "line_idx2", "file_pos")
    time("parsed+index")(indexed)
    time("parsed+index+orderBy")(indexed.orderBy("line_idx2"))
    time("t01 full (with orderBy)")(TickQueries.queries("t01_tick_parse")(spark, sfDir))
    val expanded = TickPipeline.syntheticTicksExpanded(spark, sfDir)
    time("expanded (no orderBy)")(expanded)
    time("t02 full (with orderBy)")(TickQueries.queries("t02_volume_expansion")(spark, sfDir))
    val cfg = graft.config.SignalConfig(encoderType = "derivative", minPrice = 39000,
      maxPrice = 44000, tickDerivativeImagScale = 2.0f)
    val hot = TickPipeline.hotLoopChunked(TickPipeline.syntheticTicksExpanded(spark, sfDir),
      cfg, assumeOrdered = true)
    time("hotloop derivative (no orderBy)")(hot)
    time("t03 full (with orderBy)")(TickQueries.queries("t03_hotloop_derivative")(spark, sfDir))
    spark.stop()
  }
}
