package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-linearity probe (not part of the driver contract): runs the
  * chunked hot loop on 1x / 4x / 10x the sf0.1 expanded tick stream
  * (shifted copies preserve a strictly increasing tick_idx) and prints
  * seconds per scale. The scan architecture should scale ~linearly; a
  * superlinear curve means a hidden single-point bottleneck.
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      // No spark.speculation: it is a no-op in local mode (the
      // speculation thread only starts for non-local masters). Soak
      // numbers are read with the host-stall caveat in mind instead.
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.tune(spark)

    val cfg = graft.config.SignalConfig(encoderType = "derivative",
      minPrice = 39000, maxPrice = 44000, tickDerivativeImagScale = 2.0f)
    val base = graft.operators.TickPipeline.syntheticTicksExpanded(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = base.count()

    sys.env.getOrElse("SOAK_MULTS", "1,4,10").split(",").map(_.trim.toInt)
      .toSeq.foreach { mult =>
      val stream =
        if (mult == 1) base
        else (0 until mult).map { k =>
          base.withColumn("tick_idx", col("tick_idx") + lit(k * n))
        }.reduce(_.unionByName(_))
      // warm copy-count so union/scan codegen is compiled before timing
      val t0 = System.nanoTime()
      val out = graft.operators.TickPipeline.hotLoopChunked(stream, cfg)
      val rows = out.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[soak] ${mult}x: $rows rows in $sec%.1fs " +
        f"(${rows / sec / 1e6}%.2fM ticks/s)")
      // keep `base` cached across scales; just surface dead scan
      // checkpoints to the cleaner
      System.gc()
    }
    base.unpersist()
    spark.stop()
  }
}
