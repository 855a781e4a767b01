package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling harness for the t04 hexad16 anomaly (not part of the
  * driver contract): reproduces Bench's exact session/cleanup conditions,
  * runs the hot-loop suite in bench order TWICE, and attributes time to
  * GC vs compute — to separate "t04's plan is slow" from "t04 pays for
  * session-state effects (cleanup debt, JIT, storage pressure)".
  */
object Prof4 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.tune(spark)

    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def clean(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime(); val g0 = gcMs
      val n = df.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[prof4] $name: $sec%.1fs (gc ${(gcMs - g0) / 1000.0}%.1fs, $n rows)")
      clean()
    }

    // Bench's warmup, verbatim shape
    locally {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      li.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag").queryExecution.toRdd.count()
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(md5(col("text")).as("fp")).groupBy("fp")
        .agg(count(lit(1))).queryExecution.toRdd.count()
      val warmLines = spark.range(0, 20000, 1, 8)
        .select(col("id").as("line_idx"),
          concat(lit("20250319 070000 0520000;41971;41970;"),
            (lit(41000) + col("id") % 100).cast("string"), lit(";"),
            (col("id") % 5 + 1).cast("string")).as("value"))
      val warmParsed = graft.operators.TickPipeline
        .parseTickLines(warmLines, col("value"), col("line_idx"))
        .withColumn("ts_packed",
          graft.functions.TickFunctions.encodeTimestamp(col("ts_str")))
      graft.operators.Ordered.withGlobalIndex(warmParsed, "tick_idx", "file_pos")
        .queryExecution.toRdd.count()
      clean()
    }

    import graft.operators.TickQueries
    val seq1 = Seq("t03_hotloop_derivative", "t04_hotloop_hexad16",
      "t05_hotloop_cpm", "t06_hotloop_amc")
    for (pass <- 1 to 2; q <- seq1)
      time(s"pass$pass $q")(TickQueries.queries(q)(spark, sfDir))
    // and t04 once more, hot
    time("pass3 t04_hotloop_hexad16")(
      TickQueries.queries("t04_hotloop_hexad16")(spark, sfDir))
    spark.stop()
  }
}
