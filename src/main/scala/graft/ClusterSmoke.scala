package graft

import org.apache.spark.sql.SparkSession

/** Multi-executor smoke (not part of the driver contract): runs the
  * queries that exercise every CUSTOM code path — Catalyst expressions
  * (`minhash_sig`, `levenshtein_trimmed`, `BinaryByteFold`, vector
  * dot), the TopKPerKey physical operator pair, the Aggregator-based
  * EMA UDAF, the two-pass chunked scan, and the persisted dedup/ANN
  * index lifecycle — under `local-cluster[2,4,2048]`: two REAL worker
  * JVMs with a real RPC boundary, so closure/expression/operator
  * serialization bugs that `local[*]` structurally cannot catch (one
  * JVM, no task serialization on the data path) fail here instead of
  * on a real cluster. Each query's row count is compared against the
  * same query run on a plain local session in the same process.
  *
  * Usage: `SPARK_HOME=/opt/spark sbt "runMain graft.ClusterSmoke"`
  * (the worker launcher needs a full Spark distribution on SPARK_HOME).
  */
object ClusterSmoke {
  private val Queries = Seq(
    "q66_topk_custom",    // custom logical node + strategy + exec pair
    "q24_ema_udaf",       // Aggregator UDAF (Kryo/serialization canary)
    "l02_minhash_signatures", // codegen'd MinHashSig expression
    "l05_ngram_jaccard",  // shared DedupIndex build + persisted artifacts
    "l06_cosine_topk",    // TopK.perKey + FloatVectorDot expression
    "l21_edit_distance",  // LevenshteinTrimmed kernel + rewrite rule
    "m04_media_stats",    // BinaryByteFold codegen kernels
    "t03_hotloop_derivative" // two-pass chunked scan + hot-loop chain
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    // Expected row counts from a plain single-JVM local session,
    // computed FIRST and the session stopped, so a cluster-mode wrong
    // ANSWER (not just a crash) is caught; contexts run one at a time.
    val expected: Map[String, Long] = {
      val local = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", 8)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      local.sparkContext.setLogLevel("WARN")
      SparkEntry.tune(local)
      val m = Queries.map { name =>
        name -> SparkEntry.queries(name)(local, sfDir).count()
      }.toMap
      local.stop()
      m
    }
    graft.llm.LlmQueries.invalidateSharedIndexes() // rebuild under the cluster
    // Executors are separate JVMs with no auto-shipped application jar
    // in local-cluster mode — give them this build's class directory
    // (on a real cluster this is the --jars/--packages submission step).
    val appClasses = getClass.getProtectionDomain.getCodeSource.getLocation.getPath
    val spark = SparkSession.builder()
      .master("local-cluster[2,4,2048]")
      .appName("graft-cluster-smoke")
      .config("spark.executor.memory", "2g")
      .config("spark.executor.extraClassPath", appClasses)
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.tune(spark)
    var failures = 0
    for (name <- Queries) {
      val t0 = System.nanoTime()
      try {
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        val ok = n == expected(name)
        if (!ok) failures += 1
        System.err.println(
          f"[cluster-smoke] $name: $n rows (expected ${expected(name)}) " +
            f"${if (ok) "OK" else "MISMATCH"} in ${(System.nanoTime() - t0) / 1e9}%.1fs")
      } catch {
        case e: Throwable =>
          failures += 1
          System.err.println(s"[cluster-smoke] $name FAILED: ${e.getMessage}")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    System.err.println(
      s"[cluster-smoke] ${Queries.size - failures}/${Queries.size} ok on " +
        s"${spark.sparkContext.master}")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
