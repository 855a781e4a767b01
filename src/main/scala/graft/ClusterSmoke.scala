package graft

import org.apache.spark.sql.SparkSession

/** Multi-executor smoke (not part of the driver contract): runs the
  * queries that exercise every CUSTOM code path — Catalyst expressions
  * (`minhash_sig`, `levenshtein_trimmed`, `BinaryByteFold`, vector
  * dot), the TopKPerKey physical operator pair, the Aggregator-based
  * EMA UDAF, the two-pass chunked scan, and every persisted-index
  * lifecycle (dedup build/merge, gram, media fingerprint, ANN
  * build/mergeIvf) — under `local-cluster[2,4,2048]`: two REAL worker
  * JVMs with a real RPC boundary, so closure/expression/operator
  * serialization bugs that `local[*]` structurally cannot catch (one
  * JVM, no task serialization on the data path) fail here instead of
  * on a real cluster. Each query's row count is compared against the
  * same query run on a plain local session in the same process.
  *
  * Usage:
  * `SPARK_SCALA_VERSION=2.13 SPARK_HOME=/opt/spark sbt "runMain graft.ClusterSmoke"`
  * (the worker launcher needs a full Spark distribution on SPARK_HOME;
  * SPARK_SCALA_VERSION must be set explicitly because the in-process
  * workers' executor launcher otherwise falls back to probing SOURCE
  * build directories — `launcher/target/scala-2.13` — which a binary
  * dist does not have, and every executor dies at launch with "Cannot
  * find any build directories". The sbin scripts normally export it via
  * load-spark-env.sh; an embedded worker inherits this JVM's env).
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
    "t03_hotloop_derivative", // two-pass chunked scan + hot-loop chain
    "l64_batch_novelty",  // persisted corpus gram index (round 13)
    "m09_media_clusters", // persisted media fingerprint index + CC loop
    "l71_merge_parity",   // DedupIndex build+merge lifecycle, served pairs
    "l72_ann_merge_parity", // VectorIndex build+mergeIvf + pruned search
    "l77_ivfpq_topk",     // composed IVF-PQ serving path (round 13)
    "l80_ivfpq_merge_search", // merge-invalidated aligned table + fallback plan (round 14)
    "l81_vec_drift_gate", // assignment-histogram drift statistic (round 14)
    "l82_ivfpq_recall",   // ADC vs exact-topk overlap: TopK + broadcast brute force (round 14)
    "m14_keyframes",      // shared shot chain + keyframe argmax (round 13)
    "m15_media_drift_gate", // payload-size drift statistic (round 14)
    "l84_retrain_parity", // retrainIvf: staged re-key + intent-marked swap (round 15)
    "l85_quantizer_recall", // Lloyd-refined quantizer + dual serving paths (round 15)
    "l86_pointer_swap_parity", // pointer-protocol compact + resolver-served reads (round 15)
    "l87_maintenance_loop", // audit-verdict-actuator loop: flood -> 3x bar -> retrain (round 15)
    "l88_reband_parity", // reband actuator + scheme-aware post-reband merge (round 15)
    "l90_stream_ivfpq", // stream-grown IVFADC: pqCodes fold + composed serving path (round 15)
    "l92_filtered_ann", // metadata-predicate filtered ANN: semi-join before scoring (round 15)
    "l92b_filtered_recall", // filtered recall audit + selectivity-aware over-probe (round 16)
    "l93_band_maintenance", // text-index maintenance loop: flood -> pressure bar -> reband (round 16)
    "l94_tombstone_dedup", // tombstone delete: anti-join deletion vectors on the pairs read (round 16)
    "l95_tombstone_ann",  // tombstone delete on the IVF serving path (round 16)
    "l96_time_travel",    // asOf read of the retained superseded generation (round 16)
    "l97_bpe_oov_encode", // held-out BPE encode: distinct-word merge replay (round 17)
    "l98_ann_time_travel", // searchIvfAsOf: lockstep centroids+lists at depth (round 17)
    "l99_corpus_asof",    // batch-axis corpus snapshots + tombstone rule (round 17)
    "m16_media_tombstone", // media tombstone delete: anti-join on the fps read (round 17)
    "l100_vec_asof_batch", // batch-axis vector snapshots over stream-grown lists (round 17)
    "m17_media_asof_batch", // batch-axis fps snapshots over the deleted fixture (round 17)
    "l101_ivfpq_time_travel", // searchIvfPqAsOf: mixed-depth snapshot, aligned bypass (round 18)
    "l102_ivfpq_asof_batch", // batch-axis ADC over stream-grown lists AND codes (round 18)
    "m18_media_asof_gen", // fps generation-axis asOf over the pointer-compacted fixture (round 18)
    "l103_ivfpq_asof_aligned" // retained aligned codes serve the historical ADC read (round 19)
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
    graft.media.MediaQueries.invalidateSharedIndexes()
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
    // The streaming corpus fold's batch body (exact + canonical +
    // MinHash near-dup rejection, partitioned corpus/index writes) from
    // real executors: batch 1 holds two docs, batch 2 brings an exact
    // copy, a near-dup (one-word edit), and a novel doc — only the
    // novel one may land.
    try {
      import org.apache.spark.sql.functions.col
      val dir = java.nio.file.Files.createTempDirectory("cluster-ingest-").toString
      val base = "the quick brown fox jumps over the lazy dog while seventeen " +
        "green turtles march slowly across the ancient stone bridge carrying " +
        "baskets of ripe yellow mangoes toward the bustling village market " +
        "where merchants trade spices silk and copper pots"
      import spark.implicits._
      val b0 = Seq((1L, base), (2L, "an unrelated second document about sailing boats"))
        .toDF("doc_id", "text")
      val b1 = Seq((3L, base), (4L, base.replace("copper pots", "copper pans")),
        (5L, "a genuinely novel third document about mountain weather"))
        .toDF("doc_id", "text")
      // driftGate on: the same-distribution batch must pass the l73
      // ingest gate (driver-side 8-row collect + _gate write, across
      // the executor boundary)
      graft.streaming.DocStream.ingestBatch(b0, s"$dir/corpus", 0L,
        Some(s"$dir/idx"), driftGate = true)
      graft.streaming.DocStream.ingestBatch(b1, s"$dir/corpus", 1L,
        Some(s"$dir/idx"), driftGate = true)
      val ids = graft.streaming.DocStream.corpus(spark, s"$dir/corpus")
        .select(col("doc_id")).as[Long].collect().sorted.toSeq
      val ok = ids == Seq(1L, 2L, 5L)
      if (!ok) failures += 1
      System.err.println(
        s"[cluster-smoke] docstream_neardup_ingest: corpus=$ids " +
          s"${if (ok) "OK" else "MISMATCH (expected 1,2,5)"}")
    } catch {
      case e: Throwable =>
        failures += 1
        System.err.println(s"[cluster-smoke] docstream_neardup_ingest FAILED: ${e.getMessage}")
    }
    // The streaming embedding-index fold from real executors: quantizer
    // trained standalone, two batches folded in, an exact-copy
    // embedding under a fresh id rejected by the multi-probe near-dup
    // gate, a replay left idempotent.
    try {
      import org.apache.spark.sql.functions.{col, lit}
      val dir = java.nio.file.Files.createTempDirectory("cluster-vec-").toString
      val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      graft.llm.VectorIndex.trainQuantizer(embs, s"$dir/idx")
      graft.streaming.VecStream.ingestBatch(
        embs.where(col("vec_id").between(10, 29)), s"$dir/idx", 0L,
        dupCosX1e6 = Some(999000L))
      val twin = embs.where(col("vec_id") === 15)
        .select(lit(900001L).as("vec_id"), col("embedding"))
      graft.streaming.VecStream.ingestBatch(
        embs.where(col("vec_id").between(30, 39)).unionByName(twin),
        s"$dir/idx", 1L, dupCosX1e6 = Some(999000L))
      // batch 2 under the ASSIGNMENT-DRIFT gate: a constant-direction
      // flood (broken encoder) must be rejected WHOLE — driver-side
      // 8-row histogram collect + _gate write across the executor
      // boundary (the l81 statistic inside the fold)
      import org.apache.spark.sql.functions.array_repeat
      graft.streaming.VecStream.ingestBatch(
        embs.where(col("vec_id").between(40, 49))
          .select(col("vec_id"), array_repeat(lit(0.125f), 64).as("embedding")),
        s"$dir/idx", 2L, driftGate = true)
      import spark.implicits._
      val ids = spark.read.parquet(s"$dir/idx/lists")
        .select(col("vec_id")).as[Long].collect().sorted.toSeq
      val gateOk = graft.streaming.VecStream.gateLog(spark, s"$dir/idx")
        .select(col("rejected")).as[Boolean].collect().toSeq == Seq(true)
      val ok = ids == (10L to 39L).toSeq && gateOk
      if (!ok) failures += 1
      System.err.println(
        s"[cluster-smoke] vecstream_ingest: ${ids.size} held, twin rejected, " +
          s"flood gated ${if (ok) "OK" else s"MISMATCH ($ids, gate=$gateOk)"}")
    } catch {
      case e: Throwable =>
        failures += 1
        System.err.println(s"[cluster-smoke] vecstream_ingest FAILED: ${e.getMessage}")
    }
    // The streaming media-fingerprint fold from real executors: the
    // codegen'd aHash/byte-fold kernels and the banded perceptual probe
    // run with an RPC boundary; an exact payload copy under a fresh id
    // and a one-byte edit of a held asset are both rejected.
    try {
      import org.apache.spark.sql.functions.{col, concat, expr, length, lit}
      val dir = java.nio.file.Files.createTempDirectory("cluster-media-").toString
      val assets = graft.media.MediaOps.mediaTable(spark, sfDir)
        .select(col("media_id"), col("payload"))
      graft.streaming.MediaStream.ingestBatch(
        assets.where(col("media_id").between(10, 29)), dir, 0L,
        rejectHammingLe = Some(1))
      val copy = assets.where(col("media_id") === 15)
        .select(lit(900001L).as("media_id"), col("payload"))
      val edited = assets.where(col("media_id") === 16)
        .select(lit(900002L).as("media_id"),
          concat(lit(Array[Byte]('Z'.toByte)),
            expr("substring(payload, 2, length(payload) - 1)")).as("payload"))
      graft.streaming.MediaStream.ingestBatch(
        assets.where(col("media_id").between(30, 39))
          .unionByName(copy).unionByName(edited), dir, 1L,
        rejectHammingLe = Some(1))
      // batch 2 under the PAYLOAD-SIZE drift gate: a padded flood must
      // be rejected WHOLE (the m15 statistic inside the fold)
      graft.streaming.MediaStream.ingestBatch(
        assets.where(col("media_id").between(40, 49))
          .select(col("media_id"),
            concat(col("payload"), lit(Array.fill(300)('x'.toByte))).as("payload")),
        dir, 2L, driftGate = true)
      import spark.implicits._
      val ids = graft.streaming.MediaStream.fingerprints(spark, dir)
        .select(col("media_id")).as[Long].collect().sorted.toSeq
      val gateOk = graft.streaming.MediaStream.gateLog(spark, dir)
        .select(col("rejected")).as[Boolean].collect().toSeq == Seq(true)
      val ok = ids == (10L to 39L).toSeq && gateOk
      if (!ok) failures += 1
      System.err.println(
        s"[cluster-smoke] mediastream_ingest: ${ids.size} held, copy+edit rejected, " +
          s"flood gated ${if (ok) "OK" else s"MISMATCH ($ids, gate=$gateOk)"}")
    } catch {
      case e: Throwable =>
        failures += 1
        System.err.println(s"[cluster-smoke] mediastream_ingest FAILED: ${e.getMessage}")
    }
    // DedupIndex.merge under real executors: incremental O(delta)
    // maintenance (partition-pruned cross-probe + delta self-join +
    // four appends) must yield the exact pair set a from-scratch build
    // over the union finds — the DedupIndexSpec parity pin, here with
    // an RPC boundary under every stage.
    try {
      import org.apache.spark.sql.functions.col
      val dir = java.nio.file.Files.createTempDirectory("cluster-merge-").toString
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val base = docs.where(col("doc_id") % 4 =!= 3)
      val delta = docs.where(col("doc_id") % 4 === 3)
        .select((col("doc_id") + 900000).as("doc_id"), col("text"))
        .unionByName(docs.where(col("doc_id") % 20 === 0)
          .select((col("doc_id") + 950000).as("doc_id"), col("text")))
      graft.llm.DedupIndex.build(base, s"$dir/merged")
      graft.llm.DedupIndex.merge(spark, s"$dir/merged", delta,
        mergeId = Some("cluster-d1"))
      graft.llm.DedupIndex.build(base.unionByName(delta), s"$dir/scratch")
      def pairs(p: String) = graft.llm.DedupIndex.candidatePairs(spark, p)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val merged = pairs(s"$dir/merged"); val scratch = pairs(s"$dir/scratch")
      val ok = merged == scratch && merged.nonEmpty
      if (!ok) failures += 1
      System.err.println(
        s"[cluster-smoke] dedupindex_merge: merged=${merged.size} " +
          s"scratch=${scratch.size} ${if (ok) "OK" else "MISMATCH"}")
    } catch {
      case e: Throwable =>
        failures += 1
        System.err.println(s"[cluster-smoke] dedupindex_merge FAILED: ${e.getMessage}")
    }
    // DedupIndex.compact under real executors: the maintenance rewrite
    // (distinct + refile + swap) must leave every consumer identical and
    // the file counts bounded — the DedupIndexSpec compaction pin, with
    // the distinct/repartition shuffles crossing worker boundaries.
    try {
      import org.apache.spark.sql.functions.col
      val dir = java.nio.file.Files.createTempDirectory("cluster-compact-").toString
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val base = docs.where(col("doc_id") % 4 =!= 3)
      val delta = docs.where(col("doc_id") % 4 === 3)
        .select((col("doc_id") + 900000).as("doc_id"), col("text"))
      graft.llm.DedupIndex.build(base, s"$dir/idx")
      graft.llm.DedupIndex.merge(spark, s"$dir/idx", delta,
        mergeId = Some("cluster-c1"))
      def pairs() = graft.llm.DedupIndex.candidatePairs(spark, s"$dir/idx")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val before = pairs()
      graft.llm.DedupIndex.compact(spark, s"$dir/idx", targetFiles = 4)
      val after = pairs()
      val nFiles = graft.util.Fs.listFiles(spark, s"$dir/idx/pairs")
        .count(_.endsWith(".parquet"))
      val ok = after == before && after.nonEmpty && nFiles <= 4 &&
        !graft.util.Fs.exists(spark, s"$dir/idx/_merges")
      if (!ok) failures += 1
      System.err.println(
        s"[cluster-smoke] dedupindex_compact: pairs=${after.size} " +
          s"files=$nFiles ${if (ok) "OK" else "MISMATCH"}")
    } catch {
      case e: Throwable =>
        failures += 1
        System.err.println(s"[cluster-smoke] dedupindex_compact FAILED: ${e.getMessage}")
    }
    // IndexStatus + layout-recorded retention under real executors: the
    // report is driver-side metadata probes, but the lifecycle it reads
    // (pointer retrain with retained aligned codes, recorded retention,
    // a takedown) runs across the RPC boundary here.
    try {
      import org.apache.spark.sql.functions.col
      val dir = java.nio.file.Files.createTempDirectory("cluster-status-").toString
      val idx = s"$dir/idx"
      val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val corpus = embs.where(col("vec_id") >= 10)
      graft.llm.VectorIndex.buildIvf(corpus, idx)
      graft.llm.VectorIndex.buildPq(corpus, idx)
      graft.llm.VectorIndex.alignPqToLists(spark, idx)
      graft.llm.IndexMaintenance.setRetention(spark, idx, Some(2))
      graft.llm.VectorIndex.retrainIvf(spark, idx, swapMode = Some("pointer"))
      graft.llm.VectorIndex.deleteIvf(spark, idx,
        corpus.limit(2).select(col("vec_id")))
      val st = graft.llm.IndexStatus.of(spark, idx)
      val ok = st.protocol == "pointer" && st.retainGens == 2 &&
        st.retentionRecorded &&
        st.stages.exists(s => s.stage == "lists" && s.liveGen == 1L &&
          s.generations.map(_.gen).sorted == Seq(0L, 1L)) &&
        st.aligned.exists(a => !a.liveGateUp && a.retainedGens == Seq(0L)) &&
        st.tombstones.exists(t => t.gateUp && t.dataFiles >= 1) &&
        st.lease.isEmpty && !st.journalPending
      if (!ok) failures += 1
      System.err.println(
        s"[cluster-smoke] index_status: ${if (ok) "OK" else s"MISMATCH\n${st.describe}"}")
    } catch {
      case e: Throwable =>
        failures += 1
        System.err.println(s"[cluster-smoke] index_status FAILED: ${e.getMessage}")
    }
    System.err.println(
      s"[cluster-smoke] ${Queries.size + 6 - failures}/${Queries.size + 6} ok on " +
        s"${spark.sparkContext.master}")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
