package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.window.WindowExec

import graft.SparkSpec
import graft.llm.LlmQueries
import graft.relational.RelationalQueries

/** Physical-plan shape guards for the scale-critical paths. Correctness is
  * covered by the oracle gate; these tests pin the PLAN properties that make
  * the operators viable at the 100 TB design point, so a refactor that
  * silently reintroduces an all-pairs join or an unpartitioned global window
  * fails in CI rather than in the bench log.
  */
class PlanSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): String = df.queryExecution.sparkPlan.toString

  private def assertNoAllPairs(name: String, df: DataFrame): Unit = {
    val p = planOf(df)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"$name plan contains BroadcastNestedLoopJoin (all-pairs):\n$p")
    assert(!p.contains("CartesianProduct"),
      s"$name plan contains CartesianProduct (all-pairs):\n$p")
  }

  // The LSH-bucketed similarity operators must candidate-generate through
  // equi-joins on bucket keys — never an all-pairs product. (l06 is the
  // declared brute-force baseline and is exempt by contract.)
  test("l05 ngram-jaccard scores LSH candidates with equi-joins only") {
    assertNoAllPairs("l05", LlmQueries.queries("l05_ngram_jaccard")(spark, sf))
  }
  test("l08 embedding near-dup joins home-bucket to probes, not all pairs") {
    assertNoAllPairs("l08", LlmQueries.queries("l08_embed_neardup")(spark, sf))
  }
  test("l13 ANN top-k joins probe keys to buckets, not all pairs") {
    assertNoAllPairs("l13", LlmQueries.queries("l13_ann_topk")(spark, sf))
  }
  test("l16 contamination semi-joins the broadcast benchmark gram set") {
    val df = LlmQueries.queries("l16_contamination")(spark, sf)
    assertNoAllPairs("l16", df)
    // the corpus-side probe must be a broadcast hash join on the gram key
    // (the benchmark set is the small fixed side at any corpus scale)
    assert(planOf(df).contains("BroadcastHashJoin"),
      s"l16 plan lacks the broadcast semi-join:\n${planOf(df)}")
  }

  // The benched hot-loop path must never fall back to an unpartitioned
  // global window (WindowExec with empty partitionSpec serializes the whole
  // table onto one task) — total order is handled by the two-pass Scan.
  test("t03 chunked hot loop has no unpartitioned window") {
    val df = graft.operators.TickQueries.queries("t03_hotloop_derivative")(spark, sf)
    val windows = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    val unpartitioned = windows.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.isEmpty,
      s"t03 plan has ${unpartitioned.size} unpartitioned WindowExec node(s)")
  }
  test("t07 bars path has no unpartitioned window") {
    val df = graft.operators.TickQueries.queries("t07_bars_boxcar")(spark, sf)
    val windows = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    val unpartitioned = windows.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.isEmpty,
      s"t07 plan has ${unpartitioned.size} unpartitioned WindowExec node(s)")
  }

  // Narrow projections must prune at the parquet scan: a 3-column query
  // over the 16-column lineitem table must not read unrelated columns.
  test("q01 scan prunes unprojected lineitem columns") {
    val p = planOf(RelationalQueries.queries("q01_scan_project")(spark, sf))
    assert(p.contains("l_extendedprice"), p)
    assert(!p.contains("l_comment"), s"q01 reads l_comment it never uses:\n$p")
    assert(!p.contains("l_shipdate"), s"q01 reads l_shipdate it never uses:\n$p")
  }

  // Filters must reach the scan as pushed data filters.
  test("q02 filter pushes predicates into the parquet scan") {
    val p = planOf(RelationalQueries.queries("q02_filter")(spark, sf))
    // The plan's PushedFilters list is elided in toString, so assert the
    // head of the list — a non-empty pushdown always leads with IsNotNull
    // of the first filtered column.
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)"),
      s"q02 predicates not pushed to the parquet scan:\n$p")
  }

  // The cluster-resolution label rounds are equi-joins on doc ids; an
  // all-pairs fallback here would be quadratic in the corpus.
  test("l17 cluster resolution propagates labels with equi-joins only") {
    assertNoAllPairs("l17", LlmQueries.queries("l17_dedup_clusters")(spark, sf))
  }
  // Repetition signals shuffle on (doc, gram) only — never all-pairs.
  test("l19 repetition filter aggregates grams with equi-shuffles only") {
    assertNoAllPairs("l19", LlmQueries.queries("l19_repetition")(spark, sf))
  }
  // The correlated scalar subquery must decorrelate into an aggregate +
  // join — a surviving per-row ScalarSubquery node would re-execute the
  // inner aggregate once per outer row.
  test("q30 correlated subquery decorrelates into an aggregate + join") {
    val df = RelationalQueries.queries("q30_correlated_subquery")(spark, sf)
    val p = planOf(df)
    assert(!p.contains("ScalarSubquery"),
      s"q30 still carries a per-row scalar subquery:\n$p")
    assert(p.contains("Join") && p.contains("Aggregate"),
      s"q30 lost the decorrelated agg+join shape:\n$p")
  }
  // The URL blocklist is the constant small side: the probe must stay a
  // broadcast join at any corpus scale.
  test("l22 URL filter broadcasts the blocklist") {
    val p = planOf(LlmQueries.queries("l22_url_filter")(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"l22 lost the broadcast blocklist join:\n$p")
  }

  // Pivot compiles to exactly the two-level aggregate (inner
  // group-by-(key, pivot-col) sum, then pivotfirst) with column pruning
  // reaching the scan — and, because the value list is explicit, planning
  // never runs the eager distinct-values collect job over the corpus.
  test("q26 pivot plans as the two-level aggregate with a pruned scan") {
    val df = RelationalQueries.queries("q26_pivot")(spark, sf)
    val p = planOf(df)
    val aggCount = "HashAggregate|SortAggregate|ObjectHashAggregate".r
      .findAllIn(p).size
    assert(aggCount == 4, // partial+final for each of the two levels
      s"q26 has $aggCount aggregate nodes (expected 4):\n$p")
    assert(p.contains("pivotfirst"), s"q26 lost the pivot aggregate:\n$p")
    assert(!p.contains("l_comment"), s"q26 reads l_comment it never uses:\n$p")
  }

  // Chunk dedup's first-occurrence resolution must be an equi-join on the
  // chunk text against the hash-aggregated min key — never all-pairs.
  test("l23 chunk dedup resolves first occurrences with an equi-join") {
    assertNoAllPairs("l23", LlmQueries.queries("l23_chunk_dedup")(spark, sf))
  }

  // Sequence packing's prefix sum must stay partitioned by language: an
  // unpartitioned cumulative window would serialize the whole corpus onto
  // one task at 100 TB.
  test("l24 sequence packing windows are partitioned by language") {
    val df = LlmQueries.queries("l24_sequence_packing")(spark, sf)
    val windows = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "l24 lost its window")
    val unpartitioned = windows.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.isEmpty,
      s"l24 plan has ${unpartitioned.size} unpartitioned WindowExec node(s)")
  }

  // NOT IN over a nullable subquery must plan as the broadcast
  // null-aware anti join (the trailing `true` flag on the LeftAnti
  // BroadcastHashJoin) — a fallback to BroadcastNestedLoopJoin would be
  // quadratic at fact-table scale, and dropping the null-aware flag
  // would silently change three-valued-logic semantics.
  test("q33 NOT IN plans as a broadcast null-aware anti join") {
    val p = planOf(RelationalQueries.queries("q33_null_aware_anti")(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"q33 fell back to BroadcastNestedLoopJoin:\n$p")
    assert(p.contains("LeftAnti, BuildRight, true"),
      s"q33 lost the null-aware anti join flag:\n$p")
  }

  // PQ code assignment must broadcast the 64-row codebook — a shuffle of
  // the corpus against it would be a scale bug.
  test("l26 PQ codes broadcast the codebook") {
    val df = LlmQueries.queries("l26_pq_codes")(spark, sf)
    assertNoAllPairs("l26", df)
    assert(planOf(df).contains("BroadcastHashJoin"),
      s"l26 lost the broadcast codebook join:\n${planOf(df)}")
  }

  // LATERAL (ORDER BY ... LIMIT k) must decorrelate into a rank window
  // over an equi-join on the correlation key — a per-outer-row inner
  // re-execution (nested-loop lateral) would re-scan orders once per
  // customer at fact-table scale.
  test("q34 lateral decorrelates into a windowed equi-join") {
    val df = RelationalQueries.queries("q34_lateral")(spark, sf)
    val p = planOf(df)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q34 plans a non-equi lateral join:\n$p")
    val windows = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      s"q34 lost the partitioned rank window:\n$p")
  }

  // k-means assignment must broadcast the k-row centroid table against
  // the corpus (a bounded-fanout broadcast product, like l14's IVF
  // assignment) and keep every argmin window partitioned by vector — a
  // CartesianProduct or a global window would serialize the corpus.
  test("l28 k-means broadcasts centroids and aggregates the argmin") {
    val df = LlmQueries.queries("l28_kmeans_refine")(spark, sf)
    val p = planOf(df)
    assert(p.contains("Broadcast"), s"l28 lost the centroid broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"l28 plans a non-broadcast cartesian:\n$p")
    // Round 11: nearest-centroid assignment is a min_by AGGREGATION
    // (map-side combined over the K-fold centroid join), not a rank
    // window — no WindowExec may reappear in the assignment path
    // (shuffling and sorting the K-fold blowup by vec_id).
    val windows = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(windows.isEmpty,
      s"l28 regained ${windows.size} WindowExec node(s) — argmin must stay an aggregation")
    assert(p.contains("min_by") || p.contains("minby"),
      s"l28 argmin aggregation missing from plan:\n${p.take(1500)}")
  }

  // The rare-term index's df side joins back on the term key and its
  // ranking window is partitioned by doc — no all-pairs, no global window.
  test("l25 rare-term index joins tf to df on the term key") {
    val df = LlmQueries.queries("l25_rare_term_index")(spark, sf)
    assertNoAllPairs("l25", df)
    val unpartitioned = df.queryExecution.sparkPlan
      .collect { case w: WindowExec => w }.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.isEmpty,
      s"l25 plan has ${unpartitioned.size} unpartitioned WindowExec node(s)")
  }

  // l33's repeated-gram membership probe must stay a semi join on the
  // gram hash — materializing the repeated set any other way (e.g. an
  // IN-subquery falling back to a nested-loop existence check) would
  // drag the corpus-sized gram table through a non-equi path.
  test("l33 substring repeats semi-joins the repeated-gram set") {
    val df = LlmQueries.queries("l33_substring_repeats")(spark, sf)
    assertNoAllPairs("l33", df)
    assert(planOf(df).contains("LeftSemi"),
      s"l33 lost the left-semi membership probe:\n${planOf(df)}")
  }

  // l34/l35/l36 join per-token streams back to bounded side tables (the
  // 1024 DSIR buckets, the top-16 vocab, the O(1) corpus total). Those
  // sides must broadcast — a shuffle there repartitions the full token
  // stream once per side table.
  test("l35 importance weights broadcast both bucket-count tables") {
    val p = planOf(LlmQueries.queries("l35_importance_weights")(spark, sf))
    assert(p.sliding("BroadcastHashJoin".length).count(_ == "BroadcastHashJoin") >= 2,
      s"l35 lost a bucket-table broadcast:\n$p")
  }
  // l37's pairwise stage must be the in-cluster equi-join on c_id. The
  // every-vector-vs-every-centroid broadcast product is by design (the
  // centroid table is BOUNDED, same as l14's IVF build) — what must
  // never appear is an unbounded all-pairs product: no CartesianProduct,
  // and the vector-vs-vector comparison joins on the cluster key.
  test("l37 semantic dedup compares only within clusters") {
    val p = planOf(LlmQueries.queries("l37_semantic_dedup")(spark, sf))
    assert(!p.contains("CartesianProduct"),
      s"l37 plan contains CartesianProduct (all-pairs):\n$p")
    assert(p.contains("SortMergeJoin [c_id") || p.contains("ShuffledHashJoin [c_id")
      || p.contains("BroadcastHashJoin [c_id"),
      s"l37 pairwise stage is not an equi-join on c_id:\n$p")
  }

  test("l36 vocab coverage broadcasts the top-k vocabulary") {
    val p = planOf(LlmQueries.queries("l36_vocab_coverage")(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"l36 lost the vocab broadcast:\n$p")
  }

  // l39's corpus-membership probes must both be semi joins on content
  // keys (md5 fingerprint, LSH band key) so corpus and batch can both be
  // unbounded — an all-pairs or nested-loop existence check would make
  // the incremental pass cost as much as re-deduping the whole corpus.
  test("l39 incremental dedup probes the corpus with semi joins only") {
    val df = LlmQueries.queries("l39_incremental_dedup")(spark, sf)
    assertNoAllPairs("l39", df)
    val p = planOf(df)
    assert(p.sliding("LeftSemi".length).count(_ == "LeftSemi") >= 2,
      s"l39 lost a semi-join membership probe:\n$p")
  }

  // The event-time window queries must keep every window partitioned by
  // user — an unpartitioned RANGE/running-sum window would serialize the
  // whole events table onto one task.
  test("q37/q38 event windows are partitioned by user") {
    for (name <- Seq("q37_range_window", "q38_sessionize")) {
      val df = RelationalQueries.queries(name)(spark, sf)
      val windows = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
      assert(windows.nonEmpty, s"$name lost its window")
      windows.foreach(w =>
        assert(w.partitionSpec.nonEmpty, s"$name window is unpartitioned:\n$w"))
    }
  }

  // l40's only shuffle is the canonical-text window; it must stay
  // partitioned by norm (an unpartitioned window would serialize the
  // corpus onto one task).
  test("l40 text normalize windows are partitioned by the canonical text") {
    val df = LlmQueries.queries("l40_text_normalize")(spark, sf)
    val windows = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "l40 lost its window")
    windows.foreach(w =>
      assert(w.partitionSpec.nonEmpty, s"l40 window is unpartitioned:\n$w"))
  }

  // q47's power sums must be ONE hash aggregate with a pruned scan —
  // the whole point of the formulation is a single map-side-combining
  // pass that ships 5 longs per group.
  test("q47 moments plan is one aggregation over a two-column scan") {
    val df = RelationalQueries.queries("q47_moments")(spark, sf)
    val p = planOf(df)
    assertNoAllPairs("q47", df)
    assert(p.contains("HashAggregate"), s"q47 lost its hash aggregate:\n$p")
    val read = "ReadSchema: [^\n]*".r.findFirstIn(p).getOrElse("")
    assert(read.contains("l_returnflag") && read.contains("l_quantity")
      && !read.contains("l_extendedprice"),
      s"q47 scan not pruned to (l_returnflag, l_quantity): $read")
  }

  // l42 scores bigrams through equi-joins on the bigram key; the only
  // nested-loop is the 1-row corpus total broadcast (1xN by design).
  test("l42 bigram surprisal joins frequencies on the bigram key") {
    val df = LlmQueries.queries("l42_bigram_surprisal")(spark, sf)
    val p = planOf(df)
    assert(!p.contains("CartesianProduct"), s"l42 has a data cross product:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"l42 lost its bigram equi-join:\n$p")
  }

  // l43's scoring side must broadcast BOTH unigram count tables (they are
  // vocabulary-bounded at any corpus size).
  test("l43 pmi collocations broadcast the unigram count tables") {
    val df = LlmQueries.queries("l43_pmi_collocations")(spark, sf)
    val p = planOf(df)
    assert(!p.contains("CartesianProduct"), s"l43 has a data cross product:\n$p")
    val n = "BroadcastHashJoin".r.findAllIn(p).length
    assert(n >= 2, s"l43 expected >=2 broadcast unigram joins, found $n:\n$p")
  }

  // l44's corpus-sized window must be partitioned by the quality level;
  // the single allowed unpartitioned window runs over the bounded
  // (<=101-row) level table only.
  test("l44 token budget: corpus window partitioned, level window bounded") {
    val df = LlmQueries.queries("l44_token_budget")(spark, sf)
    val windows = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "l44 lost its windows")
    val unpartitioned = windows.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.size <= 1,
      s"l44 has ${unpartitioned.size} unpartitioned windows (only the level table's is allowed)")
    // the unpartitioned one must sit above an aggregation (the level
    // table), never directly over the corpus scan
    unpartitioned.foreach { w =>
      assert(w.toString.contains("lvl_tokens") ||
        w.child.toString.contains("HashAggregate"),
        s"l44 unpartitioned window is not over the aggregated level table:\n$w")
    }
    assert(windows.exists(_.partitionSpec.nonEmpty),
      "l44 boundary running sum lost its per-level partitioning")
  }

  // l45's argmin must be keyed by vec_id (embarrassingly parallel); the
  // centroid side is a bounded 16-row broadcast by design.
  test("l45 cluster balance aggregates the argmin (no rank window)") {
    val df = LlmQueries.queries("l45_cluster_balance")(spark, sf)
    val windows = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(windows.isEmpty,
      s"l45 regained ${windows.size} WindowExec node(s) — argmin must stay a min_by aggregation")
    assert(planOf(df).contains("min_by") || planOf(df).contains("minby"),
      s"l45 argmin aggregation missing:\n${planOf(df).take(1500)}")
  }

  // q53's arg-max must be ONE hash aggregate over the scan — max_by
  // carries (key, value) partials, so no join, window, or second pass.
  test("q53 argmax is a single aggregate: no join, no window") {
    val df = RelationalQueries.queries("q53_argmax")(spark, sf)
    val p = planOf(df)
    assert(!p.contains("Join"), s"q53 grew a join:\n$p")
    val windows = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(windows.isEmpty, s"q53 grew a window:\n$p")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"),
      s"q53 lost its aggregate:\n$p")
  }

  // q54's five second-moment sums must come from one map-side-combining
  // aggregate pass — no join, no window, no second scan.
  test("q54 co-movement is one aggregate pass over one scan") {
    val df = RelationalQueries.queries("q54_comovement")(spark, sf)
    val p = planOf(df)
    assert(!p.contains("Join"), s"q54 grew a join:\n$p")
    assert("Scan parquet".r.findAllIn(p).length <= 1,
      s"q54 scans lineitem more than once:\n$p")
  }

  // q55 must aggregate the fact table FIRST and broadcast the O(days)
  // result under the generated spine — the fact side is never the build
  // side and is scanned exactly once.
  test("q55 date spine broadcasts the per-day aggregate") {
    val df = RelationalQueries.queries("q55_date_spine")(spark, sf)
    val p = planOf(df)
    assert(p.contains("BroadcastHashJoin"),
      s"q55 lost the broadcast of the per-day aggregate:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"q55 fell back to a sort-merge join:\n$p")
  }

  // l48 chunking is row-local by design: split, generated-index explode,
  // slice — no join, no aggregate before the output sort.
  test("l48 sliding chunking has no join and no aggregate") {
    val df = LlmQueries.queries("l48_chunk_sliding")(spark, sf)
    val p = planOf(df)
    assert(!p.contains("Join"), s"l48 grew a join:\n$p")
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"),
      s"l48 grew an aggregate:\n$p")
    assert(p.contains("Generate"), s"l48 lost its explode:\n$p")
  }

  // q56's self-join must be a co-partitioned equi-join on the order key —
  // never an all-pairs product (the `<` is a post-join filter, not the
  // join condition's only clause).
  test("q56 basket pairs self-join is equi on the order key") {
    assertNoAllPairs("q56", RelationalQueries.queries("q56_basket_pairs")(spark, sf))
  }

  // l50's candidate generation is the prefix-filter posting-list probe —
  // equi-joins on the gram key only, never all pairs (that being the
  // entire point of prefix filtering).
  test("l50 containment candidates come from equi-joins only") {
    assertNoAllPairs("l50", LlmQueries.queries("l50_containment")(spark, sf))
  }

  // Round 11: l50's prefix selection is row-local array work over the
  // cached gram arrays — the df rarity window (and with it every
  // posting-table window pass) is gone. A WindowExec reappearing here
  // means someone reintroduced a per-gram ranking over the 15M-row
  // posting table.
  test("l50 containment plans without any window") {
    val df = LlmQueries.queries("l50_containment")(spark, sf)
    val windows = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(windows.isEmpty, s"l50 regained a window:\n${windows.mkString("\n")}")
  }

  // Round 11: the three shingle-set re-scorers are served from the
  // persisted DedupIndex artifact — the plan must SCAN shingle_sets,
  // not rebuild the set off the documents scan (the round-9 regression:
  // a per-query rebuild inherits the raw scan's parallelism).
  test("l05/l41/l59 read the persisted shingle_sets artifact") {
    for (name <- Seq("l05_ngram_jaccard", "l41_lsh_audit", "l59_contrastive_pairs")) {
      val p = planOf(LlmQueries.queries(name)(spark, sf))
      assert(p.contains("shingle_sets"),
        s"$name does not scan the persisted shingle-set table:\n${p.take(1500)}")
    }
  }

  // l21 scores LSH candidates only, through equi-joins; the length-band
  // filter must sit in the plan (it is what keeps false candidates out
  // of the O(len^2) DP).
  test("l21 edit distance: equi-joins only, length-band filter present") {
    val df = LlmQueries.queries("l21_edit_distance")(spark, sf)
    assertNoAllPairs("l21", df)
    assert(planOf(df).contains("abs("),
      s"l21 lost its length-band pre-filter:\n${planOf(df).take(1500)}")
  }

  // The ANN top-5 rankings run through the custom bounded-heap operator
  // (partial pass below the key shuffle), not a full per-query sort of
  // every candidate; the only remaining window runs over the 5-bounded
  // rows to attach ranks.
  test("l06/l13/l14 rank through the custom TopK partial/final operators") {
    for (name <- Seq("l06_cosine_topk", "l13_ann_topk", "l14_ivf_topk")) {
      val p = planOf(LlmQueries.queries(name)(spark, sf))
      assert(p.contains("TopKPerKeyPartial") && p.contains("TopKPerKeyFinal"),
        s"$name does not use the custom TopK operator:\n${p.take(1500)}")
    }
  }

  // l66's island window must stay partitioned by doc_id — an
  // unpartitioned gaps-and-islands window would serialize the corpus's
  // repeated positions onto one task.
  test("l66 repeat spans: island window partitioned by doc, no all-pairs") {
    val df = LlmQueries.queries("l66_repeat_spans")(spark, sf)
    assertNoAllPairs("l66", df)
    val windows = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "l66 lost its island window")
    windows.foreach(w =>
      assert(w.partitionSpec.nonEmpty, s"l66 window is unpartitioned:\n$w"))
  }

  // q28's exact quantiles aggregate the (group, value) histogram first;
  // every window must run over aggregated rows (the tiny histogram),
  // never over raw lineitem (the old 3-task-sort shape).
  test("q28 quantile windows run over the histogram aggregate") {
    val df = RelationalQueries.queries("q28_quantiles")(spark, sf)
    val windows = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "q28 lost its cumulative window")
    windows.foreach { w =>
      assert(w.child.toString.contains("HashAggregate"),
        s"q28 window runs over raw rows, not the histogram:\n$w")
    }
  }

  // q58's sliding distinct set must stay partitioned by event type — an
  // unpartitioned frame would serialize the whole corpus onto one task.
  test("q58 distinct window is partitioned by event type") {
    val df = RelationalQueries.queries("q58_distinct_window")(spark, sf)
    val windows = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "q58 lost its window")
    windows.foreach(w =>
      assert(w.partitionSpec.nonEmpty, s"q58 window is unpartitioned:\n$w"))
  }

  // l51's global permutation rank must come from the two-phase bucket
  // decomposition: the only unpartitioned window runs over the <=256-row
  // bucket-offset table (above an aggregation), never the corpus.
  test("l51 training shuffle: corpus windows partitioned, offset window over the bucket agg") {
    val df = LlmQueries.queries("l51_training_shuffle")(spark, sf)
    val windows = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "l51 lost its windows")
    val unpartitioned = windows.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.size <= 1,
      s"l51 has ${unpartitioned.size} unpartitioned windows")
    unpartitioned.foreach { w =>
      assert(w.child.toString.contains("HashAggregate"),
        s"l51 unpartitioned window is not over the bucket aggregate:\n$w")
    }
    assert(windows.exists(_.partitionSpec.nonEmpty),
      "l51 in-bucket rank lost its partitioning")
  }

  // l49 is a pure row-local projection — nothing but scan, project, sort.
  test("l49 compression ratio is a shuffle-free projection") {
    val df = LlmQueries.queries("l49_compression_ratio")(spark, sf)
    val p = planOf(df)
    assert(!p.contains("Join") && !p.contains("HashAggregate"),
      s"l49 grew a join/aggregate:\n$p")
    val windows = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(windows.isEmpty, s"l49 grew a window:\n$p")
  }

  // q59's whole point is that the interval θ-join is bucketized into an
  // equi-join on the hour bucket — a fallback to the nested-loop form
  // would be quadratic at stream scale.
  test("q59 interval join is an equi-join on the bucket, not a nested loop") {
    assertNoAllPairs("q59", RelationalQueries.queries("q59_interval_join")(spark, sf))
  }

  // l52 winnowing selects per-window minima with a window PARTITIONED by
  // document — row-local per doc; an unpartitioned window would serialize
  // the corpus through one task.
  test("l52 winnowing window is partitioned by document") {
    val df = LlmQueries.queries("l52_winnowing")(spark, sf)
    val windows = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "l52 lost its window")
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "l52 plan has an unpartitioned WindowExec node")
    assertNoAllPairs("l52", df)
  }

  // l53 assigns pseudo-labels against a BROADCAST |labels|-row centroid
  // table (the l28 discipline) — a shuffled cartesian would move the
  // corpus |labels| times; the argmin window must stay keyed by vector.
  test("l53 pseudo-labeling broadcasts centroids and partitions the argmin") {
    val df = LlmQueries.queries("l53_pseudo_label")(spark, sf)
    val p = planOf(df)
    assert(p.contains("Broadcast"), s"l53 lost the centroid broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"l53 plans a non-broadcast cartesian:\n$p")
    val unpartitioned = df.queryExecution.sparkPlan
      .collect { case w: WindowExec => w }.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.isEmpty,
      s"l53 plan has ${unpartitioned.size} unpartitioned WindowExec node(s)")
  }

  // l54's overlap/sum joins are equi-joins on the query/neighbor keys;
  // only the declared-bounded exact audit sample may cross-product (it
  // embeds l06, the contract-exempt brute-force baseline).
  test("l54 ANN recall audit joins overlap on equi keys") {
    val df = LlmQueries.queries("l54_ann_recall")(spark, sf)
    val p = planOf(df)
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"), s"l54 lost its equi-joins:\n$p")
  }

  // l55's global top-10 must plan as TakeOrderedAndProject (per-partition
  // local top-k merged on the driver) — a full global sort of the scored
  // corpus would be the classic retrieval scale bug. The only window runs
  // AFTER the limit, over 10 rows.
  test("l55 BM25 top-k is TakeOrderedAndProject, not a global sort") {
    val df = LlmQueries.queries("l55_bm25")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"l55 lost the sort-limit top-k plan:\n$p")
  }

  // q60's lead window and aggregate are both keyed by event type.
  test("q60 time-weighted average windows are partitioned by type") {
    val df = RelationalQueries.queries("q60_time_weighted")(spark, sf)
    val windows = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "q60 lost its lead window")
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "q60 plan has an unpartitioned WindowExec node")
  }

  // m07 is one frame explode + codegen'd byte folds + one hash agg —
  // no join anywhere.
  test("m07 audio features plan has no join") {
    val df = graft.media.MediaQueries.queries("m07_audio_features")(spark, sf)
    val p = planOf(df)
    assert(!p.contains("Join"), s"m07 grew a join:\n$p")
    assert(p.contains("binary_byte_energy"),
      s"m07 lost the codegen'd energy fold:\n$p")
  }

  // l56's kNN edges come from the bucket equi-join and every PageRank
  // round is equi-joins + a hash agg; the rank window is keyed by source
  // vector. A cartesian or unpartitioned window would be the collapse of
  // the whole design.
  test("l56 kNN PageRank: bucket equi-join edges, partitioned rank window") {
    val df = LlmQueries.queries("l56_knn_pagerank")(spark, sf)
    val p = planOf(df)
    assert(!p.contains("CartesianProduct"),
      s"l56 plans a cartesian:\n$p")
    val unpartitioned = df.queryExecution.sparkPlan
      .collect { case w: WindowExec => w }.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.isEmpty,
      s"l56 plan has ${unpartitioned.size} unpartitioned WindowExec node(s)")
  }

  // q61's stage joins are keyed by user; the only nested-loop joins are
  // the 1-row aggregate combinations at the end (bounded by construction).
  test("q61 funnel stage joins are equi on the user key") {
    val df = RelationalQueries.queries("q61_funnel")(spark, sf)
    val p = planOf(df)
    assert(!p.contains("CartesianProduct"), s"q61 plans a raw cartesian:\n$p")
    assert(p.contains("Join") && p.contains("user_id"),
      s"q61 lost its user-keyed stage joins:\n$p")
  }

  // q62 cohort: one user-keyed equi-join, no all-pairs anywhere.
  test("q62 cohort joins activity to cohorts on the user key") {
    assertNoAllPairs("q62", RelationalQueries.queries("q62_cohort")(spark, sf))
  }

  // q63's running share is a brand-partitioned window and the totals
  // join back via broadcast.
  test("q63 ABC class: partitioned running sum, broadcast totals") {
    val df = RelationalQueries.queries("q63_abc_class")(spark, sf)
    assertNoAllPairs("q63", df)
    val unpartitioned = df.queryExecution.sparkPlan
      .collect { case w: WindowExec => w }.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.isEmpty,
      s"q63 plan has ${unpartitioned.size} unpartitioned WindowExec node(s)")
    assert(planOf(df).contains("BroadcastHashJoin"),
      s"q63 lost the broadcast totals join:\n${planOf(df)}")
  }

  // l57's top-50 must stay TakeOrderedAndProject; the rank window runs
  // after the limit, over 50 rows.
  test("l57 priority sample top-k is TakeOrderedAndProject") {
    val df = LlmQueries.queries("l57_priority_sample")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"l57 lost the sort-limit top-k plan:\n$p")
  }

  // l58's 4×1024 counter table must broadcast into the heavy-hitter
  // probe, and the top-20 candidate selection must be a sort-limit
  // (TakeOrderedAndProject), never a global sort.
  test("l58 CMS heavy hitters: broadcast counters, sort-limit candidates") {
    val df = LlmQueries.queries("l58_cms_heavy")(spark, sf)
    assertNoAllPairs("l58", df)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"l58 lost the broadcast counter-table join:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"l58 lost the sort-limit candidate plan:\n$p")
  }

  // q64's rank and count windows must both be partitioned by the group
  // (grouped quantiles never pay a global sort).
  test("q64 equi-depth histogram windows are group-partitioned") {
    val df = RelationalQueries.queries("q64_equidepth")(spark, sf)
    assertNoAllPairs("q64", df)
    val unpartitioned = df.queryExecution.sparkPlan
      .collect { case w: WindowExec => w }.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.isEmpty,
      s"q64 plan has ${unpartitioned.size} unpartitioned WindowExec node(s)")
  }

  // q65's two rank passes must both be group-partitioned, and the r19
  // single-exchange formulation must hold: the medians attach as window
  // aggregates over the SAME group partitioning, so the plan has no join
  // at all (previously: two groupBy + broadcast-join round-trips and
  // three scans of orders).
  test("q65 MAD outliers: partitioned rank windows, join-free single exchange") {
    val df = RelationalQueries.queries("q65_mad_outliers")(spark, sf)
    assertNoAllPairs("q65", df)
    val unpartitioned = df.queryExecution.sparkPlan
      .collect { case w: WindowExec => w }.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.isEmpty,
      s"q65 plan has ${unpartitioned.size} unpartitioned WindowExec node(s)")
    assert(!planOf(df).contains("Join"),
      s"q65 regained a join (single-exchange window formulation lost):\n${planOf(df)}")
  }

  // l60's idf table broadcasts and the pair scoring stays equi-join
  // only (candidates pre-pruned by LSH, never all-pairs).
  test("l60 tf-idf cosine: broadcast idf, pair scoring never cartesian") {
    val df = LlmQueries.queries("l60_tfidf_cosine")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // The only nested-loop allowed is the l55-style 1-row corpus-count
    // broadcast (O(|vocab|)); a CartesianProduct anywhere means the
    // pair scoring degenerated to all-pairs.
    assert(!p.contains("CartesianProduct"),
      s"l60 plan contains CartesianProduct (all-pairs):\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"l60 lost the broadcast idf join:\n$p")
  }

  // l59's negatives come from a bucket-partitioned lead window (never a
  // global sort window) and the positive/negative construction stays
  // equi-join-only.
  test("l59 contrastive pairs: partitioned windows, no all-pairs") {
    val df = LlmQueries.queries("l59_contrastive_pairs")(spark, sf)
    assertNoAllPairs("l59", df)
    val unpartitioned = df.queryExecution.sparkPlan
      .collect { case w: WindowExec => w }.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.isEmpty,
      s"l59 plan has ${unpartitioned.size} unpartitioned WindowExec node(s)")
  }

  // l61's 512-row derived sign matrix must re-enter as a broadcast (the
  // exploded element stream never shuffles for the join), and nothing in
  // the plan is all-pairs.
  test("l61 random projection: sign matrix broadcasts, no all-pairs") {
    val df = LlmQueries.queries("l61_random_projection")(spark, sf)
    assertNoAllPairs("l61", df)
    assert(planOf(df).contains("BroadcastHashJoin"),
      s"l61 lost the broadcast sign-matrix join:\n${planOf(df)}")
  }

  // l62 is entirely row-local: no joins and no windows anywhere in the
  // plan — the only exchange is the final oracle-comparison sort.
  test("l62 int8 quantization plan has zero joins and zero windows") {
    val df = LlmQueries.queries("l62_int8_quant")(spark, sf)
    val p = planOf(df)
    assert(!p.contains("Join"), s"l62 plan unexpectedly joins:\n$p")
    val windows = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(windows.isEmpty, s"l62 plan has ${windows.size} WindowExec node(s)")
  }

  // l63's reconciliation join is a full outer on the id key — the join
  // type that must NOT broadcast (both sides surface unmatched rows) —
  // and nothing in the plan is all-pairs.
  test("l63 snapshot diff: keyed FullOuter join, no all-pairs") {
    val df = LlmQueries.queries("l63_snapshot_diff")(spark, sf)
    assertNoAllPairs("l63", df)
    val p = planOf(df)
    assert(p.contains("FullOuter"), s"l63 lost the full outer reconciliation join:\n$p")
  }

  // l64's novelty probe must be a gram-keyed anti EQUI-join (never a
  // nested loop). The corpus gram set is not broadcast() by the query;
  // at sf0.001 the optimizer's stats still choose a broadcast build
  // (it is under the 10 MB threshold here) — the point is that the
  // decision is left to stats, so an over-threshold corpus at real
  // scale shuffles by gram instead.
  test("l64 batch novelty probes via a gram-keyed anti equi-join") {
    val df = LlmQueries.queries("l64_batch_novelty")(spark, sf)
    assertNoAllPairs("l64", df)
    val p = planOf(df)
    assert(p.contains("LeftAnti"), s"l64 lost the anti-join novelty probe:\n$p")
    // the corpus side is the persisted gram artifact, not a per-run
    // rebuild off the documents scan (and never the broadcast side —
    // it is corpus-sized)
    assert(p.contains("corpus_grams"),
      s"l64 no longer reads the persisted corpus gram set:\n$p")
  }

  test("l16/l32 serve their gram tables from the persisted gram index") {
    for (name <- Seq("l16_contamination", "l32_source_overlap")) {
      val p = planOf(LlmQueries.queries(name)(spark, sf))
      assert(p.contains("gram_arrs"),
        s"$name no longer reads the persisted gram_arrs artifact:\n$p")
      assert(!p.contains("xxhash64"),
        s"$name re-hashes grams inline instead of reading the artifact:\n$p")
    }
    // l32 mines the source-pair matrix with ZERO joins: one groupBy(g)
    // fold to bounded source sets + combinatorial pair expansion — a
    // corpus-sized (src, gram) self-join would be 3 corpus-scale
    // shuffles where one suffices.
    val p32 = planOf(LlmQueries.queries("l32_source_overlap")(spark, sf))
    assert(!p32.contains("Join"),
      s"l32 reintroduced a join — the pair matrix should fold via collect_set:\n$p32")
  }

  test("m06/m09/m12 read the persisted fingerprint artifacts, never payloads") {
    for (name <- Seq("m06_media_hamming", "m09_media_clusters", "m12_paired_dedup")) {
      val df = graft.media.MediaQueries.queries(name)(spark, sf)
      val p = planOf(df)
      assert(!p.contains("payload"),
        s"$name re-scans media payloads instead of the fingerprint index:\n$p")
      assertNoAllPairs(name, df)
    }
  }

  test("l71 serves merged pairs from the index: no hashing in the measured plan") {
    val p = planOf(LlmQueries.queries("l71_merge_parity")(spark, sf))
    assert(!p.contains("md5") && !p.contains("minhash"),
      s"l71 recomputes signatures instead of reading the merged index:\n$p")
  }

  test("l72 merged-ANN search is dynamically partition-pruned") {
    val p = planOf(LlmQueries.queries("l72_ann_merge_parity")(spark, sf))
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"l72 list scan is not dynamically pruned:\n$p")
  }

  test("l74 provenance rollup is index-served: no signature hashing in the plan") {
    val p = planOf(LlmQueries.queries("l74_dedup_provenance")(spark, sf))
    assert(!p.contains("minhash") && !p.contains("md5"),
      s"l74 recomputes signatures instead of riding the index-served CC labels:\n$p")
  }

  test("l75 banding sweep scores from the signatures artifact, never re-hashes text") {
    // the candidate bucket join itself sits behind the eager
    // localCheckpoint; what the measured plan must show is the audit
    // restriction and signature-artifact scans (scoring is lane
    // agreement over the persisted sigs — no md5 anywhere means no
    // text shingling and no banding recompute in the measured plan)
    val p = planOf(LlmQueries.queries("l75_banding_sweep")(spark, sf))
    assert(p.contains("% 13"),
      s"l75 lost its audit-subset restriction (corpus x corpus sweep):\n$p")
    assert(p.contains("signatures"),
      s"l75 no longer scores from the persisted signatures artifact:\n$p")
    assert(!p.contains("md5"),
      s"l75 re-hashes text in the measured plan:\n$p")
  }

  test("l31 fingerprints come through the one-pass simhash32 kernel") {
    val p = planOf(LlmQueries.queries("l31_simhash_pairs")(spark, sf))
    assert(p.contains("simhash32"),
      s"l31 no longer uses the codegen'd SimHash32 kernel:\n$p")
    assert(!p.contains("aggregate("),
      s"l31 regressed to interpreted aggregate() bit folds:\n$p")
  }

  test("q68 bucket-histogram median: broadcast spine join, bucket-partitioned windows") {
    val df = RelationalQueries.queries("q68_bucket_median")(spark, sf)
    assertNoAllPairs("q68", df)
    val p = planOf(df)
    assert(p.contains("BroadcastHashJoin"),
      s"q68's bucket-spine join no longer broadcasts (the x12 contribution " +
        s"stream would shuffle before combining):\n$p")
    // every window is partitioned by (event_type, tb) — never a global
    // single-partition window over the merged histogram
    val windows = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, s"q68 lost its windowed median extraction:\n$p")
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"q68 has an unpartitioned (single-task) window:\n$p"))
  }

  test("q69 HLL window: broadcast spine joins, keyed aggs, no window operator at all") {
    val df = RelationalQueries.queries("q69_hll_window")(spark, sf)
    assertNoAllPairs("q69", df)
    val p = planOf(df)
    assert(p.contains("BroadcastHashJoin"),
      s"q69's bucket-spine join no longer broadcasts (the x12 sketch " +
        s"stream would shuffle before combining):\n$p")
    // the whole point of the sketch formulation: the trailing-hour merge
    // is hash aggregation over bounded register state — no window
    // function (q58's exact form is the one that pays a frame per row)
    val windows = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(windows.isEmpty,
      s"q69 should merge sketches with keyed aggs, not window frames:\n$p")
  }

  test("l83 cell balance reads ONLY the lists' partition column") {
    val df = LlmQueries.queries("l83_cell_balance")(spark, sf)
    val p = planOf(df)
    // ReadSchema must be empty/struct<> — occupancy comes from the c_id
    // partition DIRECTORIES plus row counts, never the embedding bytes
    assert(!p.contains("embedding"),
      s"l83 reads embedding data for what is a partition-column census:\n$p")
  }

  test("l89 BPE training: 1-row winner broadcasts into the rewrite, no sort-merge") {
    // the declared query returns an eagerly-checkpointed 9-row result
    // (its plan is a checkpoint scan); the pin reads the same chain
    // built lazily
    val df = LlmQueries.bpeTrainPlanFrame(spark, sf)
    val p = planOf(df)
    // each round's elected pair reaches the vocabulary rewrite as a
    // BROADCAST of one row (a BroadcastNestedLoopJoin against a
    // limit(1) frame — the bounded-broadcast cross pattern, NOT an
    // all-pairs product); a shuffled join here would re-key the whole
    // vocabulary per round
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"l89's winner no longer broadcasts into the merge rewrite:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"l89 sort-merge-joins somewhere in a vocab-bounded chain:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"l89 built a non-broadcast cartesian product:\n$p")
  }

  test("l91 BPE encode: corpus explode joins the vocabulary token counts by key") {
    val df = LlmQueries.bpeEncodePlanFrame(spark, sf)
    val p = planOf(df)
    assert(!p.contains("CartesianProduct"),
      s"l91 built a cartesian product:\n$p")
    // the per-doc accounting is a hash aggregation, not a window
    assert(p.contains("HashAggregate"),
      s"l91 lost its per-document hash agg:\n$p")
    assert(df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"l91 pays a window for what is keyed aggregation:\n$p")
  }

  test("l90 streamed IVFADC: broadcast probe/ADC tables, no non-broadcast product") {
    val df = LlmQueries.queries("l90_stream_ivfpq")(spark, sf)
    val p = planOf(df)
    // the bounded centroid table broadcasts into the probe (the
    // BNLJ-against-broadcast-bounded pattern searchIvfPq shares with
    // l77); the ADC and membership joins are keyed broadcasts
    assert(p.contains("BroadcastHashJoin"),
      s"l90's ADC/membership joins no longer broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"l90 built a non-broadcast cartesian product:\n$p")
  }

  // The tombstone deletion vector's two scale claims: an index with no
  // tombstones pays NOTHING (identity plan — no anti-join at all), and
  // a tombstoned index pays a BROADCAST anti-join (the corpus side
  // never shuffles for a takedown-sized id set).
  test("tombstone filter: identity plan when absent, broadcast anti-join when present") {
    val dir = java.nio.file.Files.createTempDirectory("plants").toString
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    graft.llm.DedupIndex.build(corpus, s"$dir/idx")
    val before = planOf(graft.llm.DedupIndex.candidatePairs(spark, s"$dir/idx"))
    assert(!before.contains("Join"),
      s"tombstone-free pairs read pays a join it should not:\n$before")
    graft.llm.DedupIndex.delete(spark, s"$dir/idx",
      corpus.limit(5).select("doc_id"))
    val p = planOf(graft.llm.DedupIndex.candidatePairs(spark, s"$dir/idx"))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"tombstone filter is not a broadcast anti-join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"tombstone filter shuffles the corpus side:\n$p")
    // the ANN serving path keeps its probe-pruned shape with the
    // anti-join riding below the pruned list read
    val ivfDir = java.nio.file.Files.createTempDirectory("planivf").toString
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    graft.llm.VectorIndex.buildIvf(embs, s"$ivfDir/idx")
    graft.llm.VectorIndex.deleteIvf(spark, s"$ivfDir/idx",
      embs.limit(5).select("vec_id"))
    val q = embs.limit(2).select(
      org.apache.spark.sql.functions.col("vec_id").as("query_id"),
      org.apache.spark.sql.functions.col("embedding"))
    val sp = planOf(graft.llm.VectorIndex.searchIvf(spark, s"$ivfDir/idx", q, 4, 5))
    assert(sp.contains("LeftAnti"),
      s"tombstoned searchIvf lost its deletion-vector anti-join:\n$sp")
    assert(!sp.contains("CartesianProduct"),
      s"tombstoned searchIvf built a product:\n$sp")
  }

  test("IVFADC generation time travel: live serves the aligned layout; the historical read serves the RETAINED copy, never the current-keyed one") {
    val dir = java.nio.file.Files.createTempDirectory("planpqasof").toString
    val idx = s"$dir/idx"
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = embs.where(org.apache.spark.sql.functions.col("vec_id") >= 10)
    graft.llm.VectorIndex.buildIvf(corpus, idx)
    graft.llm.VectorIndex.buildPq(corpus, idx)
    graft.llm.VectorIndex.alignPqToLists(spark, idx)
    graft.llm.VectorIndex.retrainIvf(spark, idx, swapMode = Some("pointer"))
    graft.llm.VectorIndex.alignPqToLists(spark, idx)
    val q = embs.limit(2).select(
      org.apache.spark.sql.functions.col("vec_id").as("query_id"),
      org.apache.spark.sql.functions.col("embedding"))
    val liveP = planOf(graft.llm.VectorIndex.searchIvfPq(spark, idx, q, 4, 5))
    assert(liveP.contains("pq_codes_by_list"),
      s"the live ADC read lost the aligned fast path:\n$liveP")
    assert(!liveP.contains("_gen/pq_codes_by_list"),
      s"the live ADC read consulted a retained HISTORICAL copy:\n$liveP")
    // the live artifact is keyed by the CURRENT quantizer's c_ids — a
    // historical read consulting it would score against a different
    // key space. The gate-complete copy the flip superseded was
    // RETAINED (keyed by the superseded quantizer — this read's key
    // space), so the historical plan is the probe-pruned scan of the
    // retained artifact: the live read's asymptotics, no membership
    // join over the full code table
    val histP = planOf(
      graft.llm.VectorIndex.searchIvfPqAsOf(spark, idx, q, 4, 5, back = 1))
    assert(histP.contains("_gen/pq_codes_by_list/g0"),
      s"the historical ADC read lost the retained aligned fast path:\n$histP")
    assert(!histP.contains(s"$idx/pq_codes_by_list"),
      s"the historical ADC read consulted the current-keyed aligned layout:\n$histP")
    assert(histP.linesIterator.exists(l =>
      l.contains("_gen/pq_codes_by_list/g0") && l.contains("PartitionFilters")
        && l.contains("c_id")),
      s"the retained aligned scan is not partition-pruned on c_id:\n$histP")
    assert(!histP.contains("CartesianProduct"),
      s"the historical ADC read built a product:\n$histP")
    // a merge drops the aligned gate BEFORE the flip retains anything:
    // that history has no aligned copy and must take the membership
    // join over the pruned historical lists (the l80 discipline)
    val delta = embs.where(org.apache.spark.sql.functions.col("vec_id") < 10)
      .withColumn("vec_id",
        org.apache.spark.sql.functions.col("vec_id") + 1000000L)
    graft.llm.VectorIndex.mergeIvf(spark, idx, delta, mergeId = Some("pp-i"))
    graft.llm.VectorIndex.mergePq(spark, idx, delta, mergeId = Some("pp-p"))
    graft.llm.VectorIndex.retrainIvf(spark, idx, swapMode = Some("pointer"))
    val fbP = planOf(
      graft.llm.VectorIndex.searchIvfPqAsOf(spark, idx, q, 4, 5, back = 1))
    assert(!fbP.contains("pq_codes_by_list"),
      s"an un-aligned history served a stale aligned copy:\n$fbP")
    assert(!fbP.contains("CartesianProduct"),
      s"the fallback historical read built a product:\n$fbP")
    // the non-retaining flip deepened g0 past the retainGens=1 window;
    // the NEXT entry's hygiene pass (not the flip — in-flight readers)
    // trims it in lockstep with the lists generations
    graft.llm.IndexMaintenance.recoverStages(spark, idx,
      Seq("centroids", "lists"))
    assert(!graft.util.Fs.exists(spark, s"$idx/_gen/pq_codes_by_list/g0"),
      "hygiene leaked an out-of-window aligned copy")
  }

  test("batch-axis ADC snapshot: partition filters on BOTH grown halves, no product") {
    val dir = java.nio.file.Files.createTempDirectory("planpqbatch").toString
    val idx = s"$dir/idx"
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = embs.where(org.apache.spark.sql.functions.col("vec_id") >= 10)
    graft.llm.VectorIndex.trainQuantizer(corpus, idx)
    graft.llm.VectorIndex.trainPqCodebook(corpus, idx)
    graft.streaming.VecStream.ingestBatch(
      corpus.where(org.apache.spark.sql.functions.col("vec_id") % 2 === 0),
      idx, 0L, pqCodes = true)
    graft.streaming.VecStream.ingestBatch(
      corpus.where(org.apache.spark.sql.functions.col("vec_id") % 2 === 1),
      idx, 1L, pqCodes = true)
    val q = embs.limit(2).select(
      org.apache.spark.sql.functions.col("vec_id").as("query_id"),
      org.apache.spark.sql.functions.col("embedding"))
    val p = planOf(
      graft.llm.VectorIndex.searchIvfPqAsOfBatch(spark, idx, q, 4, 5, n = 0L))
    // the batch_id <= n predicate must reach BOTH parquet scans (lists
    // AND pq_codes) as a partition-directory filter — the snapshot's
    // I/O is proportional to the covered batches, never the frontier
    val scanHits = p.linesIterator
      .filter(l => l.contains("PartitionFilters") && l.contains("batch_id"))
      .size
    assert(scanHits >= 2,
      s"batch filter reached only $scanHits of the 2 grown-half scans:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"batch-axis ADC read built a product:\n$p")
  }

  test("l97 OOV encode: merge replay never touches the corpus; accounting is keyed aggregation") {
    val df = LlmQueries.bpeOovPlanFrame(spark, sf)
    val p = planOf(df)
    // the merge replay runs over the DISTINCT-word frame and reaches
    // the corpus only through keyed joins — no product anywhere
    assert(!p.contains("CartesianProduct"),
      s"l97 built a cartesian product:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"l97 built an all-pairs join:\n$p")
    // per-document accounting is hash aggregation, not a window
    assert(p.contains("HashAggregate"),
      s"l97 lost its per-document hash agg:\n$p")
    assert(df.queryExecution.sparkPlan.collect {
      case w: WindowExec => w
    }.isEmpty, s"l97 pays a window for what is keyed aggregation:\n$p")
  }
}
