package graft.llm

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** MinHash/LSH dedup-index LIFECYCLE — build once, persist, probe many:
  * the [[VectorIndex]] discipline applied to text near-duplicate
  * detection. Production corpus pipelines materialize the signature +
  * candidate-pair intermediate exactly once per corpus snapshot and then
  * run MANY consumers against it (Jaccard re-scoring, clustering, keep
  * policies, audits, contrastive mining, tf-idf verification);
  * regenerating the band self-join per consumer repeats the most
  * expensive stage of the whole dedup pipeline as many times as there
  * are consumers.
  *
  * Layout under `indexDir`:
  *   - `signatures/`  (doc_id, sig0..sig15) — one row per document; the
  *     16-lane MinHash sketch, ~130 B/doc regardless of document size.
  *     At 100 TB of text this table is ~100 GB — re-bandable under a new
  *     (bands × rows) tradeoff WITHOUT touching the corpus.
  *   - `bands/`       (doc_id, band, bkey) PARTITIONED BY bp, the first
  *     hex char of the banded key — 16 directories per corpus. A probe
  *     batch joins on (bp, band, bkey), so scan planning prunes to the
  *     band-key prefixes the batch actually hashes into — the
  *     VectorIndex partition-pruning idea with hash prefixes instead of
  *     IVF cells. At larger scale, widen the prefix (`prefixLen` on
  *     [[build]]/[[reband]]: 2 hex chars = 256 directories, 3 = 4096)
  *     so each band-file partition stays planner-sized; the width is
  *     self-described by the live layout ([[prefixLenOf]]) and probes
  *     and merges follow it automatically.
  *   - `pairs/`       (doc_a, doc_b) — the distinct same-bucket
  *     candidate pairs (doc_a < doc_b), the artifact all seven
  *     downstream dedup queries consume.
  *   - `shingle_sets/` (doc_id, sh_set) — each document's DISTINCT
  *     character-4-gram shingle set as an array, the exact-scoring
  *     companion to the probabilistic signatures: every candidate
  *     re-scorer (Jaccard, banding audits, contrastive labeling)
  *     needs this table, and building it is the single heaviest map
  *     stage of the pipeline (~|text| substrings + a distinct per
  *     doc). Materialized ONCE at build, spread across the cluster,
  *     consumed by key-equi-join — rebuilding it per consumer off the
  *     raw scan repeats the cost per query and inherits whatever
  *     (possibly single-file) parallelism the crawl was filed with.
  *
  * Every frame is produced by the SAME private builders the inline l03
  * formulation uses ([[LlmQueries.minhashSignatures]] /
  * [[LlmQueries.bandedOfSigs]] / [[LlmQueries.lshPairsUnordered]]), so
  * index-backed and inline results are identical by construction —
  * pinned cell-for-cell by DedupIndexSpec.
  */
object DedupIndex {

  /** Live path of a maintenance-swapped stage — pointer-resolved
    * ([[graft.util.Fs.stagePath]]): identical to `indexDir/<stage>`
    * until a pointer-protocol compact moves the stage under a `_gen/`
    * generation (object-store maintenance).
    */
  private def stg(spark: SparkSession, indexDir: String, stage: String): String =
    graft.util.Fs.stagePath(spark, indexDir, stage)

  /** Build and persist the index. `docs` needs (doc_id, text). Bands are
    * derived from the PERSISTED signatures (not recomputed from text),
    * and pairs from the persisted bands — each stage reads the previous
    * stage's artifact, so recomputation after a mid-build failure is
    * bounded to the stage that failed.
    *
    * With `resume = true`, stages whose output directory already carries
    * a committed `_SUCCESS` marker are SKIPPED outright: re-running
    * `build` after a failure redoes only the unfinished stages (hours of
    * signature hashing at corpus scale are not repeated because the
    * band self-join died). A partially-written stage has no `_SUCCESS`
    * and is overwritten. Default `false` rebuilds everything — the
    * correct semantics when the corpus snapshot may have changed.
    */
  def build(docs: DataFrame, indexDir: String, resume: Boolean = false,
      prefixLen: Int = 1): Unit = {
    val spark = docs.sparkSession
    // a rebuild into a layout with LIVE tombstones would silently
    // re-delete any rebuilt doc whose id is tombstoned (every reader
    // anti-joins the set) — fail loudly; fold first ([[compact]]) or
    // clear the leftover `_tombstones` with the index it belonged to
    require(!Tombstones.any(spark, indexDir),
      s"build into $indexDir: the layout carries live tombstones from a " +
        "previous index — rebuilt rows with tombstoned ids would be " +
        "silently filtered; run maintenance entries (compact) until the " +
        "retirement cohorts age out, or remove the directory before " +
        "rebuilding")
    def done(stage: String): Boolean =
      resume && graft.util.Fs.isFile(spark, s"${stg(spark, indexDir, stage)}/_SUCCESS")
    if (!done("signatures"))
      LlmQueries.minhashSignatures(docs)
        .write.mode(SaveMode.Overwrite).parquet(stg(spark, indexDir, "signatures"))
    if (!done("bands")) {
      LlmQueries.bandedOfSigs(signatures(spark, indexDir))
        .withColumn("bp", substring(col("bkey"), 1, prefixLen))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("bp").parquet(stg(spark, indexDir, "bands"))
      // the scheme control file travels WITH the stage directory (see
      // [[bandingOf]]); build always bands under the production scheme
      graft.util.Fs.writeString(spark,
        s"${stg(spark, indexDir, "bands")}/_SCHEME", "2x8")
    }
    if (!done("pairs")) {
      // Persist locally and release when the write commits: the banded
      // frame feeds both sides of the bucket self-join, and build may
      // run inside a long-lived driver (the shared-index cache) where a
      // leaked cache would outlive the stage.
      val banded = bands(spark, indexDir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try LlmQueries.lshSelfJoin(banded)
        .write.mode(SaveMode.Overwrite).parquet(stg(spark, indexDir, "pairs"))
      finally { banded.unpersist(); () }
    }
    if (!done("shingle_sets"))
      LlmQueries.docShingleSets(docs)
        .write.mode(SaveMode.Overwrite).parquet(stg(spark, indexDir, "shingle_sets"))
  }

  /** The persisted per-document MinHash signatures (doc_id, sig0..sig15).
    * Tombstone-filtered, like every public reader here ([[delete]]).
    */
  def signatures(spark: SparkSession, indexDir: String): DataFrame =
    Tombstones.filter(spark, indexDir,
      spark.read.parquet(stg(spark, indexDir, "signatures")), Seq("doc_id"))

  /** The persisted banded keys (doc_id, band, bkey). */
  def bands(spark: SparkSession, indexDir: String): DataFrame =
    Tombstones.filter(spark, indexDir,
      spark.read.parquet(stg(spark, indexDir, "bands"))
        .select("doc_id", "band", "bkey"), Seq("doc_id"))

  /** The persisted candidate pairs (doc_a, doc_b), doc_a < doc_b,
    * distinct, unordered — consumers impose their own order. A pair is
    * filtered when EITHER endpoint is tombstoned ([[delete]]).
    */
  def candidatePairs(spark: SparkSession, indexDir: String): DataFrame =
    Tombstones.filter(spark, indexDir,
      spark.read.parquet(stg(spark, indexDir, "pairs")),
      Seq("doc_a", "doc_b"))

  /** The persisted per-document distinct-shingle sets (doc_id, sh_set) —
    * the table every exact re-scorer joins against the candidate pairs.
    */
  def shingleSets(spark: SparkSession, indexDir: String): DataFrame =
    Tombstones.filter(spark, indexDir,
      spark.read.parquet(stg(spark, indexDir, "shingle_sets")), Seq("doc_id"))

  /** TIME-TRAVEL read of the candidate pairs: the pairs artifact as it
    * was `back` maintenance flips ago
    * ([[IndexMaintenance.stagePathAsOf]] — what the retention window
    * keeps on disk, served as a query). The one semantic override:
    * CURRENT tombstones still filter — a takedown beats time travel
    * (an erased document must not be served from history either), so
    * an asOf read is "that snapshot, minus everything since deleted".
    * Bounded by retention; fails loudly past it.
    */
  def candidatePairsAsOf(spark: SparkSession, indexDir: String,
      back: Int = 1): DataFrame =
    Tombstones.filter(spark, indexDir,
      spark.read.parquet(
        IndexMaintenance.stagePathAsOf(spark, indexDir, "pairs", back)),
      Seq("doc_a", "doc_b"))

  /** DELETE documents from the index — the takedown/GDPR verb, closing
    * the lifecycle (build / probe / merge / compact / reband / delete).
    * Tombstone semantics ([[Tombstones]]): the id set lands in O(|ids|)
    * under `_tombstones/`, every public reader and [[probe]] anti-joins
    * it from that moment (a deleted document stops producing candidate
    * pairs, signatures, bands, and shingle rows immediately — the pair
    * dies when EITHER endpoint is deleted), and the next [[compact]]
    * folds the removals into the artifacts and RETIRES the set (kept one
    * further maintenance cycle for retained-generation readers). Because
    * per-document artifacts are row-local derivations of their
    * document, the filtered index is EXACTLY the index a from-scratch
    * build over the surviving corpus would produce (DedupIndexSpec pins
    * this; l94 pins it against the DuckDB oracle).
    *
    * Re-adding a deleted id: [[merge]] fails LOUDLY while the id's
    * tombstone is live — folded or not (the rows would land
    * pre-deleted, a silent re-delete); the id frees once its
    * retirement cohort falls out of the retention window (one further
    * compact on a rename-protocol layout, retainGens + 1 on a
    * pointer-governed one).
    */
  def delete(spark: SparkSession, indexDir: String, ids: DataFrame): Unit =
    Tombstones.add(spark, indexDir, ids, "doc_id")

  /** Incremental probe: candidate (batch_doc, corpus_doc) pairs between
    * a NEW batch (doc_id, text) and the indexed corpus — the l39
    * incremental-dedup shape served from the persisted artifact. The
    * batch's banded keys join the corpus bands on (bp, band, bkey), so
    * only the band-file partitions matching the batch's key prefixes are
    * read; the corpus text is never touched.
    */
  def probe(spark: SparkSession, indexDir: String, batch: DataFrame): DataFrame = {
    // ONE snapshot-pinned bands path for the scheme read, the prefix
    // width, and the data read: resolving each separately could
    // straddle a concurrent reband flip and band the batch under the
    // OLD scheme against the NEW bands — zero matches, silently
    // ([[IndexMaintenance.snapshotStages]])
    val bandsPath = IndexMaintenance
      .snapshotStages(spark, indexDir, Seq("bands"))("bands")
    val (nb, rb) = bandingOfPath(spark, bandsPath)
    // tombstone filter on the corpus side: a deleted document must not
    // produce candidates against new batches (the anti-join composes
    // with the bp= pruning below — both restrict the corpus scan)
    probeAgainst(Tombstones.filter(spark, indexDir,
        spark.read.parquet(bandsPath), Seq("doc_id")),
      batch, nb, rb, prefixLenOfPath(spark, bandsPath))
  }

  /** The probe join against an arbitrary corpus-bands frame — factored
    * out so callers holding a FILTERED view of the bands artifact (the
    * streaming ingest excludes the replaying batch's own partition) run
    * the identical join. `corpusBands` needs (bp, band, bkey, doc_id);
    * extra columns (e.g. a batch_id partition column) are ignored.
    */
  def probeAgainst(corpusBands: DataFrame, batch: DataFrame,
      numBands: Int = 2, rowsPerBand: Int = 8,
      prefixLen: Int = 1): DataFrame = {
    val qb = bandsOfScheme(batch, numBands, rowsPerBand, prefixLen)
      .select(col("bp"), col("band"), col("bkey"), col("doc_id").as("batch_doc"))
    // Static partition pruning on the corpus side: the batch's distinct
    // key prefixes are at most 16 values, collected driver-side (an
    // O(#prefixes) collect, not a data collect) and pushed as an IN
    // filter — the scan plans only the matching bp= directories. Join
    // equality on bp makes the filter a no-op semantically; a dynamic-
    // pruning subquery would need a selective filter on the build side
    // to trigger, and a literal IN prunes at PLANNING time instead of
    // run time. Costs one extra pass over the (micro-batch-sized)
    // probe side to compute its prefixes.
    val prefixes = qb.select("bp").distinct().collect()
      .map(_.getString(0)).sorted.toSeq
    val cb = corpusBands.where(col("bp").isin(prefixes: _*))
      .select(col("bp"), col("band"), col("bkey"), col("doc_id").as("corpus_doc"))
    qb.join(cb, Seq("bp", "band", "bkey"))
      .select(col("batch_doc"), col("corpus_doc"))
      .distinct()
  }

  /** Incrementally MERGE a delta batch (doc_id, text; ids disjoint from
    * the indexed corpus) into a persisted index IN PLACE — the daily
    * crawl-update path. The corpus artifacts are never recomputed or
    * rewritten: the delta's signatures / bands / shingle sets APPEND
    * into the existing layout (bands land in their own bp= partition
    * files), and the pairs artifact gains exactly the pairs a from-
    * scratch rebuild would add — delta×corpus candidates from the
    * partition-pruned [[probe]] plus delta×delta candidates from the
    * band self-join over the delta alone. Cost is O(delta) + the pruned
    * probe at ANY corpus size; a rebuild is O(corpus + delta). Existing
    * pairs stay untouched (ids are disjoint, so no new pair can collide
    * with an old one) — DedupIndexSpec pins merged == rebuilt for every
    * artifact.
    *
    * Ids-disjoint is CHECKED, not assumed: the delta keys an anti-join
    * against the persisted signatures' doc_ids (O(delta) — the corpus
    * side reads one column, hash-joined), and an overlap throws before
    * anything is written. An overlapping merge would otherwise SILENTLY
    * corrupt the index (duplicate doc_ids in every artifact, wrong
    * pairs).
    *
    * New pairs are computed and written BEFORE the delta bands append:
    * the probe must see the PRE-merge corpus bands, or the delta would
    * self-join twice.
    *
    * Failure posture. Four sequential appends are individually atomic
    * (the parquet committer publishes a job's files only at job commit)
    * but NOT jointly: a merge dying between stages leaves later stages
    * missing, and a blind re-run would re-append the earlier ones —
    * duplicate pairs/signatures, double-counted downstream. Passing a
    * `mergeId` makes the retry safe: each stage records a marker under
    * `_merges/<mergeId>/` after its append commits, and a re-run with
    * the same id SKIPS committed stages — build's `resume` discipline
    * applied to appends (where `_SUCCESS` alone cannot distinguish
    * "this delta already landed" from "some earlier delta landed").
    * The disjointness guard is skipped once the signatures stage is
    * committed (the delta's ids are then legitimately present).
    * Residual window: a crash BETWEEN a stage's commit and its marker
    * write re-appends that one stage on retry — pick an id per delta
    * and re-run until clean, or rebuild on repeated failure. Without a
    * `mergeId` the merge is one-shot: a failed run requires a rebuild
    * (`build(docs ∪ delta)`), not a re-merge.
    */
  def merge(spark: SparkSession, indexDir: String, delta: DataFrame,
      mergeId: Option[String] = None): Unit =
      // merges mutate the same stages compaction rewrites read and swap
      // — an unleased merge landing mid-rewrite would be silently lost
      // when the staged copy swaps in; the lease serializes them loudly
      // ([[IndexMaintenance.withLease]])
      IndexMaintenance.withLease(spark, indexDir) {
    // Converge any CRASHED swap before appending: a swap journal left by
    // a killed compact/reband names _SUCCESS-complete staged rewrites
    // that a later entry's recovery WILL replay over the live stages —
    // an append made in between would be silently discarded by that
    // replay (the staged copies predate it). Passing no stages recovers
    // exactly the journaled members; a clean index pays two existence
    // probes.
    IndexMaintenance.recoverStages(spark, indexDir, Seq.empty)
    val markerDir = mergeId.map(id => s"$indexDir/_merges/$id")
    def done(stage: String): Boolean =
      markerDir.exists(d => graft.util.Fs.isFile(spark, s"$d/$stage.done"))
    def commit(stage: String): Unit =
      markerDir.foreach(d => graft.util.Fs.touch(spark, s"$d/$stage.done"))
    // A FULLY-committed merge short-circuits before any guard: all four
    // stage markers present means every append landed and the replay is
    // an inert no-op — the docstring's "a re-run with the same id SKIPS
    // committed stages" retry contract. Without this, a doc_id of the
    // completed merge deleted AFTER it would make the replay throw on
    // the tombstone guard below (the guard exists for rows ABOUT to be
    // appended; a completed merge appends nothing), asymmetric with
    // [[VectorIndex.mergeIvf]]'s marker early-return.
    if (markerDir.isDefined &&
        Seq("pairs", "bands", "signatures", "shingle_sets").forall(done))
      return
    // The tombstone guard runs above the per-stage resume gates for any
    // PARTIALLY-resumed retry: a retry whose signatures stage already
    // committed must still refuse a delta naming a LIVE tombstone (a
    // delete can land between the crash and the retry, and the resumed
    // merge would append the REMAINING stages' rows pre-deleted — the
    // silent re-delete this guard exists to prevent). Identity-cheap
    // when no tombstone set exists, matching
    // [[VectorIndex.requireNotTombstoned]]'s unconditional placement.
    if (Tombstones.any(spark, indexDir)) {
      val hit = delta.select(col("doc_id"))
        .join(Tombstones.ids(spark, indexDir)
          .withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left_semi")
        .limit(1).count()
      require(hit == 0L,
        s"merge delta names tombstoned doc_ids at $indexDir — the rows " +
          "would land pre-deleted (silently filtered); fold the deletes " +
          "through TWO maintenance entries (compact retires them one " +
          "cycle later), then re-add")
    }
    if (!done("signatures")) {
      // the guard reads the RAW signatures, not the tombstone-filtered
      // reader: re-merging a deleted-but-not-yet-folded id would append
      // rows the live tombstone silently filters (a re-delete the
      // caller never asked for) — fail loudly instead; compact (which
      // folds, and a second compact retires) before re-adding an id.
      // (The folded-but-unretired window — rows already folded away,
      // tombstones still live — is the unconditional guard above.)
      val overlap = delta.select(col("doc_id"))
        .join(spark.read.parquet(stg(spark, indexDir, "signatures"))
          .select(col("doc_id")), Seq("doc_id"), "left_semi")
        .limit(1).count()
      require(overlap == 0L,
        s"merge delta shares doc_ids with the indexed corpus at $indexDir — " +
          "merging would duplicate ids across every artifact (a tombstoned " +
          "id would land pre-deleted); re-key the delta, or compact first " +
          "if the id was deleted")
    }
    // band the delta in the INDEX'S OWN scheme: after a [[reband]] the
    // live bands may be finer or coarser than the production 2x8, and
    // banding the delta differently would silently miss every
    // delta x corpus candidate (keys from different schemes never match)
    val (nb, rb) = bandingOf(spark, indexDir)
    val deltaBands = bandsOfScheme(delta, nb, rb, prefixLenOf(spark, indexDir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // each stage append is fenced ([[IndexMaintenance.fence]]): the
      // banding/probe jobs between appends can outlive the lease TTL on
      // a large delta, and rows landed by a taken-over holder would be
      // silently dropped when the successor's staged rewrite swaps in —
      // heartbeat (or abort loudly) before every per-stage append; one
      // map read and a clock compare on the fast path
      if (!done("pairs")) {
        val crossPairs = probe(spark, indexDir, delta)
          .select(least(col("batch_doc"), col("corpus_doc")).as("doc_a"),
            greatest(col("batch_doc"), col("corpus_doc")).as("doc_b"))
        val selfPairs = LlmQueries.lshSelfJoin(deltaBands)
        IndexMaintenance.fence(spark, indexDir)
        crossPairs.unionByName(selfPairs).distinct()
          .write.mode(SaveMode.Append).parquet(stg(spark, indexDir, "pairs"))
        commit("pairs")
      }
      if (!done("bands")) {
        IndexMaintenance.fence(spark, indexDir)
        deltaBands
          .write.mode(SaveMode.Append).partitionBy("bp")
          .parquet(stg(spark, indexDir, "bands"))
        commit("bands")
      }
    } finally { deltaBands.unpersist(); () }
    if (!done("signatures")) {
      IndexMaintenance.fence(spark, indexDir)
      LlmQueries.minhashSignatures(delta)
        .write.mode(SaveMode.Append).parquet(stg(spark, indexDir, "signatures"))
      commit("signatures")
    }
    if (!done("shingle_sets")) {
      IndexMaintenance.fence(spark, indexDir)
      shingleSetsOf(delta)
        .write.mode(SaveMode.Append).parquet(stg(spark, indexDir, "shingle_sets"))
      commit("shingle_sets")
    }
  }

  /** COMPACT a persisted index in place — the periodic maintenance pass
    * that bounds what repeated O(delta) [[merge]]s and streamed batch
    * folds grow without bound. Two costs accumulate across merges:
    * FILE COUNT (every append lands its own file generation — a year of
    * daily deltas is ~365 generations per artifact, and both scan
    * planning and band-partition pruning pay per file) and the
    * documented at-least-once residual (a merge retry that crashed
    * between a stage's append commit and its marker write re-appends
    * that one stage — full-row duplicate pairs/signatures that
    * downstream consumers would double-count). Compaction rewrites each
    * artifact DISTINCT and re-filed into O(targetFiles) files, closing
    * both.
    *
    * Posture: every artifact is first staged under `_compact/<stage>/`
    * (each staging write carries its own `_SUCCESS`), and only then
    * swapped into place one artifact at a time. Compaction is
    * CONTENT-PRESERVING — all four artifacts are logically sets, and
    * the only rows removed are exact full-row duplicates that appends
    * alone could have created — so a crash at ANY point leaves a
    * correct index: each artifact is served by either its old or its
    * new files, never a mix, and a re-run simply finishes. This is why
    * compact needs no marker protocol of its own.
    *
    * Partition layout is preserved: bands keep their `bp=` pruning
    * directories, and a streamed index's `batch_id=` directories
    * ([[graft.streaming.DocStream]]'s replay-overwrite discipline)
    * survive, so a fold resumed after a between-batches compact still
    * overwrites its own partition on replay.
    *
    * Merge markers under `_merges/` are cleared at the end: the
    * duplicate window they guard is closed by the rewrite, and clearing
    * keeps the marker directory from growing one entry per delta
    * forever. Replaying an already-compacted mergeId afterwards fails
    * LOUDLY on the id-overlap guard (its ids are in the signatures)
    * instead of silently skipping — the safe direction.
    *
    * Cost is O(corpus) — one distinct + rewrite per artifact — paid at
    * maintenance cadence and amortized over the many O(delta) merges it
    * makes cheap to keep taking. At 100 TB the signatures artifact is
    * ~100 GB and pairs/bands are banding-bounded; the swap is three
    * `FileSystem.rename` metadata moves per artifact, valid on HDFS
    * and local disks alike (see [[IndexMaintenance.compactStages]]).
    *
    * `swapMode` (None = the session default) picks the swap protocol
    * for THIS call without touching the session-global
    * `spark.graft.index.swapMode` conf — a session toggle would force
    * every concurrent maintenance op into the chosen protocol.
    *
    * Compaction is also the [[delete]] FOLD: each staged rewrite drops
    * the tombstoned rows (pairs by either endpoint), and the observed
    * tombstone files are RETIRED after the swap ([[Tombstones.endFold]]
    * — kept one further maintenance cycle for readers on retained
    * generations, GC'd by the next entry's [[Tombstones.beginFold]]; a
    * delete landing mid-fold survives untouched and folds next time).
    */
  def compact(spark: SparkSession, indexDir: String, targetFiles: Int = 8,
      swapMode: Option[String] = None): Unit =
      // the lease brackets the WHOLE entry — cohort aging/GC
      // ([[Tombstones.beginFold]]) and retirement ([[endFold]]) are
      // writers too: an unleased beginFold racing another driver's
      // fold would age cohorts per refused attempt and race marker
      // rewrites (the inner compactStages re-enters)
      IndexMaintenance.withLease(spark, indexDir) {
    val observed = Tombstones.beginFold(spark, indexDir)
    val allFolded = IndexMaintenance.compactStages(spark, indexDir,
      Seq("signatures", "bands", "pairs", "shingle_sets"), targetFiles,
      swapMode,
      rowFilter = {
        case ("pairs", df) =>
          Tombstones.filter(spark, indexDir, df, Seq("doc_a", "doc_b"))
        case (_, df) =>
          Tombstones.filter(spark, indexDir, df, Seq("doc_id"))
      })
    // a stage skipped as empty-after-filter still holds tombstoned
    // rows — its tombstones stay live rather than retiring
    if (allFolded) Tombstones.endFold(spark, indexDir, observed)
  }

  /** Banded keys (doc_id, band, bkey, bp) of a (doc_id, text) frame —
    * the exact frame `build` persists under `bands/`, exposed so
    * incremental writers (the streaming corpus fold) can append a
    * batch's bands in the index's own layout. This is the PRODUCTION
    * 2x8 scheme; writers against a [[reband]]ed index must band in the
    * index's own scheme ([[bandsOfScheme]] + [[bandingOf]] — [[merge]]
    * and [[probe]] already do).
    */
  def bandsOf(docs: DataFrame): DataFrame = bandsOfScheme(docs, 2, 8)

  /** [[bandsOf]] under an explicit (bands x rows) scheme and pruning
    * prefix width: `prefixLen` hex chars of the banded key become the
    * `bp=` partition value — 16^prefixLen pruning directories. The
    * production width is 1 (16 directories); at 100 TB widen to 2
    * (256) or 3 (4096) so each band-file partition stays
    * planner-sized. The prefix is a FUNCTION of the key, so any width
    * yields the same pairs — it is purely the scan-pruning layout.
    */
  def bandsOfScheme(docs: DataFrame, numBands: Int, rowsPerBand: Int,
      prefixLen: Int = 1): DataFrame = {
    require(prefixLen >= 1 && prefixLen <= 8,
      s"bp prefix width $prefixLen outside [1, 8]")
    LlmQueries.bandedOfSigs(LlmQueries.minhashSignatures(docs),
        numBands, rowsPerBand)
      .withColumn("bp", substring(col("bkey"), 1, prefixLen))
  }

  /** The `bp=` pruning-prefix width the persisted index currently uses
    * — like [[bandingOf]], read from the live artifact itself (the
    * length of any `bp=` partition value), so it survives compaction
    * and swaps by construction. Absent/empty bands report the
    * production width 1.
    */
  def prefixLenOf(spark: SparkSession, indexDir: String): Int =
    prefixLenOfPath(spark, stg(spark, indexDir, "bands"))

  private def prefixLenOfPath(spark: SparkSession, bandsPath: String): Int =
    graft.util.Fs.listDirNames(spark, bandsPath)
      .collectFirst { case d if d.startsWith("bp=") => d.length - 3 }
      .getOrElse(1)

  /** The (bands x rows) scheme the persisted index is CURRENTLY banded
    * under. Fast path: the `_SCHEME` control file INSIDE the live
    * bands directory (written by [[build]] and [[reband]]; it lives
    * with the stage, so swaps and pointer generations carry it and
    * appends keep it). Fallback: derive from the data itself
    * (`max(band) + 1` over the artifact's band column — always
    * correct, since whatever bands directory is live IS the scheme)
    * and SELF-HEAL the control file, so the one full-column scan is
    * paid once after the file is lost (a compaction rewrite) rather
    * than on every probe/merge — at the 100 TB posture the bands
    * artifact is banding-bounded but still corpus-sized, and the
    * probe path exists to avoid exactly that class of scan. An absent
    * or empty bands artifact reports the production 2x8 default.
    */
  def bandingOf(spark: SparkSession, indexDir: String): (Int, Int) =
    bandingOfPath(spark, stg(spark, indexDir, "bands"))

  private def bandingOfPath(spark: SparkSession, p: String): (Int, Int) = {
    if (!graft.util.Fs.exists(spark, p)) (2, 8)
    else if (graft.util.Fs.isFile(spark, s"$p/_SCHEME")) {
      val Array(nb, rb) = graft.util.Fs.readString(spark, s"$p/_SCHEME")
        .trim.split('x').map(_.toInt)
      (nb, rb)
    } else {
      val row = spark.read.parquet(p).agg(max(col("band"))).collect().head
      if (row.isNullAt(0)) (2, 8)
      else {
        val nb = row.getInt(0) + 1
        graft.util.Fs.writeString(spark, s"$p/_SCHEME", s"${nb}x${16 / nb}")
        (nb, 16 / nb)
      }
    }
  }

  /** RE-BAND a persisted index under a new (bands x rows) tradeoff —
    * the actuator for the decision l75's sweep prices: a finer banding
    * (more bands, fewer rows each) lowers the S-curve threshold and
    * buys recall at a candidate-volume cost; a coarser one the
    * reverse. The layout's headline claim is that this NEVER touches
    * the corpus: both replacement artifacts derive from the persisted
    * signatures alone — `bands` is a row-local projection of the
    * signature table, `pairs` the bucket self-join over it — so the
    * cost is O(signatures + candidate volume) however large the
    * original text was. Signatures and shingle sets are
    * scheme-independent and survive untouched.
    *
    * Both stages are STAGED and swapped under [[IndexMaintenance]]'s
    * protocol (rename-aside on HDFS-semantics stores, journaled
    * pointer publish on object stores): like retrain, the replacement
    * is NOT content-equal to the live stage, so the multi-stage
    * journal is what keeps a crash from serving 4x4 bands next to 2x8
    * pairs — recovery converges the pair to one generation. Merge
    * markers are cleared (the rewrite supersedes the duplicate window
    * they guard; a replayed old mergeId fails loudly on the id-overlap
    * guard). Subsequent [[merge]]s and [[probe]]s band their inputs in
    * the NEW scheme automatically ([[bandingOf]] reads it from the
    * live artifact). Streamed layouts are refused: their bands carry
    * replay-owned `batch_id=` partitions, and re-derived candidate
    * pairs have no well-defined owning batch.
    */
  def reband(spark: SparkSession, indexDir: String, numBands: Int,
      rowsPerBand: Int, prefixLen: Int = 1,
      swapMode: Option[String] = None): Unit =
      IndexMaintenance.withLease(spark, indexDir) {
    require(numBands * rowsPerBand == 16,
      s"reband scheme ${numBands}x$rowsPerBand does not tile the 16-lane signature")
    val stages = Seq("bands", "pairs")
    IndexMaintenance.recoverStages(spark, indexDir, stages, swapMode)
    require(!spark.read.parquet(stg(spark, indexDir, "bands"))
        .columns.contains("batch_id"),
      s"reband at $indexDir: a streamed batch_id= layout cannot be rebanded " +
        "in place (re-derived pairs have no owning batch); fold it into a " +
        "batch index first")
    require(prefixLen >= 1 && prefixLen <= 8,
      s"bp prefix width $prefixLen outside [1, 8]")
    val banded = LlmQueries.bandedOfSigs(signatures(spark, indexDir),
        numBands, rowsPerBand)
      .withColumn("bp", substring(col("bkey"), 1, prefixLen))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val stagedBands = IndexMaintenance.stagedDir(spark, indexDir, "bands",
        swapMode)
      val stagedPairs = IndexMaintenance.stagedDir(spark, indexDir, "pairs",
        swapMode)
      banded.repartition(col("bp")).write.mode(SaveMode.Overwrite)
        .partitionBy("bp").parquet(stagedBands)
      // the scheme file is staged INSIDE the replacement bands dir, so
      // the swap publishes layout and scheme as one unit at any store
      graft.util.Fs.writeString(spark, s"$stagedBands/_SCHEME",
        s"${numBands}x$rowsPerBand")
      LlmQueries.lshSelfJoin(banded)
        .write.mode(SaveMode.Overwrite).parquet(stagedPairs)
      IndexMaintenance.swapStages(spark, indexDir, stages, swapMode)
      graft.util.Fs.delete(spark, s"$indexDir/_compact")
      graft.util.Fs.delete(spark, s"$indexDir/_merges")
    } finally { banded.unpersist(); () }
  }

  /** The documented operational re-banding bar: more than 3 candidate
    * pairs per indexed document (`pressure x1e4 > 30000`) — the
    * candidate volume at which the banding scheme, not the scorer, is
    * the quadratic cost l75's sweep prices. The healthy synthetic
    * corpora read well under it at every SF; a near-duplicate flood
    * (one crawler page re-emitted under fresh ids) blows past it.
    */
  val RebandBarX1e4: Long = 30000L

  /** AUDIT the index's candidate-pair pressure and RECORD the verdict —
    * the text-side analog of [[VectorIndex.auditCellBalance]], closing
    * the bookkeeping gap between l75 (which PRICES the banding
    * tradeoff) and [[reband]] (which ACTUATES it): pressure =
    * `|pairs| x 10^4 / |documents|`, judged against `barX1e4`. The
    * verdict lands as one row under `_maintenance/banding`
    * (mode=overwrite — each audit supersedes the last, replays are
    * idempotent) where [[maintainIfDue]] consumes it; recording even a
    * healthy verdict keeps an audit trail a monitoring scrape can
    * read. Cost: two metadata-cheap `count()`s (parquet row-group
    * counts — no data columns read), a BigInt division, one 1-row
    * write — corpus-size-independent, so it can run after every
    * [[merge]]. Note the bar measures CANDIDATE VOLUME: a true-
    * duplicate flood keeps tripping it even after a coarser re-banding
    * (those candidates are real pairs — removing them is upstream
    * dedup's job, not the index's); what the actuator buys is the
    * near-threshold noise component. Returns whether a reband is due.
    */
  def auditBandingPressure(spark: SparkSession, indexDir: String,
      barX1e4: Long = RebandBarX1e4): Boolean = {
    val pairs = spark.read.parquet(stg(spark, indexDir, "pairs")).count()
    val docs = spark.read.parquet(stg(spark, indexDir, "signatures")).count()
    // BigInt: a hot-bucket pathology can put |pairs| near |docs|^2 —
    // the one regime this audit exists to flag must not overflow
    val pressure =
      if (docs == 0L) 0L else (BigInt(pairs) * 10000 / docs).toLong
    val due = pressure > barX1e4
    spark.range(1).select(lit(pressure).as("pressure_x1e4"),
        lit(barX1e4).as("bar_x1e4"), lit(due).as("reband"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$indexDir/_maintenance/banding")
    due
  }

  /** Is a recorded reband verdict pending? (No verdict file = no.) */
  def maintenanceDue(spark: SparkSession, indexDir: String): Boolean =
    graft.util.Fs.isFile(spark,
      s"$indexDir/_maintenance/banding/_SUCCESS") &&
      spark.read.parquet(s"$indexDir/_maintenance/banding")
        .where(col("reband")).limit(1).count() > 0

  /** CONSUME a recorded reband verdict: if [[auditBandingPressure]]
    * left `reband = true`, re-band to the precision-leaning target
    * scheme (default 1x16 — the coarsest tiling, highest S-curve
    * threshold, the direction that sheds candidate volume) and clear
    * the verdict — the closed loop [[VectorIndex.maintainIfDue]] runs
    * for the vector index, applied to the text index: the audit's bar
    * terminates in a proven actuator instead of a human. The verdict
    * is cleared AFTER the reband commits: a crash mid-reband leaves it
    * up and the re-run rebands again (content-idempotent — reband is a
    * pure derivation from the persisted signatures) rather than
    * silently skipping. Same single-writer maintenance window as every
    * swap here; streamed `batch_id=` layouts are refused by [[reband]]
    * itself (fold them into a batch index first). Returns whether a
    * reband ran.
    */
  def maintainIfDue(spark: SparkSession, indexDir: String,
      numBands: Int = 1, rowsPerBand: Int = 16,
      prefixLen: Int = 1): Boolean = {
    val due = maintenanceDue(spark, indexDir)
    if (due) {
      reband(spark, indexDir, numBands, rowsPerBand, prefixLen)
      graft.util.Fs.delete(spark, s"$indexDir/_maintenance/banding")
    }
    due
  }

  /** The distinct-shingle-set frame (doc_id, sh_set) `build` persists
    * under `shingle_sets/` — exposed for incremental writers and scale
    * probes, mirroring [[bandsOf]].
    */
  def shingleSetsOf(docs: DataFrame): DataFrame =
    LlmQueries.docShingleSets(docs)

  /** The signature frame (doc_id, sig0..sig15) `build` persists under
    * `signatures/` — exposed for incremental writers, mirroring
    * [[bandsOf]].
    */
  def signaturesOf(docs: DataFrame): DataFrame =
    LlmQueries.minhashSignatures(docs)

  /** The distinct same-bucket pair set of a banded frame — `build`'s
    * pairs formulation exposed for incremental writers computing a
    * delta's self-pairs. The input feeds both sides of the self-join;
    * callers with a non-trivial banded frame should persist it first
    * (micro-batch-sized inputs can accept the double scan).
    */
  def pairsOfBands(bands: DataFrame): DataFrame =
    LlmQueries.lshSelfJoin(bands)
}
