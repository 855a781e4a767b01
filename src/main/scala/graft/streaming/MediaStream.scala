package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.media.MediaQueries

/** Continuous media-asset ingestion — the [[DocStream]]/[[VecStream]]
  * discipline applied to the multimodal column, completing the
  * streaming-ingest triad (text corpus, embedding index, media
  * fingerprint index). A stream of (media_id, payload) assets is folded
  * into a persisted perceptual fingerprint index where each micro-batch
  * pays only per-delta cost: payload bytes are touched EXACTLY ONCE (at
  * ingest, by the codegen'd aHash/md5 fold) and every downstream
  * consumer — near-dup pair listing, duplicate clustering, paired-
  * modality checks — reads the ~20 B/asset fingerprint rows, never the
  * payloads. At 100 TB of media the index is GBs and ingest is the only
  * stage whose I/O scales with payload bytes.
  *
  * Per micro-batch:
  *   0. OPTIONAL payload-size drift gate (the l73/m15 statistic inside
  *      the fold): the batch's size histogram vs the held assets'; a
  *      drifted batch is rejected whole, verdict logged under
  *      `_gate/batch_id=N`;
  *   1. in-batch exact dedup — keep the min media_id per md5(payload);
  *   2. fingerprint — the m06 16-bit block aHash
  *      ([[graft.media.MediaQueries.aHash16]]), computed on the same
  *      pass as the md5 key;
  *   3. exact-copy probe — LEFT ANTI equi-join on the md5 key against
  *      the accumulated index, so byte-identical copies of held assets
  *      are rejected;
  *   4. OPTIONAL perceptual gate — a batch asset is rejected when some
  *      HELD asset's fingerprint is within Hamming distance
  *      `rejectHammingLe` (<= 1 by the 2x8-bit pigeonhole: candidates
  *      from 2 equi-joins on the banded index, verify = one xor +
  *      bit_count). The candidate join keys on the `bv` partition
  *      column of the banded layout, so scan planning prunes the index
  *      read to the band values the batch actually hashes into;
  *   5. idempotent append — survivors land under `fps/batch_id=N` and
  *      `bands/batch_id=N/bv=X` with mode=overwrite, and every probe
  *      excludes `batch_id = batchId`, so a replayed batch re-probes
  *      against everyone else, rewrites its own files byte-identically,
  *      and is a no-op (the [[DocStream]] replay recipe).
  *
  * The grown `fps/` table serves
  * [[graft.media.MediaQueries.hammingPairsOf]] identically to a batch
  * fingerprint build over the surviving assets (MediaStreamSpec pins
  * this), so pair mining / clustering never re-scan payloads or rebuild
  * fingerprints.
  */
object MediaStream {

  /** One micro-batch of the ingest fold; exposed for direct replay
    * testing. `batch` needs (media_id, payload). `indexDir` grows
    * `fps/` and `bands/` per batch.
    */
  def ingestBatch(batch: DataFrame, indexDir: String, batchId: Long,
      rejectHammingLe: Option[Int] = None,
      driftGate: Boolean = false): Unit = {
    val spark = batch.sparkSession
    // `plen` rides the same single payload pass as the hash and the
    // fingerprint: the drift gate's reference histogram then reads the
    // held index's stored sizes — payload bytes stay touched exactly
    // once, at ingest
    // Pinned for the batch's lifetime: `keyed` feeds the gate histogram,
    // the in-batch dedup (agg + join), the corpus probe, and the final
    // writes — without the persist each consumer would RE-RUN the
    // payload fold, and "touched exactly once" is a claim about the
    // plan, not the prose. The persisted rows are ~30 B/asset (payload
    // projected away).
    val keyed = batch
      .withColumn("h", md5(col("payload")))
      .withColumn("fp", MediaQueries.aHash16(col("payload")))
      .withColumn("plen", length(col("payload")).cast("long"))
      .select(col("media_id"), col("h"), col("fp"), col("plen"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // existence, not exception-swallowing (the VecStream/DocStream
    // discipline): a present-but-broken fps layout fails loudly instead
    // of silently folding the batch as batch-0
    // mergeSchema: a mixed pre-/post-plen layout (old generations
    // without the column next to new ones with it) must resolve to the
    // UNION schema deterministically — the default single-footer
    // sampling would arm or disarm the size gate depending on which
    // file Spark happened to pick
    // tombstone-filtered ([[deleteFromIndex]]): a deleted asset must
    // not reject a fresh arrival as its duplicate, nor weigh in the
    // size-drift reference
    val held: Option[DataFrame] =
      if (graft.util.Fs.exists(spark, graft.util.Fs.stagePath(spark, indexDir, "fps")))
        Some(graft.llm.Tombstones.filter(spark, indexDir,
          spark.read.option("mergeSchema", "true")
            .parquet(graft.util.Fs.stagePath(spark, indexDir, "fps"))
            .where(col("batch_id") =!= batchId), Seq("media_id")))
      else None
    // Payload-size drift gate (the l73/m15 statistic run INSIDE the
    // fold): the arriving batch's size histogram vs the held assets' —
    // an encoder change or a padded-spam source shifts byte sizes long
    // before content checks see it — and a drifted batch is rejected
    // WHOLE. Reference excludes this batch's own partition; an empty
    // reference is ungated (batch-0 replay); the verdict lands under
    // `_gate/batch_id=N` with mode=overwrite (the DocStream recipe).
    val sizeBucket = expr("CAST(least(plen div 100, 7) AS BIGINT)")
    // (and an EMPTY batch is ungated — no distribution to judge, no
    // writes to block)
    // Size-gating needs the reference sizes, and only fps partitions
    // written at or after the version that added `plen` carry them: on
    // an older held index the gate SKIPS (empty-reference semantics —
    // the batch is ungated, not failed) rather than throwing an
    // unresolved-column error from inside the fold. On a MIXED layout
    // the union schema (mergeSchema above) carries plen with nulls for
    // pre-plen rows; the reference keeps only the rows that STORED a
    // size — a null bucket would otherwise hold the legacy mass and
    // read as a huge spurious shift. The held index back-fills
    // naturally: every batch ingested from now on stores plen, so the
    // reference widens to the full corpus as generations turn over.
    val gateRejected: Boolean = driftGate && !batch.isEmpty && {
      val ref = held.filter(_.columns.contains("plen"))
        .map(_.where(col("plen").isNotNull)).filter(!_.isEmpty)
      val verdict = ref.map { h =>
        val row = graft.llm.LlmQueries.driftOfBuckets(
            h.select(sizeBucket.as("bucket")),
            keyed.select(sizeBucket.as("bucket")),
            MediaQueries.MediaDriftBarX1e4)
          .select(col("drift_x1e4"), col("drifted")).limit(1).collect().head
        (row.getLong(0), row.getBoolean(1))
      }
      verdict.foreach { case (stat, rejected) =>
        spark.range(1).select(
            lit(stat).as("drift_x1e4"), lit(rejected).as("rejected"))
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$indexDir/_gate/batch_id=$batchId")
      }
      verdict.exists(_._2)
    }
    val gatedKeyed0 = if (gateRejected) keyed.where(lit(false)) else keyed
    // a live tombstone keeps its media_id "taken" ([[deleteFromIndex]]):
    // an arrival re-using a deleted id would land pre-filtered — drop
    // it until a compactIndex retires the tombstones
    val gatedKeyed =
      if (graft.llm.Tombstones.any(spark, indexDir))
        gatedKeyed0.join(graft.llm.Tombstones.ids(spark, indexDir)
          .withColumnRenamed("id", "media_id"), Seq("media_id"), "left_anti")
      else gatedKeyed0
    // in-batch exact dedup: min media_id per payload hash
    val k1 = gatedKeyed.groupBy(col("h")).agg(min("media_id").as("kid"))
    val s1 = gatedKeyed.join(k1, Seq("h")).where(col("media_id") === col("kid")).drop("kid")
    val novel = held match {
      case Some(idx) => s1.join(idx.select("h").distinct(), Seq("h"), "left_anti")
      case None => s1
    }
    val survivors = (held, rejectHammingLe) match {
      case (Some(_), Some(maxDist)) =>
        require(maxDist <= 1,
          s"the 2x8-bit pigeonhole banding only guarantees hamming<=1; got $maxDist")
        // candidates only from band-value collisions — the probe reads
        // the banded layout pruned to this batch's own bv= partitions,
        // never the full fingerprint set
        val heldBands = graft.llm.Tombstones.filter(spark, indexDir,
            spark.read.parquet(graft.util.Fs.stagePath(spark, indexDir, "bands"))
              .where(col("batch_id") =!= batchId), Seq("media_id"))
          .select(col("band_id"), col("bv"), col("fp").as("held_fp"))
        val batchBands = bandsOf(novel)
        val dups = batchBands
          .join(heldBands, Seq("band_id", "bv"))
          .where(bit_count(col("fp").bitwiseXOR(col("held_fp"))) <= maxDist)
          .select(col("media_id")).distinct()
        novel.join(dups, Seq("media_id"), "left_anti")
      case _ => novel
    }
    val outP = survivors
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // An all-rejected batch writes NOTHING: the partitionBy("bv")
    // write of an empty frame leaves a directory holding only
    // _SUCCESS, which the next batch's band probe would see and then
    // fail to read. (The fps write is unpartitioned and would be safe,
    // but skipping both keeps the two artifacts batch-consistent.)
    // Replay-idempotent: the replay re-derives the same empty set.
    if (!outP.isEmpty) {
      outP.write.mode("overwrite").parquet(s"${graft.util.Fs.stagePath(spark, indexDir, "fps")}/batch_id=$batchId")
      bandsOf(outP)
        .write.mode("overwrite").partitionBy("bv")
        .parquet(s"${graft.util.Fs.stagePath(spark, indexDir, "bands")}/batch_id=$batchId")
    }
    outP.unpersist(); ()
    } finally { keyed.unpersist(); () }
  }

  /** The 2x8-bit pigeonhole banding of a (media_id, fp) frame — the
    * m06 band construction, persisted so probes are partition-pruned
    * equi-joins on `bv`.
    */
  private def bandsOf(fps: DataFrame): DataFrame =
    fps.select(col("media_id"), col("fp"),
        explode(sequence(lit(0), lit(1))).as("band_id"))
      .select(col("media_id"), col("fp"), col("band_id"),
        expr("shiftright(fp, band_id * 8)").bitwiseAND(lit(255L)).as("bv"))

  /** Run the ingest fold over a streaming (media_id, payload) source. */
  def ingest(assets: DataFrame, indexDir: String, checkpointDir: String,
      rejectHammingLe: Option[Int] = None,
      driftGate: Boolean = false): StreamingQuery =
    assets.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, indexDir, batchId, rejectHammingLe, driftGate)
      }
      .start()

  /** Read the gate log (drift statistic + verdict per gated batch). */
  def gateLog(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/_gate")

  /** Read the accumulated fingerprint index (all batch partitions).
    * Tombstone-filtered ([[deleteFromIndex]]).
    */
  def fingerprints(spark: SparkSession, indexDir: String): DataFrame =
    graft.llm.Tombstones.filter(spark, indexDir,
      spark.read.parquet(graft.util.Fs.stagePath(spark, indexDir, "fps")),
      Seq("media_id"))

  /** BATCH-AXIS time travel on the fingerprint index: the served
    * fingerprints as they stood once micro-batch `n` had folded — the
    * media side of [[DocStream.corpusAsOfBatch]], same contract: the
    * `batch_id=` replay partitions are a full append-only history
    * (compaction preserves them), the filter is on the partition
    * column so the scan plans only the covered directories, and
    * CURRENT tombstones still filter every snapshot (a takedown beats
    * time travel).
    */
  def fingerprintsAsOfBatch(spark: SparkSession, indexDir: String,
      n: Long): DataFrame = {
    require(n >= 0L, s"fingerprintsAsOfBatch($n): negative batch id")
    graft.llm.Tombstones.filter(spark, indexDir,
      spark.read.parquet(graft.util.Fs.stagePath(spark, indexDir, "fps"))
        .where(col("batch_id") <= n), Seq("media_id"))
  }

  /** GENERATION-AXIS time travel on the fingerprint index — the media
    * side of [[graft.llm.VectorIndex.searchIvfAsOf]], completing the
    * as-of triad's second axis (text l96, vector l98, media here): the
    * served fingerprints as they were `back` maintenance pointer-flips
    * ago. Each [[compactIndex]] under the pointer protocol retains the
    * fps generation it supersedes inside the retention window
    * (`spark.graft.index.retainGens`), so a fold/compaction history is
    * diffable against the exact artifact a maintenance pass replaced —
    * and because post-flip micro-batches append into the CURRENT
    * generation, a superseded generation is also the index "before the
    * batches that followed the compact". Resolution goes through the
    * flip-journal seqlock ([[graft.llm.IndexMaintenance
    * .snapshotStagesAsOf]]); CURRENT tombstones still filter — a
    * takedown beats time travel on every axis. Bounded loudly by what
    * retention kept; the error names the widening knob.
    */
  def fingerprintsAsOf(spark: SparkSession, indexDir: String,
      back: Int): DataFrame =
    graft.llm.Tombstones.filter(spark, indexDir,
      spark.read.parquet(
        graft.llm.IndexMaintenance.snapshotStagesAsOf(spark, indexDir,
          Seq("fps"), back)("fps")),
      Seq("media_id"))

  /** DELETE assets from the index — [[graft.llm.DedupIndex.delete]]'s
    * takedown verb on the media fold ([[graft.llm.Tombstones]]
    * semantics): O(|ids|) now; [[fingerprints]] and both in-fold
    * rejection probes (exact hash and perceptual bands) exclude the
    * deleted assets immediately — a takedown'd image must neither be
    * served NOR keep rejecting fresh arrivals as its duplicates — and
    * the next [[compactIndex]] folds the removals (retired one further
    * maintenance cycle later).
    * Replay caveat (shared with the corpus fold): replaying a
    * PRE-delete micro-batch after the fold re-ingests whatever the
    * batch held — delete again, or advance the checkpoint past the
    * deleted batches before folding.
    */
  def deleteFromIndex(spark: SparkSession, indexDir: String,
      ids: DataFrame): Unit =
    graft.llm.Tombstones.add(spark, indexDir, ids, "media_id")

  /** COMPACT the accumulated fold layout between runs —
    * [[graft.llm.DedupIndex.compact]]'s maintenance discipline applied
    * to the media index: a long-running fold accretes one file set per
    * micro-batch under `fps/batch_id=N` and `bands/batch_id=N/bv=X`,
    * and probe planning pays per file. The rewrite is
    * content-preserving and keeps the `batch_id=` replay partitions, so
    * a fold resumed afterwards still overwrites its own partition on a
    * crash replay. Run it with the stream STOPPED (between ingest
    * runs): compacting concurrently with an in-flight batch write
    * races the swap.
    */
  def compactIndex(spark: SparkSession, indexDir: String,
      targetFiles: Int = 8, swapMode: Option[String] = None): Unit =
      // whole-entry lease: cohort aging/retirement around the inner
      // (re-entrant) compactStages are maintenance writes too
      graft.llm.IndexMaintenance.withLease(spark, indexDir) {
    val observed = graft.llm.Tombstones.beginFold(spark, indexDir)
    val allFolded = graft.llm.IndexMaintenance.compactStages(spark, indexDir,
      Seq("fps", "bands"), targetFiles, swapMode,
      rowFilter = (_, df) => graft.llm.Tombstones.filter(spark, indexDir,
        df, Seq("media_id")))
    // both id-bearing stages fold in the one swap set above, so the
    // delete completes here ([[deleteFromIndex]]); retired one
    // maintenance cycle later ([[graft.llm.Tombstones.endFold]])
    if (allFolded) graft.llm.Tombstones.endFold(spark, indexDir, observed)
  }
}
