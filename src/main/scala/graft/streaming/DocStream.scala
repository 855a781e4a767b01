package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous-crawl corpus ingestion — the streaming form of the batch
  * incremental-snapshot dedup (l39) composed with canonicalization
  * dedup (l40): a document stream is folded into an ever-growing corpus
  * where each micro-batch pays only per-delta cost and the corpus is
  * never re-deduped.
  *
  * Per micro-batch:
  *   1. in-batch exact dedup — keep the min doc_id per md5(text);
  *   2. in-batch canonicalization dedup — keep the min doc_id per
  *      lowercase/strip-punct/collapse-whitespace form among survivors;
  *   3. corpus probe — two LEFT ANTI equi-joins (md5 key, canonical
  *      key) against the accumulated corpus, so exact copies AND
  *      case/punctuation variants of held documents are rejected;
  *   4. idempotent append — survivors land under a batchId-derived
  *      partition directory with mode=overwrite (the
  *      [[TickStream.runIdempotentBatchSink]] recipe), so a replayed
  *      batch rewrites the same files instead of duplicating.
  *
  * The replay trap this layout dodges: a replayed batch's own previous
  * output is already in the corpus, so probing against ALL of it would
  * reject every document and OVERWRITE the partition with an empty set —
  * silent data loss on recovery. The probe therefore excludes the
  * current batch's own partition (`batch_id != batchId`), making
  * replays true no-ops. Scale shape: hash-keyed anti joins only; the
  * corpus side reads just its two key columns (column pruning), and the
  * stream side is one micro-batch.
  *
  * Layout under `corpusDir`: survivors land in a `docs/` STAGE
  * (`docs/batch_id=N/`), with the gate log a SIBLING (`_gate/`) — the
  * stage boundary is what makes the corpus maintainable by the shared
  * [[graft.llm.IndexMaintenance]] engine ([[compactCorpus]]): a
  * long-lived stream accretes one file set per micro-batch without
  * bound, and a stage swap of the corpus data must not destroy the
  * verdict log riding next to it. Corpora written before the stage
  * existed (`batch_id=` directly under `corpusDir`) keep reading and
  * folding unchanged ([[dataDir]]); [[compactCorpus]] migrates them.
  */
object DocStream {

  /** The corpus DATA path: the `docs/` stage when present (canonical —
    * pointer-resolved via [[graft.util.Fs.stagePath]], so object-store
    * maintenance swaps redirect reads too), else the legacy layout
    * with `batch_id=` partitions directly under `corpusDir`. A fresh
    * corpus starts in the stage layout.
    */
  private[graft] def dataDir(spark: org.apache.spark.sql.SparkSession,
      corpusDir: String): String = {
    val staged = graft.util.Fs.exists(spark, s"$corpusDir/docs") ||
      graft.util.Fs.isFile(spark, s"$corpusDir/_ptr/docs")
    // A corpus holding BOTH layouts is a crashed migration: serving or
    // folding against only the migrated half would silently admit
    // duplicates of the unmigrated documents (and read partial
    // corpora) — fail loudly until the re-run finishes the migration.
    require(!(staged && legacyLayout(spark, corpusDir)),
      s"corpus at $corpusDir is split across the legacy and docs/ layouts " +
        "(a crashed migration) — re-run DocStream.compactCorpus to finish " +
        "the migration before reading or folding")
    if (!staged && legacyLayout(spark, corpusDir)) corpusDir
    else graft.util.Fs.stagePath(spark, corpusDir, "docs")
  }

  private def legacyLayout(spark: org.apache.spark.sql.SparkSession,
      corpusDir: String): Boolean =
    graft.util.Fs.exists(spark, corpusDir) &&
      graft.util.Fs.listDirNames(spark, corpusDir)
        .exists(_.startsWith("batch_id="))

  private def canon(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))

  /** One micro-batch of the ingest fold; exposed for direct testing of
    * replay semantics. `batch` needs (doc_id, text).
    *
    * When `nearDupIndexDir` is set, a fourth rejection stage runs after
    * the exact/canonical probes: the batch's MinHash banded keys are
    * joined against the accumulated band index ([[graft.llm.DedupIndex]]
    * layout, grown per batch under `bands/batch_id=N/bp=X`), so a NEAR
    * duplicate of a held document — a small edit that defeats both hash
    * keys — is rejected too (the l39 incremental probe as a streaming
    * stage). The join keys on the `bp` partition column, so scan
    * planning prunes the index read to the band-key prefixes the batch
    * actually hashes into. Survivors then grow the FULL
    * [[graft.llm.DedupIndex]] layout — bands, pairs, signatures,
    * shingle_sets — each artifact under the batch's own `batch_id=N`
    * partition with mode=overwrite, and every probe excludes
    * `batch_id = batchId` — the same replay discipline as the corpus
    * write: a replayed batch re-probes against everyone else, rewrites
    * its own files byte-identically, and is a no-op. The post-stream
    * index therefore serves candidatePairs / signatures / shingleSets
    * consumers identically to a from-scratch
    * [[graft.llm.DedupIndex.build]] over the surviving corpus
    * (DocStreamSpec pins this), with each batch paying only O(batch) —
    * the streaming form of [[graft.llm.DedupIndex.merge]].
    */
  def ingestBatch(batch: DataFrame, corpusDir: String, batchId: Long,
      nearDupIndexDir: Option[String] = None,
      driftGate: Boolean = false): Unit = {
    val spark = batch.sparkSession
    // resolved ONCE and pinned for the batch (a migration or swap
    // cannot move the corpus mid-batch — single-writer discipline)
    val data = dataDir(spark, corpusDir)
    // Distribution-drift gate (the l73 statistic run INSIDE the fold —
    // TFDV's "validate before you commit" posture): the arriving
    // batch's token-count histogram is compared against the HELD
    // corpus (excluding this batch's own partition, so a replay sees
    // the same reference and reaches the same verdict), and a drifted
    // batch is rejected WHOLE — a broken crawler or a spam flood
    // should not grow the corpus or the dedup index at all. The
    // verdict is recorded under `_gate/batch_id=N` — a SIBLING of the
    // docs/ stage (and an underscore dir, invisible to a legacy-layout
    // corpus read), so corpus compaction swaps never touch it — with
    // mode=overwrite, so the gate log is replay-idempotent too. The first batch is ungated —
    // there is no reference distribution to drift FROM — and an EMPTY
    // reference is treated identically to a missing one: replaying
    // batch 0 (the crash-recovery case) finds the corpus directory but
    // filters out its own partition, and gating against those zero
    // rows would divide by ref_total = 0 instead of being the no-op
    // idempotency promises. The statistic is an 8-row bounded frame;
    // collecting it is O(1).
    // (an EMPTY batch is ungated too — it has no distribution to judge
    // and both its histogram total and its downstream writes are
    // trivially zero)
    val gateRejected: Boolean = driftGate && !batch.isEmpty && {
      // existence, not exception-swallowing: a present-but-broken corpus
      // layout must fail the batch loudly, not degrade to "ungated"
      val refTexts: Option[DataFrame] =
        if (graft.util.Fs.exists(spark, data)) {
          // tombstone-filtered ([[deleteDocs]]): deleted documents no
          // longer shape the reference distribution
          val r = graft.llm.Tombstones.filter(spark, corpusDir,
              spark.read.parquet(data).where(col("batch_id") =!= batchId),
              Seq("doc_id"))
            .select(col("text"))
          if (r.isEmpty) None else Some(r)
        } else None
      val verdict = refTexts.map { ref =>
        val row = graft.llm.LlmQueries
          .driftTable(ref, batch.select(col("text")))
          .select(col("drift_x1e4"), col("drifted")).limit(1).collect().head
        (row.getLong(0), row.getBoolean(1))
      }
      verdict.foreach { case (stat, rejected) =>
        spark.range(1).select(
            lit(stat).as("drift_x1e4"), lit(rejected).as("rejected"))
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$corpusDir/_gate/batch_id=$batchId")
      }
      verdict.exists(_._2)
    }
    val gatedBatch = if (gateRejected) batch.where(lit(false)) else batch
    // a live tombstone keeps its doc_id "taken" ([[deleteDocs]]): an
    // arrival re-using a deleted id would otherwise land and be
    // silently re-deleted by the read filter — rows drop here until a
    // compactCorpus retires the tombstones (fresh content under a NEW
    // id is unaffected). The gate consults the CORPUS's tombstones AND
    // the attached index's: their folds run independently, and a
    // corpus-side retirement alone would re-open an id whose index
    // rows would still land pre-deleted (served from the corpus,
    // invisible to the near-dup probe — a half-alive document).
    val tombDirs = (Seq(corpusDir) ++ nearDupIndexDir)
      .filter(graft.llm.Tombstones.any(spark, _))
    val idGated = tombDirs.foldLeft(gatedBatch) { (acc, d) =>
      acc.join(graft.llm.Tombstones.ids(spark, d)
        .withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left_anti")
    }
    val keyed = idGated
      .withColumn("h", md5(col("text")))
      .withColumn("norm_key", md5(canon(col("text"))))
    val k1 = keyed.groupBy(col("h")).agg(min("doc_id").as("kid"))
    val s1 = keyed.join(k1, Seq("h")).where(col("doc_id") === col("kid")).drop("kid")
    val k2 = s1.groupBy(col("norm_key")).agg(min("doc_id").as("kid"))
    val s2 = s1.join(k2, Seq("norm_key")).where(col("doc_id") === col("kid")).drop("kid")
    val existing: Option[DataFrame] =
      if (graft.util.Fs.exists(spark, data)) {
        // tombstone-filtered: a deleted document must not reject a
        // fresh arrival as its duplicate ([[deleteDocs]])
        val c = graft.llm.Tombstones.filter(spark, corpusDir,
          spark.read.parquet(data).where(col("batch_id") =!= batchId),
          Seq("doc_id"))
        Some(c.select(col("h"), col("norm_key")))
      } else None
    val novel = existing match {
      case Some(corpus) =>
        s2.join(corpus.select("h").distinct(), Seq("h"), "left_anti")
          .join(corpus.select("norm_key").distinct(), Seq("norm_key"), "left_anti")
      case None => s2
    }
    val survivors = nearDupIndexDir match {
      case Some(idxDir) =>
        val held: Option[DataFrame] =
          if (graft.util.Fs.exists(spark, graft.util.Fs.stagePath(spark, idxDir, "bands")))
            // the INDEX's own tombstones ([[deleteDocs]] forwards ids
            // there): a deleted document's bands must not near-dup-
            // reject a fresh arrival
            Some(graft.llm.Tombstones.filter(spark, idxDir,
              spark.read.parquet(graft.util.Fs.stagePath(spark, idxDir, "bands"))
                .where(col("batch_id") =!= batchId), Seq("doc_id")))
          else None
        val out = held match {
          case Some(cb) =>
            val hits = graft.llm.DedupIndex
              .probeAgainst(cb, novel.select(col("doc_id"), col("text")))
              .select(col("batch_doc").as("doc_id")).distinct()
            novel.join(hits, Seq("doc_id"), "left_anti")
          case None => novel
        }
        // Grow the FULL index layout by this batch's survivors — every
        // [[graft.llm.DedupIndex]] artifact, not just the rejection
        // probe's bands, so the streamed corpus serves candidatePairs /
        // signatures / shingleSets consumers (l70-style flow matrices,
        // Jaccard re-scorers) with NO from-scratch rebuild: the
        // streaming form of [[graft.llm.DedupIndex.merge]]'s O(delta)
        // maintenance, with a stronger idempotency posture — merge must
        // gate its APPENDs behind mergeId markers, while here every
        // artifact lands under the batch's own partition directory with
        // mode=overwrite, so a replayed batch rewrites its files
        // byte-identically instead of duplicating (the corpus-write
        // recipe applied to the index itself).
        //
        // Pinned cached (it feeds five writes): safe to re-read the
        // bands dir on each action — the probe's batch_id filter prunes
        // away the partition the bands write below creates.
        val outP = out.select(col("doc_id"), col("text"), col("h"), col("norm_key"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val outDocs = outP.select(col("doc_id"), col("text"))
        val outBands = graft.llm.DedupIndex.bandsOf(outDocs)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
        // An all-rejected (or gate-rejected) batch writes NO index
        // partitions: a partitionBy write of an empty frame leaves a
        // directory holding only _SUCCESS, which the next batch's
        // existence check would see and then fail to read — a
        // permanent crash loop. Replay-idempotent (the replay
        // re-derives the same empty set and skips again).
        if (!outP.isEmpty) {
        outBands
          .write.mode("overwrite").partitionBy("bp")
          .parquet(s"${graft.util.Fs.stagePath(spark, idxDir, "bands")}/batch_id=$batchId")
        // New pairs this batch adds to a rebuild-over-survivors: the
        // delta self-join, plus delta x held-corpus candidates (those
        // are EMPTY by construction — any batch doc with a held-band
        // collision was just rejected — but stating the union keeps the
        // write the exact streaming transcription of merge's pair
        // stage rather than an argument about why half of it vanishes;
        // the probe side is one batch-sized partition-pruned join).
        val crossPairs = held match {
          case Some(cb) =>
            graft.llm.DedupIndex.probeAgainst(cb, outDocs)
              .select(least(col("batch_doc"), col("corpus_doc")).as("doc_a"),
                greatest(col("batch_doc"), col("corpus_doc")).as("doc_b"))
          case None => spark.emptyDataset[(Long, Long)](
            org.apache.spark.sql.Encoders.product[(Long, Long)])
            .toDF("doc_a", "doc_b")
        }
        graft.llm.DedupIndex.pairsOfBands(outBands)
          .unionByName(crossPairs).distinct()
          .write.mode("overwrite").parquet(s"${graft.util.Fs.stagePath(spark, idxDir, "pairs")}/batch_id=$batchId")
        graft.llm.DedupIndex.signaturesOf(outDocs)
          .write.mode("overwrite").parquet(s"${graft.util.Fs.stagePath(spark, idxDir, "signatures")}/batch_id=$batchId")
        graft.llm.DedupIndex.shingleSetsOf(outDocs)
          .write.mode("overwrite").parquet(s"${graft.util.Fs.stagePath(spark, idxDir, "shingle_sets")}/batch_id=$batchId")
        }
        } finally { outBands.unpersist(); () }
        outP
      case None => novel
    }
    // unpersist in a finally so a failed write cannot leak the pinned
    // batch cache into a long-lived streaming driver (unpersist on the
    // un-persisted None branch is a no-op)
    try survivors.select(col("doc_id"), col("text"), col("h"), col("norm_key"))
      .write.mode("overwrite").parquet(s"$data/batch_id=$batchId")
    finally { survivors.unpersist(); () }
  }

  /** Run the ingest fold over a streaming document source. */
  def ingest(docs: DataFrame, corpusDir: String,
      checkpointDir: String, nearDupIndexDir: Option[String] = None,
      driftGate: Boolean = false): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, corpusDir, batchId, nearDupIndexDir, driftGate)
      }
      .start()

  /** Read the gate log (drift statistic + verdict per gated batch).
    * The log rides NEXT TO the `docs/` stage, not inside it, so corpus
    * maintenance swaps ([[compactCorpus]]) cannot destroy it.
    */
  def gateLog(spark: org.apache.spark.sql.SparkSession, corpusDir: String): DataFrame =
    spark.read.parquet(s"$corpusDir/_gate")

  /** Read the accumulated corpus (all batch partitions).
    * Tombstone-filtered ([[deleteDocs]]).
    */
  def corpus(spark: org.apache.spark.sql.SparkSession, corpusDir: String): DataFrame =
    graft.llm.Tombstones.filter(spark, corpusDir,
      spark.read.parquet(dataDir(spark, corpusDir)), Seq("doc_id"))

  /** TIME-TRAVEL read of the streamed corpus along its BATCH axis: the
    * corpus as it stood once micro-batch `n` had committed — every
    * surviving document whose owning batch id is <= `n`. The
    * `batch_id=` replay partitions ARE a history axis the pointer-flip
    * time travel ([[graft.llm.DedupIndex.candidatePairsAsOf]], l96)
    * cannot address: the fold only ever APPENDS batch partitions, and
    * [[compactCorpus]] preserves them, so — unlike generation history,
    * which a retention window bounds — every committed batch stays
    * addressable for the corpus's whole life at zero extra storage
    * ("training run X read the corpus as of batch N" is a partition
    * filter, not a restore). Two scoping rules, both inherited from the
    * fold's own semantics: a batch the drift gate rejected wrote
    * nothing, so it contributes nothing to any snapshot; and CURRENT
    * tombstones still filter — a takedown beats time travel, exactly
    * as on the pointer-flip axis. The filter is on the partition
    * column, so the scan plans only the <= n directories.
    */
  def corpusAsOfBatch(spark: org.apache.spark.sql.SparkSession,
      corpusDir: String, n: Long): DataFrame = {
    require(n >= 0L, s"corpusAsOfBatch($n): negative batch id")
    graft.llm.Tombstones.filter(spark, corpusDir,
      spark.read.parquet(dataDir(spark, corpusDir))
        .where(col("batch_id") <= n), Seq("doc_id"))
  }

  /** DELETE documents from the streamed corpus — the takedown verb on
    * the corpus itself ([[graft.llm.Tombstones]] semantics): O(|ids|)
    * now; [[corpus]] and the fold's exact/canonical rejection probes
    * exclude the deleted documents immediately (a takedown'd page must
    * neither be served nor block a legitimate re-crawl of different
    * content under its old hash — and symmetric takedown policy may
    * well WANT the same bytes re-admittable under a new id: content
    * policy is the caller's, id removal is ours); the next
    * [[compactCorpus]] folds the removals into the `docs/` stage and
    * retires the set one maintenance cycle later. When the fold also
    * maintains a near-dup index
    * (`nearDupIndexDir`), pass it here so the SAME ids tombstone the
    * index artifacts through [[graft.llm.DedupIndex.delete]] — a
    * corpus-only delete would leave the index still probing against
    * the deleted documents' bands. The two tombstone appends are NOT
    * atomic as a pair; the INDEX is tombstoned FIRST, so the one state
    * a crash between them can leave is "bands dead, corpus still
    * serving" — conservative (the probe side is never the stale one:
    * no candidate pair against a doc the operator asked to take down)
    * and converged by simply RETRYING the call, which is idempotent
    * under the at-least-once posture (re-appending the same ids is
    * inert under anti-join semantics and swept by the next fold).
    * Replay caveat: replaying a PRE-delete micro-batch after the fold
    * re-ingests whatever the batch held — delete again, or advance the
    * checkpoint past the deleted batches before folding.
    */
  def deleteDocs(spark: org.apache.spark.sql.SparkSession, corpusDir: String,
      ids: DataFrame, nearDupIndexDir: Option[String] = None): Unit = {
    nearDupIndexDir.foreach(idx => graft.llm.DedupIndex.delete(spark, idx, ids))
    graft.llm.Tombstones.add(spark, corpusDir, ids, "doc_id")
  }

  /** COMPACT the streamed corpus between ingest runs — the
    * [[MediaStream.compactIndex]] maintenance discipline applied to
    * the corpus itself, the one fold artifact that previously had no
    * compaction path: a long-lived stream accretes one file set per
    * micro-batch under `docs/batch_id=N`, and both probe anti-joins
    * and scan planning pay per file forever. The rewrite is
    * content-preserving and keeps the `batch_id=` replay partitions
    * (one file per batch directory afterwards), so a fold resumed
    * later still overwrites its own partition on a crash replay; the
    * gate log survives because it lives OUTSIDE the swapped stage.
    * Run with the stream STOPPED (between ingest runs) — compacting
    * concurrently with an in-flight batch write races the swap.
    *
    * A LEGACY corpus (`batch_id=` partitions directly under
    * `corpusDir`, written before the `docs/` stage existed) is
    * migrated first. On atomic-rename stores each batch partition
    * MOVES under `docs/` (pure metadata renames); on object stores —
    * where rename is a non-atomic copy+delete that a crash can tear
    * mid-partition — the migration is instead ONE content-copy job
    * (read the legacy partitions under their inferred `batch_id=`
    * keys, write the stage in one parquet commit) followed by
    * deleting the legacy partitions, so a torn state is impossible:
    * either the stage write committed or it didn't. Both paths are
    * convergent under a crash — a re-run finishes the remaining moves
    * (or re-runs the copy, content-identically) — and while the
    * corpus is split across the two layouts every read and fold FAILS
    * LOUDLY ([[dataDir]]) instead of silently serving the migrated
    * half; like every swap here, the migration assumes the
    * single-writer maintenance window (stream stopped).
    */
  def compactCorpus(spark: org.apache.spark.sql.SparkSession,
      corpusDir: String, targetFiles: Int = 8,
      swapMode: Option[String] = None): Unit =
      // whole-entry lease ([[graft.llm.IndexMaintenance.withLease]]):
      // the legacy migration and the cohort aging/retirement around
      // the inner (re-entrant) compactStages are maintenance writes too
      graft.llm.IndexMaintenance.withLease(spark, corpusDir) {
    val legacy = graft.util.Fs.listDirNames(spark, corpusDir)
      .filter(_.startsWith("batch_id="))
    if (legacy.nonEmpty) {
      if (graft.util.Fs.atomicRename(spark, corpusDir)) {
        // seed the stage directory so the per-partition renames have a
        // destination parent
        graft.util.Fs.touch(spark, s"$corpusDir/docs/_MIGRATED")
        legacy.foreach { name =>
          require(graft.util.Fs.rename(spark, s"$corpusDir/$name",
              s"$corpusDir/docs/$name"),
            s"corpus migration failed moving $name under $corpusDir/docs/")
        }
      } else {
        // explicit per-partition paths: reading corpusDir whole would
        // hit mixed-directory discovery on a crashed re-run (docs/
        // next to batch_id=), and basePath keeps the batch_id key
        spark.read.option("basePath", corpusDir)
          .parquet(legacy.map(n => s"$corpusDir/$n"): _*)
          .repartition(col("batch_id"))
          .write.mode("overwrite").partitionBy("batch_id")
          .parquet(s"$corpusDir/docs")
        legacy.foreach(n => graft.util.Fs.delete(spark, s"$corpusDir/$n"))
      }
    }
    val observed = graft.llm.Tombstones.beginFold(spark, corpusDir)
    val allFolded = graft.llm.IndexMaintenance.compactStages(spark, corpusDir,
      Seq("docs"), targetFiles, swapMode,
      rowFilter = (_, df) => graft.llm.Tombstones.filter(spark, corpusDir,
        df, Seq("doc_id")))
    // the docs/ stage is the corpus's only id-bearing artifact — the
    // [[deleteDocs]] fold completes here (an attached near-dup index
    // folds its own tombstones in its own compact); retired one
    // maintenance cycle later ([[graft.llm.Tombstones.endFold]])
    if (allFolded) graft.llm.Tombstones.endFold(spark, corpusDir, observed)
  }
}
