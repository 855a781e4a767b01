package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.llm.VectorIndex

/** Continuous embedding-index ingestion — the [[DocStream]] discipline
  * applied to the vector side: a stream of (vec_id, embedding) rows is
  * folded into a persisted [[graft.llm.VectorIndex]] IVF layout where
  * each micro-batch pays only per-delta cost and the index is never
  * rebuilt.
  *
  * Prerequisite: the index's coarse quantizer already exists
  * ([[graft.llm.VectorIndex.trainQuantizer]] over a seed/sample corpus;
  * the lists layout starts EMPTY and is owned by the stream — uniform
  * `batch_id=N/c_id=M` depth, which is why the quantizer is trained
  * standalone rather than via buildIvf's seed lists). This is the
  * frozen-quantizer posture of [[graft.llm.VectorIndex.mergeIvf]]:
  * streaming deltas are assignment + append; retraining the quantizer
  * is an offline rebuild by design.
  *
  * Per micro-batch:
  *   0. OPTIONAL assignment-drift gate (the l73/l81 statistic inside
  *      the fold): the batch's quantizer-cell histogram vs the held
  *      lists'; a drifted batch is rejected whole, verdict logged under
  *      `_gate/batch_id=N`;
  *   1. id dedup — drop rows whose vec_id is already held (and keep the
  *      deterministic array-min row per vec_id within the batch);
  *   2. OPTIONAL embedding near-dup rejection (the SemDeDup gate as a
  *      streaming stage): a batch vector is rejected when some HELD
  *      vector in one of its `nprobe` nearest lists has quantized
  *      cosine >= `dupCosX1e6` — the candidate join is pruned to the
  *      batch's own probed `c_id=` partitions, so the corpus cost is
  *      nprobe/K of the lists, not a scan;
  *   3. frozen-quantizer assignment of survivors (broadcast centroid
  *      join, the buildIvf argmax verbatim);
  *   4. idempotent append — survivors land under
  *      `lists/batch_id=N/c_id=...` with mode=overwrite, and every
  *      probe excludes `batch_id = batchId`, so a replayed batch
  *      re-probes against everyone else, rewrites its own files
  *      byte-identically, and is a no-op (the [[DocStream]] replay
  *      recipe).
  *
  * [[graft.llm.VectorIndex.searchIvf]] works unchanged over the grown
  * layout: `batch_id` is just an extra partition layer above `c_id`,
  * and the search's dynamic-partition-pruned equi-join on `c_id` prunes
  * across every batch directory. VecStreamSpec pins the post-stream
  * lists equal to a frozen-quantizer assignment of the surviving
  * vectors and search parity against a [[graft.llm.VectorIndex.mergeIvf]]
  * fold of the same survivors.
  */
object VecStream {

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.VectorFunctions.vecDot(a, b)

  /** One micro-batch of the ingest fold; exposed for direct replay
    * testing. `batch` needs (vec_id, embedding). `indexDir` must hold
    * `centroids/`; `lists/` grows per batch.
    */
  def ingestBatch(batch: DataFrame, indexDir: String, batchId: Long,
      nprobe: Int = 4, dupCosX1e6: Option[Long] = None,
      driftGate: Boolean = false, balanceAudit: Boolean = false,
      pqCodes: Boolean = false): Unit = {
    val spark = batch.sparkSession
    val cent = spark.read.parquet(graft.util.Fs.stagePath(spark, indexDir, "centroids"))
    // In-batch id dedup. The survivor per vec_id must be DETERMINISTIC
    // (the groupBy key itself can't tiebreak — it is constant within
    // the group): a replayed batch carrying the same vec_id with
    // different embeddings has to rewrite its files byte-identically,
    // so the min is taken over the embedding values (array ordering is
    // lexicographic and total), not over arrival order.
    val e = batch
      .groupBy(col("vec_id")).agg(min(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    // "no held index yet" is an EXISTENCE question, not an exception to
    // swallow: a broad AnalysisException catch here would fold a genuine
    // schema/path error into "empty corpus" and silently re-run the
    // batch as batch-0. With the Fs.exists test, a present-but-broken
    // layout fails the batch loudly instead of degrading.
    // tombstone-filtered ([[graft.llm.VectorIndex.deleteIvf]]): a
    // deleted vector must not id-block or near-dup-reject a fresh
    // arrival, nor shape the drift reference
    val held: Option[DataFrame] =
      if (graft.util.Fs.exists(spark, graft.util.Fs.stagePath(spark, indexDir, "lists")))
        Some(graft.llm.Tombstones.filter(spark, indexDir,
          spark.read.parquet(graft.util.Fs.stagePath(spark, indexDir, "lists"))
            .where(col("batch_id") =!= batchId), Seq("vec_id")))
      else None
    // the buildIvf/mergeIvf frozen-quantizer argmax — needed for the
    // drift gate's histogram, the near-dup probe (which lists to look
    // in), and the final append, so it is computed once off the whole
    // deduped batch and PINNED for the batch's lifetime (each consumer
    // would otherwise re-run the broadcast argmax)
    val assignedAll = e.join(broadcast(cent))
      .select(col("vec_id"),
        struct(col("embedding"), col("nrm"), col("c_id")).as("v"),
        struct(floor(dot(col("embedding"), col("cv")) / (col("nrm") * col("cn"))
            * 1e6 + 0.5).cast("long").as("cc"),
          (-col("c_id")).as("nc")).as("k"))
      .groupBy("vec_id").agg(max_by(col("v"), col("k")).as("v"))
      .select(col("vec_id"), col("v.embedding").as("embedding"),
        col("v.nrm").as("nrm"), col("v.c_id").as("c_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // Assignment-drift gate (the l73/l81 statistic run INSIDE the
    // fold): the arriving batch's quantizer-cell histogram is compared
    // against the HELD lists' stored assignments — a broken encoder
    // emitting one constant direction floods a single IVF cell, which
    // a norm check cannot see on unit vectors — and a drifted batch is
    // rejected WHOLE. The reference excludes this batch's own
    // partition and an empty reference is ungated (batch-0 replay), so
    // the verdict is replay-stable; it lands under `_gate/batch_id=N`
    // with mode=overwrite (the DocStream gate-log recipe). Cost: the
    // batch argmax it needs anyway + ONE pruned column of the lists.
    // (and an EMPTY batch is ungated — no distribution to judge, no
    // writes to block)
    val gateRejected: Boolean = driftGate && !batch.isEmpty && {
      val ref = held.filter(!_.isEmpty)
      val verdict = ref.map { h =>
        val row = graft.llm.LlmQueries.driftOfBuckets(
            h.select((col("c_id") % 8).cast("long").as("bucket")),
            assignedAll.select((col("c_id") % 8).cast("long").as("bucket")),
            graft.llm.LlmQueries.VecDriftBarX1e4)
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
    val gated = if (gateRejected) assignedAll.where(lit(false)) else assignedAll
    // the ID gate blocks on held ids PLUS live tombstones: a deleted
    // id's re-arrival before the fold would otherwise be admitted and
    // then silently re-deleted by the read filter — a tombstoned id
    // stays "taken" until a compact/retrain retires it (the streaming
    // form of the mergeIvf tombstone guard, drop-not-fail because a
    // fold rejects rows, not batches)
    val takenIds: Option[DataFrame] = {
      val heldIds = held.map(_.select(col("vec_id")))
      val tombIds =
        if (graft.llm.Tombstones.any(spark, indexDir))
          Some(graft.llm.Tombstones.ids(spark, indexDir)
            .withColumnRenamed("id", "vec_id"))
        else None
      (heldIds, tombIds) match {
        case (Some(a), Some(b)) => Some(a.unionByName(b))
        case (a, b)             => a.orElse(b)
      }
    }
    val assigned = takenIds match {
      case Some(ids) => gated.join(ids, Seq("vec_id"), "left_anti")
      case None      => gated
    }
    val survivors = (held, dupCosX1e6) match {
      case (Some(h), Some(thr)) =>
        // multi-probe near-dup gate: candidates only from the batch's
        // nprobe nearest lists — the scan is pruned to those c_id=
        // partitions (the searchIvf I/O shape), never the full corpus
        val probes = assigned.select(col("vec_id"), col("embedding"), col("nrm"))
          .join(broadcast(cent))
          .select(col("vec_id"), col("embedding"), col("nrm"), col("c_id"),
            floor(dot(col("embedding"), col("cv")) / (col("nrm") * col("cn"))
              * 1e6 + 0.5).cast("long").as("cc"))
          .withColumn("r", row_number().over(
            Window.partitionBy("vec_id").orderBy(col("cc").desc, col("c_id").asc)))
          .where(col("r") <= nprobe)
          .select(col("vec_id"), col("embedding"), col("nrm"), col("c_id"))
        val dups = probes
          .join(h.select(col("c_id"), col("embedding").as("hv"), col("nrm").as("hn")),
            Seq("c_id"))
          .where(floor(dot(col("embedding"), col("hv")) / (col("nrm") * col("hn"))
            * 1e6 + 0.5).cast("long") >= thr)
          .select(col("vec_id")).distinct()
        assigned.join(dups, Seq("vec_id"), "left_anti")
      case _ => assigned
    }
    val outP = survivors
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // An EMPTY survivor set (empty source batch, drift-rejected batch,
    // or every row deduplicated away) writes NOTHING: a partitionBy
    // write of an empty frame emits a directory with _SUCCESS but no
    // schema-bearing data file, which the next batch's existence check
    // would see and then fail to read — a permanent crash loop. The
    // skip is replay-idempotent (the replayed batch re-derives the
    // same empty set and skips again), and the gate verdict above was
    // already recorded.
    val hasRows = !outP.isEmpty
    // The PQ half of the serving path, fed by the SAME fold: the
    // survivors' 4-byte codes are assigned against the held codebook
    // ([[graft.llm.VectorIndex.codesOf]] — the buildPq/mergePq argmin
    // verbatim) and land under their own replay-owned batch partition,
    // so a streamed index serves [[graft.llm.VectorIndex.searchIvfPq]]
    // directly. The mergePq invalidation/provenance discipline rides
    // along: any aligned layout's serving gate drops BEFORE the codes
    // land (search falls back to the always-correct membership join),
    // and the batch's membership and code rows are recorded under
    // replay-stable `pid=batch_<N>` pending partitions so the next
    // alignPqToLists is the O(delta) join of the pending frames.
    if (pqCodes && hasRows) {
      require(graft.util.Fs.exists(spark,
          graft.util.Fs.stagePath(spark, indexDir, "pq_codebook")),
        s"pqCodes ingest at $indexDir needs a persisted pq_codebook " +
          "(VectorIndex.trainPqCodebook over the seed corpus)")
      val codebook = spark.read.parquet(
        graft.util.Fs.stagePath(spark, indexDir, "pq_codebook"))
      // The consumed-pid ledger check ([[graft.llm.VectorIndex
      // .alignPqToLists]]): a crash-REPLAYED batch whose pending record
      // an align already absorbed must not re-pend (the incremental
      // path would re-append rows the artifact already holds) — and
      // since its data rewrites are byte-identical by this fold's
      // pinned determinism, the aligned rows stay exact (the serving
      // gate accordingly stays up for an absorbed replay).
      val absorbed = graft.llm.VectorIndex
        .consumedPids(spark, s"$indexDir/pq_codes_by_list")
        .contains(s"batch_$batchId")
      // the aligned artifact's serving gate must drop BEFORE any
      // serving-path append below lands (the mergeIvf invariant) — a
      // search racing this batch would otherwise take the aligned path
      // and silently miss the batch's vectors
      if (!absorbed) graft.llm.VectorIndex.invalidateAligned(spark, indexDir)
      val codes = graft.llm.VectorIndex.codesOf(
          outP.select(col("vec_id"), col("embedding")), codebook)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // mergeIvf's ordering, mirrored: BOTH `_align_pending` records
        // land BEFORE the batch-partition appends they describe.
        // [[graft.llm.VectorIndex.alignPqToLists]]' no-pending branch
        // restores the aligned artifact's serving gate on the
        // assumption that gate-down + no-pending means "lists
        // unchanged" — appending the lists partition first would open
        // a crash window (lists committed, pending not yet recorded)
        // where an align run during the outage re-gates an aligned
        // artifact missing this batch's vectors, and the aligned
        // search path silently drops them until the replay lands.
        if (!absorbed) {
          outP.select(col("vec_id"), col("c_id")).coalesce(1)
            .write.mode("overwrite")
            .parquet(s"$indexDir/_align_pending/lists/pid=batch_$batchId")
          codes.coalesce(1).write.mode("overwrite")
            .parquet(s"$indexDir/_align_pending/codes/pid=batch_$batchId")
        }
        outP.repartition(col("c_id"))
          .write.mode("overwrite").partitionBy("c_id")
          .parquet(s"${graft.util.Fs.stagePath(spark, indexDir, "lists")}/batch_id=$batchId")
        codes.coalesce(1).write.mode("overwrite")
          .parquet(s"${graft.util.Fs.stagePath(spark, indexDir, "pq_codes")}/batch_id=$batchId")
      } finally { codes.unpersist(); () }
    } else if (hasRows) {
      outP.repartition(col("c_id"))
        .write.mode("overwrite").partitionBy("c_id")
        .parquet(s"${graft.util.Fs.stagePath(spark, indexDir, "lists")}/batch_id=$batchId")
    }
    } finally { outP.unpersist(); () }
    // Post-append cell-balance audit (the l83 statistic as fold
    // bookkeeping): records the retrain verdict under
    // `_maintenance/balance` for the next maintenance window's
    // [[graft.llm.VectorIndex.maintainIfDue]] — the frozen-quantizer
    // drift this fold accumulates by design is then consumed by a
    // proven actuator instead of terminating in a human. Cost per
    // batch: one pruned read of the lists' partition column + a
    // K-bounded agg; overwrite semantics make replays idempotent.
    if (balanceAudit && graft.util.Fs.exists(spark,
        graft.util.Fs.stagePath(spark, indexDir, "lists")))
      VectorIndex.auditCellBalance(spark, indexDir): Unit
    } finally { assignedAll.unpersist(); () }
  }

  /** Run the ingest fold over a streaming (vec_id, embedding) source. */
  def ingest(vecs: DataFrame, indexDir: String, checkpointDir: String,
      nprobe: Int = 4, dupCosX1e6: Option[Long] = None,
      driftGate: Boolean = false, balanceAudit: Boolean = false,
      pqCodes: Boolean = false): StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, indexDir, batchId, nprobe, dupCosX1e6, driftGate,
          balanceAudit, pqCodes)
      }
      .start()

  /** Read the gate log (drift statistic + verdict per gated batch). */
  def gateLog(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/_gate")
}
