package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF index LIFECYCLE — build once, persist, search many: the
  * deployment shape real ANN systems run, complementing the in-line
  * l14 query (which rebuilds its index per run, fine for a benchmark,
  * wrong for a serving path).
  *
  * Layout: `indexDir/centroids` holds the stride-sampled coarse
  * quantizer (bounded at ~1000 rows regardless of corpus size — the
  * l14 discipline, ≈256 KB broadcast at 10⁹ vectors);
  * `indexDir/lists` holds every vector's (embedding, norm) PARTITIONED
  * BY its centroid id — the inverted lists ARE the directory layout.
  * A search then reads only its probed lists: the probe set joins the
  * list table on the partition column, and Spark's dynamic partition
  * pruning turns that join into directory-level skipping (pinned by
  * VectorIndexSpec), so search I/O is nprobe/K of the corpus instead
  * of all of it — at 100 TB the difference between a lookup and a
  * table scan.
  */
object VectorIndex {

  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, b)

  private def spark(df: DataFrame): SparkSession = df.sparkSession

  /** Live path of a maintenance-swapped stage — pointer-resolved
    * ([[graft.util.Fs.stagePath]]): identical to `indexDir/<stage>`
    * until a pointer-protocol compact/retrain moves the stage under a
    * `_gen/` generation (object-store maintenance).
    */
  private def stg(ss: SparkSession, indexDir: String, stage: String): String =
    graft.util.Fs.stagePath(ss, indexDir, stage)

  /** Integer-quantized cosine (the suite-wide `floor(cos·10⁶ + .5)`
    * discipline — engine-exact ordering, id tiebreaks).
    */
  private def cosQ(va: Column, na: Column, vb: Column, nb: Column): Column =
    floor(dot(va, vb) / (na * nb) * 1e6 + 0.5).cast("long")

  /** Derive and persist ONLY the coarse quantizer (the stride-sampled
    * centroid table) — for callers that own the lists layout
    * themselves, e.g. the streaming fold
    * ([[graft.streaming.VecStream]]) whose lists grow under
    * replay-idempotent `batch_id=N/c_id=M` partitions and therefore
    * must start from a quantizer with NO seed lists (a mixed-depth
    * layout — seed lists at `c_id=` next to batches at
    * `batch_id=/c_id=` — would break partition discovery).
    */
  def trainQuantizer(embs: DataFrame, indexDir: String,
      lloydIters: Int = 0): Unit =
    writeQuantizer(embs, stg(embs.sparkSession, indexDir, "centroids"), lloydIters)

  /** [[trainQuantizer]]'s mechanics, parameterized on the output path so
    * [[retrainIvf]] can STAGE a new quantizer under `_compact/` instead
    * of overwriting the live one in place.
    *
    * `lloydIters = 0` is the stride-sampling quantizer every existing
    * fixture pins. `lloydIters > 0` refines those seeds with the l28
    * k-means machinery run in QUANTIZED integer space (embeddings
    * scaled x1024 to BIGINT, L2 assignment with the (dist, c_id)
    * tie-break, per-cell floored-mean update, empty cells keeping their
    * previous centroid) — every iteration is exact BIGINT arithmetic,
    * so the refined centroids are engine-reproducible; only the final
    * store converts `m/1024` to float (one IEEE round-to-nearest, the
    * same on any engine). Refinement changes WHERE the cell boundaries
    * sit, not any search formula: the centroid table keeps its
    * (c_id, cv, cn) schema and bounded K, and l85 measures what the
    * refinement buys in recall.
    */
  private def writeQuantizer(embs: DataFrame, centroidsPath: String,
      lloydIters: Int): Unit = {
    val e = embs.select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    val stride = math.max(37L, math.ceil(embs.count() / 1000.0).toLong)
    val seeds = e.where(col("vec_id") % stride === 11)
    val cents =
      if (lloydIters <= 0)
        seeds.select(col("vec_id").as("c_id"), col("embedding").as("cv"),
          col("nrm").as("cn"))
      else {
        val quant = embs.select(col("vec_id"),
          transform(col("embedding"),
            x => floor(x.cast("double") * 1024.0 + 0.5).cast("long")).as("qv"))
        // Codegen'd long L2 — identical exact-integer values to the
        // interpreted zip_with+aggregate fold (see [[LongVectorL2]]).
        def l2(a: Column, b: Column): Column =
          graft.functions.VectorFunctions.vecL2Long(a, b)
        def assignQ(cent: DataFrame): DataFrame =
          quant.join(broadcast(cent))
            .select(col("vec_id"), col("qv"), col("c_id"),
              l2(col("qv"), col("cv")).as("dist"))
            .groupBy(col("vec_id"))
            .agg(min_by(struct(col("qv"), col("c_id")),
              struct(col("dist"), col("c_id"))).as("m"))
            .select(col("m.qv").as("qv"), col("m.c_id").as("c_id"))
        def updateQ(prev: DataFrame, asg: DataFrame): DataFrame = {
          val means = asg.select(col("c_id"),
              explode(sequence(lit(1), lit(64))).as("pos"), col("qv"))
            .select(col("c_id"), col("pos"),
              element_at(col("qv"), col("pos")).as("v"))
            .groupBy("c_id", "pos")
            .agg(sum("v").as("sv"), count(lit(1)).as("n"))
            .select(col("c_id"), col("pos"),
              floor(col("sv").cast("double") / col("n")).cast("long").as("m"))
            .groupBy("c_id")
            .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
              s0 => s0.getField("m")).as("mv"))
          prev.join(means, Seq("c_id"), "left")
            .select(col("c_id"),
              coalesce(col("mv"), col("cv")).as("cv"))
        }
        var cur = seeds.select(col("vec_id").as("c_id"),
          transform(col("embedding"),
            x => floor(x.cast("double") * 1024.0 + 0.5).cast("long")).as("cv"))
        for (_ <- 1 to lloydIters) cur = updateQ(cur, assignQ(cur))
        val cv = transform(col("cv"),
          x => (x.cast("double") / 1024.0).cast("float"))
        cur.select(col("c_id"), cv.as("cv"))
          .select(col("c_id"), col("cv"),
            sqrt(dot(col("cv"), col("cv"))).as("cn"))
      }
    cents.write.mode(SaveMode.Overwrite).parquet(centroidsPath)
  }

  /** The buildIvf/mergeIvf/retrainIvf assignment, verbatim-shared:
    * arg-max by AGGREGATION, not a rank window — the (vector x centroid)
    * join blows the row count up K-fold, and a window would shuffle and
    * sort all of it by vec_id. max_by gets map-side partial combining —
    * each partition reduces to one candidate per vector before the only
    * shuffle — and the (cc, -c_id) struct ordering reproduces the
    * window's exact deterministic tie-break (highest cosine, lowest id).
    */
  private def assignAgainst(e: DataFrame, cent: DataFrame): DataFrame =
    e.join(broadcast(cent))
      .select(col("vec_id"),
        struct(col("embedding"), col("nrm"), col("c_id")).as("v"),
        struct(cosQ(col("embedding"), col("nrm"), col("cv"), col("cn")).as("cc"),
          (-col("c_id")).as("nc")).as("k"))
      .groupBy("vec_id").agg(max_by(col("v"), col("k")).as("v"))
      .select(col("vec_id"), col("v.embedding").as("embedding"),
        col("v.nrm").as("nrm"), col("v.c_id").as("c_id"))

  /** Build and persist the index. `embs` needs (vec_id, embedding).
    * `lloydIters > 0` selects the refined quantizer (see
    * [[trainQuantizer]]); the default is the stride-sampling quantizer
    * every existing oracle pins.
    */
  def buildIvf(embs: DataFrame, indexDir: String, lloydIters: Int = 0): Unit = {
    // see [[DedupIndex.build]]: a rebuild into a layout with live
    // tombstones would silently re-delete rebuilt ids — fail loudly
    require(!Tombstones.any(spark(embs), indexDir),
      s"buildIvf into $indexDir: the layout carries live tombstones — " +
        "fold them first (compact/retrain) or remove the directory")
    val e = embs.select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    trainQuantizer(embs, indexDir, lloydIters)
    // assignment reads the PERSISTED quantizer (stage isolation — the
    // DedupIndex.build discipline: each stage consumes the previous
    // stage's artifact)
    val cent = spark(embs).read.parquet(stg(spark(embs), indexDir, "centroids"))
    val assigned = assignAgainst(e, cent)
    // Align writer tasks with the partition column before the
    // partitioned write: without this every task holding rows of k
    // lists emits k files, so the layout accretes up to tasks×lists
    // small files (and the commit pays per file). Repartitioned, each
    // list is written by one task — file count == list count, the
    // shape a 10⁹-vector index needs; AQE splits any skewed list.
    assigned.repartition(col("c_id")).write.mode(SaveMode.Overwrite)
      .partitionBy("c_id").parquet(stg(spark(embs), indexDir, "lists"))
  }

  /** Incrementally MERGE a delta batch (vec_id, embedding; ids disjoint
    * from the indexed corpus) into a persisted IVF index IN PLACE — the
    * embedding-side daily-crawl path, mirroring
    * [[DedupIndex.merge]]. The delta is assigned to the EXISTING coarse
    * quantizer (one broadcast join against the bounded centroid table)
    * and its rows APPEND into the `c_id`-partitioned lists; the corpus
    * lists are never recomputed or rewritten and search needs no
    * changes. This is the production IVF posture: the quantizer is a
    * versioned artifact retrained OFFLINE when drift warrants (a
    * retrain re-keys every list — necessarily a rebuild), while daily
    * deltas are O(delta) assignment + append. Consequently merged ==
    * rebuild-with-the-SAME-centroids over the union (VectorIndexSpec
    * pins this; l72 pins it against the DuckDB oracle), NOT ==
    * `buildIvf(union)`, whose stride-sampled quantizer would differ.
    *
    * Ids-disjoint is CHECKED before writing (an O(delta) semi-join;
    * the corpus side reads only the pruned vec_id column). The single
    * append is job-atomic; `mergeId` makes a retry of a failed merge
    * safe to re-issue (marker-gated, as in [[DedupIndex.merge]]).
    */
  def mergeIvf(spark: SparkSession, indexDir: String, delta: DataFrame,
      mergeId: Option[String] = None): Unit =
      // merges mutate the same stages the compaction rewrites read and
      // swap — an unleased merge landing mid-rewrite would be silently
      // lost when the staged copy swaps in ([[IndexMaintenance
      // .withLease]]); the lease serializes them loudly instead
      IndexMaintenance.withLease(spark, indexDir) {
    // converge any crashed swap before appending ([[DedupIndex.merge]]'s
    // rationale: a journal replay after this append would discard it)
    IndexMaintenance.recoverStages(spark, indexDir, Seq.empty)
    val marker = mergeId.map(id => s"$indexDir/_merges/$id/lists.done")
    if (marker.exists(graft.util.Fs.isFile(spark, _))) return
    val overlap = delta.select(col("vec_id"))
      .join(spark.read.parquet(stg(spark, indexDir, "lists")).select(col("vec_id")),
        Seq("vec_id"), "left_semi")
      .limit(1).count()
    require(overlap == 0L,
      s"mergeIvf delta shares vec_ids with the indexed corpus at $indexDir")
    requireNotTombstoned(spark, indexDir, delta, "mergeIvf")
    val cent = spark.read.parquet(stg(spark, indexDir, "centroids"))
    val e = delta.select(col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    // the buildIvf assignment verbatim ([[assignAgainst]]): max_by
    // argmax with the (cc, -c_id) struct tie-break, map-side combined
    // over the broadcast centroid join
    val assigned = assignAgainst(e, cent)
    // The aligned PQ code table no longer matches the lists the moment
    // the delta lands, and a stale one serves top-k results that
    // silently MISS every merged vector — invalidated BEFORE the
    // append, so a crash at any point leaves searchIvfPq on the
    // always-correct membership-join fallback until the owner
    // re-runs alignPqToLists.
    invalidateAligned(spark, indexDir)
    val assignedP = assigned
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // Record the delta's membership for the O(delta) re-align: the
      // assignment is already in hand, so provenance costs one extra
      // O(delta) write instead of a corpus-scale reconcile later.
      // mode=overwrite into a per-merge pid= partition — a crash-retry
      // of this merge rewrites it byte-equivalently (invalidation above
      // keeps search on the fallback until the pending record is
      // consumed by alignPqToLists).
      // fenced per append: the assignment job above can outlive the
      // lease TTL on a large delta, and rows landed by a taken-over
      // holder would be silently dropped when the successor's staged
      // rewrite swaps in — heartbeat (or abort loudly) before each
      // write, one map read on the fast path ([[IndexMaintenance.fence]])
      IndexMaintenance.fence(spark, indexDir)
      assignedP.select(col("vec_id"), col("c_id"))
        .coalesce(1)
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$indexDir/_align_pending/lists/pid=${pendingId(mergeId)}")
      // task-per-list alignment, as in build — a delta append otherwise
      // scatters up to tasks×lists files into the layout per merge
      IndexMaintenance.fence(spark, indexDir)
      assignedP.repartition(col("c_id")).write.mode(SaveMode.Append)
        .partitionBy("c_id").parquet(stg(spark, indexDir, "lists"))
    } finally { assignedP.unpersist(); () }
    marker.foreach(graft.util.Fs.touch(spark, _))
  }

  /** Merge-guard companion to the id-overlap check: a delta naming a
    * TOMBSTONED id would append rows the live deletion vector silently
    * filters — a re-delete the caller never asked for. Fail loudly;
    * folding ([[compact]]/[[compactIvf]]+[[compactPq]]/[[retrainIvf]])
    * clears the tombstones and legitimizes the re-add. Identity-cheap
    * when no tombstone set exists.
    */
  private def requireNotTombstoned(spark: SparkSession, indexDir: String,
      delta: DataFrame, op: String): Unit =
    if (Tombstones.any(spark, indexDir)) {
      val hit = delta.select(col("vec_id"))
        .join(Tombstones.ids(spark, indexDir).withColumnRenamed("id", "vec_id"),
          Seq("vec_id"), "left_semi")
        .limit(1).count()
      require(hit == 0L,
        s"$op delta names tombstoned vec_ids at $indexDir — the rows would " +
          "land pre-deleted (silently filtered by the live tombstone set); " +
          "fold the deletes first (compact or retrain), then re-add")
    }

  /** The per-merge provenance-partition id under `_align_pending/` —
    * the mergeId when the caller supplied one (so a crash-retry of the
    * same merge overwrites its own record), a fresh random id
    * otherwise (an unnamed merge claims no replay protocol anywhere).
    * Sanitized to filesystem-safe partition-value characters.
    */
  private def pendingId(mergeId: Option[String]): String = {
    val raw = mergeId.getOrElse(java.util.UUID.randomUUID().toString)
    val clean = raw
      .map(c => if (c.isLetterOrDigit || c == '-' || c == '_' || c == '.') c else '_')
    // sanitization must stay INJECTIVE: "day:1" and "day/1" both clean
    // to "day_1", and colliding pids would let one merge's pending
    // record overwrite another's — the align would then silently never
    // reconcile the overwritten delta. A short hash of the original id
    // disambiguates exactly when characters were replaced.
    if (clean == raw) raw
    else clean + "-" + java.security.MessageDigest.getInstance("MD5")
      .digest(raw.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
  }

  /** Invalidate the [[alignPqToLists]] maintenance artifact. Every
    * mutation of the lists or code tables ([[mergeIvf]]/[[mergePq]]/
    * [[compactIvf]]/[[compactPq]]) calls one of these BEFORE writing: a
    * stale aligned table is the one way this index family can serve
    * silently wrong results (top-k missing merged vectors;
    * compacted-away duplicate rows double-counting ADC partial sums),
    * so staleness is made impossible rather than documented —
    * [[searchIvfPq]] falls back to the membership-join plan until the
    * owner re-aligns.
    *
    * Two strengths, matched to what the mutation did: MERGES only add
    * rows, so they drop the `_SUCCESS` serving gate but KEEP the
    * aligned rows, and record their delta under `_align_pending/` — the
    * next [[alignPqToLists]] is then an O(delta) join of the pending
    * frames. COMPACTS remove rows (the at-least-once duplicate
    * residual), so they drop the whole artifact — rows that no longer
    * exist upstream cannot be reconciled away by a segment write, only
    * by the full rebuild the next align runs (which also supersedes and
    * clears any pending records).
    */
  private[graft] def invalidateAligned(spark: SparkSession, indexDir: String): Unit = {
    graft.util.Fs.delete(spark, s"$indexDir/pq_codes_by_list/_SUCCESS")
    // A RETAINED historical copy keyed by the CURRENT coarse generation
    // can only exist after a retrain that retained the artifact but
    // crashed before its pointer flip ([[retainAligned]]) — the pair it
    // names is then still live and still growing, and the mutation
    // landing now makes that frozen copy stale for it. Its serving gate
    // drops with the live one; the one-probe guard keeps the common
    // no-history path at a single existence check.
    if (graft.util.Fs.exists(spark, s"$indexDir/_gen/pq_codes_by_list")) {
      val cur = IndexMaintenance.liveGenNumber(spark, indexDir, "lists")
      graft.util.Fs.delete(spark,
        s"$indexDir/_gen/pq_codes_by_list/g$cur/_RETAINED")
    }
  }

  /** The hard form, for content-REMOVING mutations of the LIVE stages
    * ([[retrainIvf]]'s re-key when nothing is retainable): rows that no
    * longer exist upstream cannot be reconciled by an append, only by
    * the full rebuild the next [[alignPqToLists]] runs.
    */
  private def dropAligned(spark: SparkSession, indexDir: String): Unit =
    graft.util.Fs.delete(spark, s"$indexDir/pq_codes_by_list")

  /** [[dropAligned]] plus every RETAINED historical copy — for the
    * tombstone-FOLDING compacts: a fold retires the tombstone set, and
    * a frozen historical code copy written before the fold still
    * carries the deleted rows, so serving it afterwards would
    * resurrect them (the membership-join historical plan stays exact —
    * its codes side is the folded LIVE table). History then falls back
    * to the membership join, the l80 discipline; conservative for a
    * tombstone-free compact, and stated in [[compactIvf]]'s docs.
    */
  private def dropAlignedAll(spark: SparkSession, indexDir: String): Unit = {
    dropAligned(spark, indexDir)
    graft.util.Fs.delete(spark, s"$indexDir/_gen/pq_codes_by_list")
  }

  /** RETAIN the aligned code artifact alongside the coarse pair a
    * [[retrainIvf]] flip supersedes — closing the one asymptotic gap
    * the historical IVFADC read had: `pq_codes_by_list` is keyed by
    * the superseding quantizer's c_ids only AFTER a re-align, but the
    * copy that exists AT the flip is keyed by the SUPERSEDED
    * quantizer's c_ids — exactly the key space a depth-1 historical
    * read probes — so instead of dropping it, the retrain moves it to
    * `_gen/pq_codes_by_list/g<N>` (N = the coarse pair's generation
    * number being superseded, lockstep with `_gen/lists/gN`) and
    * [[searchIvfPqAsOf]] serves the probe-pruned aligned scan at depth,
    * falling back to the membership join when no copy was retained.
    *
    * Retainable only when the artifact's `_SUCCESS` gate is up (in
    * sync with the live lists — any unreconciled merge already dropped
    * the gate) and the flip is pointer-protocol (rename-protocol swaps
    * retain no history at all). The move is gate-bracketed for
    * crash-safety on stores whose rename is not atomic: `_SUCCESS` is
    * dropped first (live reads fall back during the move), and the
    * retained copy serves only once its own `_RETAINED` gate lands
    * after the rename — a torn move leaves an ungated directory the
    * next retention attempt deletes. A rename FAILURE degrades to the
    * plain drop (leaving a re-keyed artifact in place would let the
    * next align's no-pending branch re-gate stale c_ids). A retained
    * copy whose flip never happened (retrain crashed before the swap)
    * is un-gated by the next mutation of its still-live pair
    * ([[invalidateAligned]]). Retention budget: the same
    * `spark.graft.index.retainGens` window the coarse generations
    * keep — history the lists no longer serve is useless to the codes.
    */
  private def retainAligned(spark: SparkSession, indexDir: String,
      swapMode: Option[String]): Unit = {
    val alignedDir = s"$indexDir/pq_codes_by_list"
    val keepRoot = s"$indexDir/_gen/pq_codes_by_list"
    val retain = IndexMaintenance.retainGens(spark, indexDir)
    val cur = IndexMaintenance.liveGenNumber(spark, indexDir, "lists")
    if (retain > 0 &&
        IndexMaintenance.pointerMode(spark, indexDir, swapMode) &&
        graft.util.Fs.isFile(spark, s"$alignedDir/_SUCCESS")) {
      val keep = s"$keepRoot/g$cur"
      graft.util.Fs.delete(spark, keep) // a torn copy from a crashed attempt
      // Drop ALL serving/align markers before the move, not just the
      // read gate: on a copy+delete store a crash mid-rename can leave
      // a partially-emptied SOURCE, and a surviving `_BASE` would send
      // the next alignPqToLists down the incremental no-pending branch
      // — re-gating an artifact whose rows were already moved away
      // (silently missing vectors). Marker-free, the torn source can
      // only be replaced by the full rebuild. The retained copy needs
      // none of them (it serves reads under its own `_RETAINED` gate).
      graft.util.Fs.delete(spark, s"$alignedDir/_SUCCESS")
      graft.util.Fs.delete(spark, s"$alignedDir/_BASE")
      graft.util.Fs.delete(spark, s"$alignedDir/_CONSUMED")
      // HDFS-semantics stores reject a rename into a missing parent
      // (local FS creates it implicitly — a portability trap)
      graft.util.Fs.mkdirs(spark, keepRoot)
      if (graft.util.Fs.rename(spark, alignedDir, keep))
        graft.util.Fs.touch(spark, s"$keep/_RETAINED")
      else dropAligned(spark, indexDir)
    } else dropAligned(spark, indexDir)
    // The out-of-window TRIM does NOT run here: it runs in the next
    // maintenance entry's hygiene pass ([[IndexMaintenance]]
    // recoverByPointer), in the same pass that GCs the lists
    // generations the copies serve next to — trimming at flip time
    // would delete an aligned directory one whole cycle before its
    // lists go, breaking the reader contract ("safe unless it spans
    // two whole maintenance cycles") for an in-flight historical read
    // that already resolved the copy.
  }

  /** COMPACT a persisted IVF index in place — [[DedupIndex.compact]]'s
    * maintenance discipline applied to the embedding side. Every
    * [[mergeIvf]] appends one file generation into each touched `c_id=`
    * list (a year of daily deltas multiplies search I/O planning cost
    * per list), and the marker residual window can leave duplicate
    * rows; the rewrite restores one file per list and exact-set
    * contents. The bounded `centroids` artifact is overwrite-only and
    * never grows, so it is left untouched. A streamed index's
    * `batch_id=N/c_id=M` layout ([[graft.streaming.VecStream]]) is
    * preserved. Merge markers are cleared — a replayed old mergeId
    * afterwards fails loudly on the id-overlap guard.
    */
  def compactIvf(spark: SparkSession, indexDir: String,
      targetFiles: Int = 8, swapMode: Option[String] = None): Unit =
      // whole-entry lease: the aligned-table drop and the cohort
      // aging/retirement around the inner (re-entrant) compactStages
      // are maintenance writes too
      IndexMaintenance.withLease(spark, indexDir) {
    // a crashed-merge duplicate row this rewrite removes from the lists
    // could survive in the aligned code table and double-count that
    // vector's ADC partial sums — drop the artifact first (removed rows
    // cannot be reconciled by an append; see [[invalidateAligned]]),
    // and the RETAINED historical copies with it: the tombstone fold
    // this compact may complete retires ids those frozen copies still
    // carry ([[dropAlignedAll]])
    dropAlignedAll(spark, indexDir)
    val observed = Tombstones.beginFold(spark, indexDir)
    val allFolded = IndexMaintenance.compactStages(spark, indexDir,
      Seq("lists"), targetFiles,
      swapMode, rowFilter = vecTombstoneFold(spark, indexDir))
    // tombstones retire only once every id-bearing stage is folded — a
    // live pq_codes stage may still hold the deleted rows
    if (allFolded &&
        !graft.util.Fs.exists(spark, stg(spark, indexDir, "pq_codes")))
      Tombstones.endFold(spark, indexDir, observed)
  }

  /** [[compactIvf]] for the PQ artifacts: rewrites `pq_codes` distinct
    * into O(targetFiles) files (the codebook, like the IVF centroids,
    * is bounded and overwrite-only). Clears merge markers.
    */
  def compactPq(spark: SparkSession, indexDir: String,
      targetFiles: Int = 8, swapMode: Option[String] = None): Unit =
      IndexMaintenance.withLease(spark, indexDir) {
    dropAlignedAll(spark, indexDir)
    val observed = Tombstones.beginFold(spark, indexDir)
    val allFolded = IndexMaintenance.compactStages(spark, indexDir,
      Seq("pq_codes"),
      targetFiles, swapMode, rowFilter = vecTombstoneFold(spark, indexDir))
    // the delete fold is complete only when EVERY id-bearing stage has
    // been rewritten — retiring with live tombstoned rows still in the
    // lists would (one cycle later) resurrect them
    if (allFolded &&
        !graft.util.Fs.exists(spark, stg(spark, indexDir, "lists")))
      Tombstones.endFold(spark, indexDir, observed)
  }

  /** DELETE vectors from the index — the takedown verb, mirroring
    * [[DedupIndex.delete]] ([[Tombstones]] semantics): O(|ids|) now,
    * one anti-join per read until the next fold. Every serving path
    * ([[searchIvf]]/[[searchIvfFiltered]]/[[searchIvfPq]]/[[searchPq]],
    * including the aligned code layout) excludes deleted vectors from
    * the moment this returns; [[compact]] (or [[compactIvf]] +
    * [[compactPq]], or a [[retrainIvf]]) folds the removals into the
    * artifacts. The frozen quantizer and PQ codebook are MODELS, not
    * copies — a delete does not un-train them; removing a deleted
    * vector's influence on the quantizer is what [[retrainIvf]] (which
    * trains on the tombstone-filtered corpus) is for.
    *
    * Re-adding a deleted id: [[mergeIvf]]/[[mergePq]] fail loudly while
    * the tombstone is live (the rows would land pre-deleted); fold
    * first.
    */
  def deleteIvf(spark: SparkSession, indexDir: String,
      ids: DataFrame): Unit =
    Tombstones.add(spark, indexDir, ids, "vec_id")

  /** The [[deleteIvf]] fold applied to a staged rewrite — both
    * id-bearing stages filter on vec_id.
    */
  private def vecTombstoneFold(spark: SparkSession, indexDir: String)
      : (String, DataFrame) => DataFrame =
    (_, df) => Tombstones.filter(spark, indexDir, df, Seq("vec_id"))

  /** COMPACT every id-bearing stage of the index in ONE maintenance
    * entry — lists and (when present) pq_codes rewritten under a single
    * swap set — and complete the [[deleteIvf]] fold by clearing the
    * tombstone set afterwards. [[compactIvf]]/[[compactPq]] remain the
    * single-stage passes (each folds its own stage and retires only when
    * it was the last id-bearing one); this is the entry an operator
    * runs to retire a takedown in one call.
    */
  def compact(spark: SparkSession, indexDir: String, targetFiles: Int = 8,
      swapMode: Option[String] = None): Unit =
      IndexMaintenance.withLease(spark, indexDir) {
    dropAlignedAll(spark, indexDir)
    val observed = Tombstones.beginFold(spark, indexDir)
    val stages = Seq("lists", "pq_codes")
      .filter(st => graft.util.Fs.exists(spark, stg(spark, indexDir, st)))
    val allFolded = IndexMaintenance.compactStages(spark, indexDir, stages,
      targetFiles, swapMode, rowFilter = vecTombstoneFold(spark, indexDir))
    if (allFolded) Tombstones.endFold(spark, indexDir, observed)
  }

  /** RETRAIN the coarse quantizer over the CURRENT corpus and re-key
    * every inverted list — the actuator for l83's cell-balance verdict.
    * [[mergeIvf]] and [[graft.streaming.VecStream]] freeze the
    * quantizer by design (daily deltas are O(delta) assignment+append);
    * the price is drift: a frozen quantizer trained on last year's
    * distribution concentrates this year's mass into few cells, and
    * l83 measures exactly when that passes the 3x bar. This is the
    * offline rebuild those docstrings promise.
    *
    * Semantics: retrained index == `buildIvf(current corpus)`, exactly
    * — same stride rule (over the current corpus size), same argmax,
    * same layout — so l84 pins parity in closed form against the
    * oracle. The corpus is read from the lists themselves (vec_id,
    * embedding — DISTINCT, since a retrain is a rebuild and absorbs
    * any at-least-once duplicate residual like a compact would).
    * `lloydIters` selects the refined quantizer, as in [[buildIvf]].
    *
    * Mechanics: both replacement stages (`centroids`, re-keyed `lists`)
    * are STAGED under `_compact/` with buildIvf's own write shapes and
    * swapped in under [[IndexMaintenance.swapStages]]'s intent-marked
    * protocol — at every kill point a recovery pass (re-running
    * retrain, or any compact) converges the pair to a complete
    * generation; the staged copies are `_SUCCESS`-gated so a partial
    * rewrite is never swapped. Between the two stage swaps the index
    * briefly pairs generations, so the single-writer maintenance
    * contract extends to serving: do not serve between a retrain CRASH
    * and its recovery (a completed call has no such window for readers
    * that resolve each search from the final directories). The PQ code
    * table is quantizer-independent and survives as-is; the ALIGNED
    * code layout is keyed by c_id, so the live view drops it — but a
    * gate-complete copy is keyed by exactly the quantizer this flip
    * supersedes, and a POINTER retrain therefore RETAINS it next to
    * the superseded coarse pair ([[retainAligned]]) for
    * [[searchIvfPqAsOf]]'s historical fast path, dropping it only when
    * nothing valid is in hand; pending provenance is superseded by the
    * rebuild the next [[alignPqToLists]] runs. Merge markers are
    * cleared — a replayed old mergeId afterwards fails loudly on the
    * id-overlap guard.
    */
  def retrainIvf(spark: SparkSession, indexDir: String,
      lloydIters: Int = 0, swapMode: Option[String] = None): Unit =
      IndexMaintenance.withLease(spark, indexDir) {
    val stages = Seq("centroids", "lists")
    IndexMaintenance.recoverStages(spark, indexDir, stages, swapMode)
    val observedTombstones = Tombstones.beginFold(spark, indexDir)
    val live = spark.read.parquet(stg(spark, indexDir, "lists"))
    // A STREAMED layout ([[graft.streaming.VecStream]]) carries a
    // batch_id= partition layer above c_id=; the re-key must preserve
    // it (each row keeps its batch, gets its new list), or the next
    // crash-replayed micro-batch would overwrite its `batch_id=N`
    // subtree into a layout that no longer has one — the mixed-depth
    // corruption the stream's docstring warns about. Post-retrain
    // replays then rewrite their partition under the NEW quantizer:
    // content-consistent with every later probe, exactly as if the
    // batch had arrived after the retrain.
    val streamed = live.columns.contains("batch_id")
    // tombstone-filtered: a retrain is a rebuild of the CURRENT corpus,
    // and the current corpus excludes deleted vectors — this is also
    // where a delete's influence on the quantizer itself is removed
    // (the one thing read-side filtering cannot do)
    val corpus = Tombstones.filter(spark, indexDir, live, Seq("vec_id"))
      .select(col("vec_id"), col("embedding")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // a fully-deleted corpus cannot be re-keyed: the partitionBy
      // write of zero rows would swap an unreadable _SUCCESS-only
      // lists stage into place (the compactStages guard, enforced on
      // the retrain path too)
      require(!corpus.isEmpty,
        s"retrainIvf at $indexDir: the tombstone-filtered corpus is " +
          "empty (a takedown of every indexed vector) — decommission " +
          "the index (remove its directory) instead of retraining")
      // staging targets per the store's swap protocol: `_compact/…`
      // where renames are atomic, a fresh unreferenced `_gen/…`
      // generation under the object-store pointer protocol
      val stagedCent = IndexMaintenance.stagedDir(spark, indexDir,
        "centroids", swapMode)
      val stagedLists = IndexMaintenance.stagedDir(spark, indexDir, "lists",
        swapMode)
      writeQuantizer(corpus, stagedCent, lloydIters)
      val cent = spark.read.parquet(stagedCent)
      val e = corpus.select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
      val rekeyed = assignAgainst(e, cent)
      val (withParts, partCols) =
        if (streamed)
          (rekeyed.join(live.select(col("vec_id"), col("batch_id")).distinct(),
            Seq("vec_id")), Seq("batch_id", "c_id"))
        else (rekeyed, Seq("c_id"))
      withParts
        .repartition(partCols.map(col): _*).write.mode(SaveMode.Overwrite)
        .partitionBy(partCols: _*).parquet(stagedLists)
      // the re-key invalidates every c_id-keyed derivative for the LIVE
      // view — but the copy in hand is keyed by the quantizer this flip
      // SUPERSEDES, i.e. exactly the historical read's key space, so a
      // gate-complete artifact is retained next to the superseded
      // coarse pair instead of dropped ([[retainAligned]])
      retainAligned(spark, indexDir, swapMode)
      graft.util.Fs.delete(spark, s"$indexDir/_align_pending")
      IndexMaintenance.swapStages(spark, indexDir, stages, swapMode)
      graft.util.Fs.delete(spark, s"$indexDir/_compact")
      graft.util.Fs.delete(spark, s"$indexDir/_merges")
      // the rebuild folded the lists; the tombstone set retires only if
      // no other id-bearing stage still holds the deleted rows
      if (!graft.util.Fs.exists(spark, stg(spark, indexDir, "pq_codes")))
        Tombstones.endFold(spark, indexDir, observedTombstones)
    } finally { corpus.unpersist(); () }
  }

  /** The documented operational retrain bar: a cell holding 3x its
    * balanced share (`share x K x 10^4 > 30000` — the l83 statistic).
    */
  val RetrainBarX1e4: Long = 30000L

  /** AUDIT the index's cell balance and RECORD the verdict — the l83
    * statistic run as maintenance bookkeeping instead of a declared
    * query: max over non-empty cells of `share x K x 10^4` (10000 =
    * perfectly balanced), judged against `barX1e4`. The verdict lands
    * as one row under `_maintenance/balance` (mode=overwrite — each
    * audit supersedes the last, so replays are idempotent), where
    * [[maintainIfDue]] consumes it; recording even a healthy verdict
    * keeps an audit trail a monitoring scrape can read. Cost: ONE
    * column-pruned read of the lists' partition column, a K-bounded
    * agg, a 1-row collect and a 1-row write — corpus-size-independent
    * beyond the pruned scan, so it is cheap enough to run inside an
    * ingest fold ([[graft.streaming.VecStream]]'s `balanceAudit`).
    * Returns whether a retrain is due.
    */
  def auditCellBalance(spark: SparkSession, indexDir: String,
      barX1e4: Long = RetrainBarX1e4): Boolean = {
    val perCell = spark.read.parquet(stg(spark, indexDir, "lists"))
      .select(col("c_id"))
      .groupBy("c_id").agg(count(lit(1)).as("n"))
    // coalesce: sum/max of ZERO groups are null, and getLong on null
    // throws before any total == 0 guard could run — an empty (but
    // readable) lists artifact must audit as healthy, not crash the
    // fold that asked
    val row = perCell
      .agg(count(lit(1)).as("k"), coalesce(sum(col("n")), lit(0L)).as("total"),
        coalesce(max(col("n")), lit(0L)).as("maxn"))
      .collect().head
    val (k, total, maxn) = (row.getLong(0), row.getLong(1), row.getLong(2))
    // BigInt intermediate: at the advertised 10^9-vector / ~10^6-cell
    // posture, extreme skew makes maxn * k * 10^4 overflow Long — the
    // balance would go negative and report "healthy" in exactly the
    // failure mode this audit exists to catch
    val balance =
      if (total == 0L) 0L
      else (BigInt(maxn) * k * 10000 / total).toLong
    val due = balance > barX1e4
    spark.range(1).select(lit(balance).as("balance_x1e4"),
        lit(barX1e4).as("bar_x1e4"), lit(due).as("retrain"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$indexDir/_maintenance/balance")
    due
  }

  /** Is a recorded retrain verdict pending? (No verdict file = no.) */
  def maintenanceDue(spark: SparkSession, indexDir: String): Boolean =
    graft.util.Fs.isFile(spark,
      s"$indexDir/_maintenance/balance/_SUCCESS") &&
      spark.read.parquet(s"$indexDir/_maintenance/balance")
        .where(col("retrain")).limit(1).count() > 0

  /** CONSUME a recorded retrain verdict: if [[auditCellBalance]] (run
    * directly or inside the ingest fold) left `retrain = true`, run
    * [[retrainIvf]] and clear the verdict — the closed loop the l83
    * audit's 3x bar points at, so the verdict terminates in a proven
    * procedure instead of a human. The verdict is cleared AFTER the
    * retrain commits: a crash mid-retrain leaves it up, and the re-run
    * retrains again (content-idempotent — retrain is a rebuild of the
    * current corpus) rather than silently skipping. Run it in the same
    * single-writer maintenance window every swap here assumes (for a
    * streamed index: with the stream stopped). Returns whether a
    * retrain ran.
    */
  def maintainIfDue(spark: SparkSession, indexDir: String,
      lloydIters: Int = 0): Boolean = {
    val due = maintenanceDue(spark, indexDir)
    if (due) {
      retrainIvf(spark, indexDir, lloydIters)
      graft.util.Fs.delete(spark, s"$indexDir/_maintenance/balance")
    }
    due
  }

  /** Search the persisted index: `queries` needs (query_id, embedding);
    * returns (query_id, rank, neighbor_id, cos_x1e6), top-`topk` by
    * exact re-ranked cosine over the `nprobe` nearest lists.
    */
  def searchIvf(spark: SparkSession, indexDir: String, queries: DataFrame,
      nprobe: Int, topk: Int): DataFrame =
    // snapshot-consistent stage set: a concurrent retrain flip must not
    // compose new centroids with old lists ([[IndexMaintenance
    // .snapshotStages]])
    searchIvfOver(spark, indexDir,
      IndexMaintenance.snapshotStages(spark, indexDir,
        Seq("centroids", "lists")),
      queries, nprobe, topk)

  /** TIME-TRAVEL search: [[searchIvf]] against the index as it was
    * `back` pointer flips ago — the vector side of
    * [[DedupIndex.candidatePairsAsOf]], and the diff instrument the
    * retrain lifecycle needs: a [[retrainIvf]] that regressed recall
    * (trained over a drifted corpus, or under a bad Lloyd
    * refinement) can be searched against the EXACT quantizer+lists
    * pair it replaced, because the retention window
    * (`spark.graft.index.retainGens`) already keeps it on disk.
    * Centroids and lists are resolved at the same depth under the
    * flip-journal seqlock ([[IndexMaintenance.snapshotStagesAsOf]]) —
    * they flip in lockstep (buildIvf writes both; retrain swaps both in
    * one journaled set), so the historical pair is always a coherent
    * index, never new centroids over old lists. The one semantic
    * override, as on the text side: CURRENT tombstones still filter — a
    * takedown beats time travel. Bounded loudly by what retention kept;
    * the error names the widening knob.
    */
  def searchIvfAsOf(spark: SparkSession, indexDir: String,
      queries: DataFrame, nprobe: Int, topk: Int, back: Int): DataFrame =
    searchIvfOver(spark, indexDir,
      IndexMaintenance.snapshotStagesAsOf(spark, indexDir,
        Seq("centroids", "lists"), back),
      queries, nprobe, topk)

  /** BATCH-AXIS time travel on a STREAMED layout
    * ([[graft.streaming.VecStream]]'s `lists/batch_id=N/c_id=M`): the
    * search as the index stood once micro-batch `n` had folded — the
    * vector side of [[graft.streaming.DocStream.corpusAsOfBatch]].
    * Exact by construction: the stream's quantizer is FROZEN (trained
    * standalone before the fold), so "the index as of batch n" is the
    * same centroids over the `batch_id <= n` lists — a PARTITION
    * filter on the outer replay layer, planned before the `c_id=`
    * probe pruning, at zero extra storage (the fold's replay
    * partitions are the history). Unlike the generation axis
    * ([[searchIvfAsOf]]) this history is unbounded — compaction
    * preserves the batch partitions. Current tombstones still filter
    * (a takedown beats time travel). Requires a streamed layout; the
    * read fails loudly on a batch-less index (no `batch_id` column).
    */
  def searchIvfAsOfBatch(spark: SparkSession, indexDir: String,
      queries: DataFrame, nprobe: Int, topk: Int, n: Long): DataFrame = {
    require(n >= 0L, s"searchIvfAsOfBatch($n): negative batch id")
    searchIvfOver(spark, indexDir,
      IndexMaintenance.snapshotStages(spark, indexDir,
        Seq("centroids", "lists")),
      queries, nprobe, topk,
      listsFilter = df => {
        require(df.columns.contains("batch_id"),
          s"searchIvfAsOfBatch at $indexDir: the lists carry no " +
            "batch_id= layer — batch-axis history only exists on a " +
            "streamed (VecStream) layout; use searchIvfAsOf for " +
            "generation history")
        df.where(col("batch_id") <= n)
      })
  }

  /** The [[searchIvf]] serving plan over an already-resolved
    * centroids+lists snapshot — shared by the live, generation-asOf
    * and batch-asOf reads so the three cannot drift. `listsFilter`
    * scopes the candidate lists (the batch-axis partition filter);
    * identity for the live and generation reads.
    */
  private def searchIvfOver(spark: SparkSession, indexDir: String,
      snap: Map[String, String], queries: DataFrame,
      nprobe: Int, topk: Int,
      listsFilter: DataFrame => DataFrame = identity): DataFrame = {
    val cent = spark.read.parquet(snap("centroids"))
    // tombstone filter ([[deleteIvf]]): identity when nothing is
    // deleted; otherwise one anti-join below the probe-pruned list read
    val lists = Tombstones.filter(spark, indexDir,
      listsFilter(spark.read.parquet(snap("lists"))), Seq("vec_id"))
    val q = queries.select(col("query_id"), col("embedding").as("qv"),
      sqrt(dot(col("embedding"), col("embedding"))).as("qn"))
    val probes = q.join(broadcast(cent))
      .select(col("query_id"), col("qv"), col("qn"), col("c_id"),
        cosQ(col("qv"), col("qn"), col("cv"), col("cn")).as("cc"))
      .withColumn("r", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cc").desc, col("c_id").asc)))
      .where(col("r") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("c_id"))
    val scored = probes.join(lists, Seq("c_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosQ(col("qv"), col("qn"), col("embedding"), col("nrm")).as("cos_x1e6"))
    // final ranking through the bounded-heap TopK operator (partial
    // pass below the key shuffle — the probed lists scale with the
    // corpus, the heap state with topk); the window only attaches ranks
    // over the topk-bounded survivors
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_x1e6").desc, col("neighbor_id").asc)
    graft.plans.TopK.perKey(scored, Seq("query_id"),
        Seq(("cos_x1e6", false), ("neighbor_id", true)), topk)
      .withColumn("rank", row_number().over(w))
      .select("query_id", "rank", "neighbor_id", "cos_x1e6")
      .orderBy("query_id", "rank")
  }

  /** FILTERED search — the metadata-predicate ANN every production
    * vector store serves ("top-k among vectors whose document passes
    * this filter"): identical probe pruning to [[searchIvf]], with the
    * caller's `allowed` id set (one `vec_id` column — derive it from
    * any predicate over any table) SEMI-joined into the candidate
    * stream BEFORE the cosine is computed, so disallowed vectors cost
    * neither arithmetic nor heap space. POST-FILTER semantics, stated
    * honestly: candidates come from the `nprobe` nearest lists of the
    * UNFILTERED index, so a very selective filter can return fewer
    * than `topk` rows when the probed lists hold too few allowed
    * vectors — the standard filtered-ANN tradeoff; raise `nprobe` for
    * selective filters, or set `autoOverProbe` and the search scales
    * it for you (the selectivity-aware over-probe production systems
    * run): the effective probe count is [[overProbeOf]] —
    * `min(K, nprobe * ceil(|corpus| / |allowed ∩ corpus|))` — so a filter that
    * passes 1/s of the corpus probes ~s times as many lists, keeping
    * the EXPECTED number of allowed candidates scanned roughly what
    * the unfiltered search would scan, at the same per-list cost
    * model. Returns (query_id, rank, neighbor_id, cos_x1e6).
    */
  def searchIvfFiltered(spark: SparkSession, indexDir: String,
      queries: DataFrame, allowed: DataFrame, nprobe: Int,
      topk: Int, autoOverProbe: Boolean = false): DataFrame = {
    val snap = IndexMaintenance.snapshotStages(spark, indexDir,
      Seq("centroids", "lists"))
    // the over-probe estimate shares THIS search's snapshot: resolved
    // separately it could straddle a flip and size nprobe off a
    // different generation than the one being served (and would pay a
    // second seqlock round for nothing)
    val np = if (autoOverProbe)
      overProbeOfResolved(spark, indexDir, snap, allowed, nprobe)
    else nprobe
    // the ONE shared serving plan ([[searchIvfOver]] — live, asOf and
    // filtered reads cannot drift), with the allowed set semi-joined
    // into the LIST read: below the probe join, so disallowed vectors
    // cost neither the join nor any cosine arithmetic
    searchIvfOver(spark, indexDir, snap, queries, np, topk,
      listsFilter = _.join(allowed.select(col("vec_id")).distinct(),
        Seq("vec_id"), "left_semi"))
  }

  /** The selectivity-aware EFFECTIVE probe count for a filtered search:
    * `min(K, nprobe * ceil(|corpus| / |allowed ∩ corpus|))` — scale
    * the probe width by the filter's inverse selectivity, capped at
    * the quantizer size (probing every list = exact-over-allowed, the
    * natural ceiling). Rationale: post-filter candidates arrive at
    * rate |allowed ∩ corpus|/|corpus| per scanned row, so a filter
    * passing 1/s of the corpus needs ~s× the lists to surface the
    * same number of allowed candidates the unfiltered search would
    * rank. The selectivity is measured against the INTERSECTION with
    * the indexed corpus — the caller's id set may name ids the index
    * does not hold (a predicate over a wider table), and counting
    * those would understate how selective the filter really is where
    * it matters. Cost of the decision: one column-pruned semi-join of
    * the lists' id column against the (usually tiny) allowed set, a
    * metadata-cheap lists `count()`, and the K-bounded centroid
    * count. All-integer arithmetic so the choice is
    * engine-reproducible (l92b's oracle re-derives it in SQL and pins
    * it under the hash gate).
    */
  def overProbeOf(spark: SparkSession, indexDir: String, allowed: DataFrame,
      nprobe: Int): Int =
    overProbeOfResolved(spark, indexDir,
      IndexMaintenance.snapshotStages(spark, indexDir,
        Seq("centroids", "lists")),
      allowed, nprobe)

  /** [[overProbeOf]] against an already-resolved stage snapshot — so
    * [[searchIvfFiltered]]'s estimate and serving read come from the
    * SAME generation set.
    */
  private def overProbeOfResolved(spark: SparkSession, indexDir: String,
      snap: Map[String, String], allowed: DataFrame, nprobe: Int): Int = {
    // live (tombstone-filtered) counts: a deleted vector neither serves
    // nor should weigh in the selectivity estimate
    val lists = Tombstones.filter(spark, indexDir,
      spark.read.parquet(snap("lists")), Seq("vec_id"))
    val total = lists.count()
    val nAllowed = lists.select(col("vec_id"))
      .join(allowed.select(col("vec_id")).distinct(), Seq("vec_id"),
        "left_semi")
      .count()
    val k = spark.read.parquet(snap("centroids")).count()
    if (nAllowed == 0L) nprobe
    else math.min(k, nprobe.toLong * ((total + nAllowed - 1L) / nAllowed)).toInt
  }

  /** Align the PQ code table with the IVF lists: `pq_codes_by_list`
    * holds every (vec_id, sub_id, code) row PARTITIONED BY the owning
    * inverted list's `c_id` (outer) and a merge-segment `mseg` (inner)
    * — the layout change [[searchIvfPq]]'s membership×codes join exists
    * to avoid. Once aligned, the IVF-PQ search reads ONLY the probed
    * lists' code partitions (directory pruning on the outer `c_id`,
    * exactly like the lists themselves) and skips the membership join
    * entirely: at 10⁹ vectors the difference between scanning nprobe/K
    * of the 4-byte codes and all of them.
    *
    * This is a MAINTENANCE artifact — a stale aligned table would
    * silently miss vectors merged after it was written, so every
    * mutation of the lists or code tables INVALIDATES it
    * ([[invalidateAligned]]): the obligation is enforced, not
    * documented. [[searchIvfPq]] uses the aligned layout when its
    * `_SUCCESS` gate is present and falls back to the membership-join
    * plan otherwise.
    *
    * Re-aligning after a merge is O(delta) in BOTH read and write:
    * [[mergeIvf]]/[[mergePq]] record the delta's membership and code
    * rows under `_align_pending/` as they merge (the rows are already
    * in hand — recording them costs one extra O(delta) write), so the
    * reconcile is a join of the two pending frames with NO corpus-scale
    * scan at all. The delta lands as one dynamically-overwritten
    * `mseg=<segment>` generation inside each touched `c_id=` list —
    * a crashed re-align is retried by re-running it: the same pending
    * set derives the same per-pid segments, the overwrite replaces the
    * same leaf directories byte-equivalently, and the pending record
    * is cleared only after the commit (which itself restores the
    * `_SUCCESS` serving gate). Segments are PER PENDING ID
    * (`mseg=p_<pid>`), so convergence survives regrouping too: a
    * crash-replayed stream batch whose pending record reappears after
    * its rows were already aligned overwrites its own segment rather
    * than duplicating rows into a differently-grouped one. No
    * anti-join against the corpus, no double-count window.
    *
    * The first call (and any call after a compact dropped the artifact,
    * or after the owner deletes it to force a repair) takes the FULL
    * path — `pq_codes ⋈ lists` over the whole corpus into the `base`
    * segment — and marks the artifact with `_BASE`; only that marker
    * selects the incremental path, so a half-written base can never be
    * mistaken for one. Single-writer maintenance discipline (the same
    * assumption every merge/compact here makes): one align runs at a
    * time, and not concurrently with a merge.
    *
    * Consumed-pid LEDGER: `pq_codes_by_list/_CONSUMED` lists every pid
    * whose rows the artifact already contains (base or `p_<pid>`
    * segment). It exists for the one producer that is not marker-gated
    * across restarts — a crash-replayed stream batch
    * ([[graft.streaming.VecStream]] `pqCodes`): the replay consults the
    * ledger and skips re-recording a pending record the artifact
    * already absorbed (its data rewrites are byte-identical by the
    * fold's pinned determinism, so the aligned rows stay exact and the
    * serving gate need not drop). Without the ledger, a pending record
    * re-created after a FULL align had absorbed the batch into `base`
    * would be re-appended as a `p_<pid>` segment — duplicated rows,
    * double-counted ADC sums. The ledger lives inside the artifact, so
    * dropping the artifact (compact/retrain) drops it too, and the
    * subsequent full rebuild re-derives everything from scratch.
    */
  def alignPqToLists(spark: SparkSession, indexDir: String): Unit =
      IndexMaintenance.withLease(spark, indexDir) {
    val alignedDir = s"$indexDir/pq_codes_by_list"
    val pendLists = s"$indexDir/_align_pending/lists"
    val pendCodes = s"$indexDir/_align_pending/codes"
    if (!graft.util.Fs.isFile(spark, s"$alignedDir/_BASE")) {
      // full build / no-provenance repair: one corpus-scale join, the
      // price of (re)deriving the artifact from scratch
      val member = spark.read.parquet(stg(spark, indexDir, "lists"))
        .select(col("vec_id"), col("c_id"))
      val codes = spark.read.parquet(stg(spark, indexDir, "pq_codes"))
      // capture the superseded pids and any prior ledger BEFORE the
      // Overwrite wipes the artifact directory
      val superseded = (consumedPids(spark, alignedDir) ++
        graft.util.Fs.listDirNames(spark, pendLists) ++
        graft.util.Fs.listDirNames(spark, pendCodes))
        .map(_.stripPrefix("pid=")).distinct.sorted
      codes.join(member, Seq("vec_id"))
        .withColumn("mseg", lit("base"))
        .repartition(col("c_id"))
        .write.mode(SaveMode.Overwrite).partitionBy("c_id", "mseg")
        .parquet(alignedDir)
      // the full join covered every merged row — pending is superseded;
      // the ledger remembers the absorbed pids so a crash-replayed
      // stream batch does not re-pend rows base already holds
      graft.util.Fs.writeString(spark, s"$alignedDir/_CONSUMED",
        superseded.mkString("\n"))
      graft.util.Fs.delete(spark, s"$indexDir/_align_pending")
      graft.util.Fs.touch(spark, s"$alignedDir/_BASE")
    } else {
      val haveL = graft.util.Fs.exists(spark, pendLists)
      val haveC = graft.util.Fs.exists(spark, pendCodes)
      if (!haveL && !haveC) {
        // nothing pending: the only way the serving gate can be down
        // here is a crash between a merge's invalidation and its
        // pending write (lists unchanged — the artifact is still
        // complete) or an externally-deleted marker; restore it
        graft.util.Fs.touch(spark, s"$alignedDir/_SUCCESS")
        return
      }
      require(haveL && haveC,
        s"re-align at $indexDir found a pending ${if (haveL) "IVF" else "PQ"} " +
          "delta with no matching " + (if (haveL) "PQ" else "IVF") +
          " delta: merge the other index half before re-aligning, or delete " +
          s"$alignedDir to force a full rebuild")
      val member = spark.read.parquet(pendLists)
      val codes = spark.read.parquet(pendCodes)
      // both halves must cover the same vec_ids, or clearing pending
      // below would silently orphan the uncovered side — fail loudly
      val onlyM = member.select(col("vec_id")).distinct()
        .join(codes.select(col("vec_id")).distinct(), Seq("vec_id"), "left_anti")
        .limit(1).count()
      val onlyC = codes.select(col("vec_id")).distinct()
        .join(member.select(col("vec_id")).distinct(), Seq("vec_id"), "left_anti")
        .limit(1).count()
      require(onlyM == 0L && onlyC == 0L,
        s"re-align at $indexDir: pending IVF and PQ deltas cover different " +
          "vec_ids — merge both halves of every delta before re-aligning")
      // PER-PID segments: each pending merge/batch lands in its OWN
      // mseg=p_<pid> generation, so convergence is pid-scoped — a
      // crashed re-align's retry, or a crash-replayed stream batch
      // whose pending record reappears after an align consumed it in a
      // larger group, dynamically overwrites exactly its own leaves
      // byte-equivalently instead of minting an overlapping
      // differently-grouped segment (the one path that could have
      // double-counted ADC partial sums). No driver-side pid collect.
      codes.select(col("vec_id"), col("sub_id"), col("code"))
        .join(member.select(col("vec_id"), col("c_id"), col("pid")),
          Seq("vec_id"))
        .withColumn("mseg", concat(lit("p_"), col("pid"))).drop("pid")
        .repartition(col("c_id"))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("c_id", "mseg")
        .parquet(alignedDir)
      // record the absorbed pids in the ledger, consume the pending
      // record, then restore the serving gate (the dynamic-overwrite
      // committer does not emit a root _SUCCESS). Crash windows
      // converge: before the deletes, the retry re-runs the same
      // per-pid segments and rewrites the same ledger union; between
      // delete and touch, the no-pending branch above restores the
      // gate over the already-complete rows.
      val absorbed = (consumedPids(spark, alignedDir) ++
        (graft.util.Fs.listDirNames(spark, pendLists) ++
          graft.util.Fs.listDirNames(spark, pendCodes))
          .map(_.stripPrefix("pid="))).distinct.sorted
      graft.util.Fs.writeString(spark, s"$alignedDir/_CONSUMED",
        absorbed.mkString("\n"))
      graft.util.Fs.delete(spark, pendLists)
      graft.util.Fs.delete(spark, pendCodes)
      graft.util.Fs.touch(spark, s"$alignedDir/_SUCCESS")
    }
  }

  /** The consumed-pid ledger of an aligned artifact — pids whose rows
    * the artifact already contains (see [[alignPqToLists]]). Empty when
    * the artifact or ledger is absent.
    */
  private[graft] def consumedPids(spark: SparkSession,
      alignedDir: String): Seq[String] = {
    val f = s"$alignedDir/_CONSUMED"
    if (!graft.util.Fs.isFile(spark, f)) Seq.empty
    else graft.util.Fs.readString(spark, f).split("\n").toSeq
      .map(_.trim).filter(_.nonEmpty)
  }

  /** IVF-PQ (IVFADC) search — the two persisted index halves composed
    * into the layout a 10⁹-vector index actually serves (FAISS's
    * IVFADC): the coarse quantizer prunes to the `nprobe` nearest
    * inverted lists exactly as [[searchIvf]], but candidates are
    * scored by ASYMMETRIC PQ distance over the 4-byte code table
    * instead of full-precision cosine — list pruning bounds the I/O,
    * code scoring bounds the arithmetic and memory, and NO
    * full-precision corpus embedding is read at search time (the
    * pruned lists contribute only their vec_id membership; the list
    * read projects two columns). Requires both [[buildIvf]] and
    * [[buildPq]] artifacts under `indexDir`. When the
    * [[alignPqToLists]] maintenance artifact is present, the code
    * scan itself is pruned to the probed lists' partitions and the
    * membership join disappears from the plan; otherwise the codes
    * table joins membership by a plain keyed shuffle. Returns
    * (query_id, rank, neighbor_id, ip_x1e6) ranked by the ADC
    * inner-product surrogate (highest first, id tiebreak).
    */
  def searchIvfPq(spark: SparkSession, indexDir: String, queries: DataFrame,
      nprobe: Int, topk: Int): DataFrame =
    // snapshot-consistent FOUR-stage set: this is the reader the flip
    // journal's reader-side gap bites hardest — a concurrent retrain
    // flips centroids+lists, and a per-stage resolve could compose the
    // halves from different generations
    searchIvfPqOver(spark, indexDir,
      IndexMaintenance.snapshotStages(spark, indexDir,
        Seq("centroids", "pq_codebook", "lists", "pq_codes")),
      queries, nprobe, topk, aligned = liveAligned(spark, indexDir))

  /** The LIVE aligned code layout, when its serving gate is up — the
    * [[alignPqToLists]] artifact, exact for the current lists by the
    * invalidation discipline.
    */
  private def liveAligned(spark: SparkSession, indexDir: String): Option[String] = {
    val d = s"$indexDir/pq_codes_by_list"
    if (graft.util.Fs.isFile(spark, s"$d/_SUCCESS")) Some(d) else None
  }

  /** The RETAINED aligned code layout for the coarse generation a
    * historical read resolved — [[retainAligned]]'s artifact, keyed by
    * that generation's own quantizer. The generation number is parsed
    * from the seqlock-resolved historical lists path itself (bare path
    * = generation zero), so the aligned copy can never pair with a
    * different flip than the lists it serves next to. Absent (never
    * retained, GC'd, un-gated by a mutation, or disabled via
    * `spark.graft.index.alignedAsOf=off` — the operator escape hatch
    * to the always-correct membership join) returns None.
    */
  private def alignedAsOf(spark: SparkSession, indexDir: String,
      histListsPath: String): Option[String] = {
    if (spark.conf.get("spark.graft.index.alignedAsOf", "on").trim == "off")
      return None
    val marker = "/_gen/lists/"
    val gen =
      if (histListsPath.contains(marker))
        histListsPath.substring(
          histListsPath.lastIndexOf('/') + 1)
      else "g0"
    val d = s"$indexDir/_gen/pq_codes_by_list/$gen"
    if (graft.util.Fs.isFile(spark, s"$d/_RETAINED")) Some(d) else None
  }

  /** TIME-TRAVEL IVFADC search: [[searchIvfPq]] against the index as it
    * was `back` coarse-pair pointer flips ago — [[searchIvfAsOf]] for
    * the PRODUCTION serving path (at 10⁹ vectors the lifecycle whose
    * retrain-diff story motivates historical reads IS the IVFADC one:
    * l84/l80). Resolution is mixed-depth under one seqlock
    * ([[IndexMaintenance.snapshotStagesMixed]]): centroids+lists at
    * depth `back` (they flip in lockstep — buildIvf writes both,
    * retrain swaps both in one journaled set), the PQ halves LIVE —
    * a retrain does not touch them (the codebook is the shipped model,
    * codes are per-vector and quantizer-independent), so the live code
    * table IS the code table of the historical instant, modulo two
    * principled overrides: codes merged AFTER the flip belong to
    * vectors absent from the historical lists and never join
    * (membership scopes them out), and CURRENT tombstones still filter
    * — a takedown beats time travel on every axis.
    *
    * The ALIGNED code layout: the LIVE `pq_codes_by_list` is keyed by
    * the CURRENT quantizer's c_ids — against a historical coarse pair
    * its partitions are a different key space, so it is never consulted
    * at depth. But each pointer retrain RETAINS the gate-complete
    * aligned copy next to the pair it supersedes
    * ([[retainAligned]] — that copy is keyed by the superseded
    * quantizer, exactly this read's key space), so a historical read
    * whose depth retention kept serves the probe-pruned aligned scan
    * with no membership join at all — the live read's asymptotics on
    * the historical axis. When no copy was retained (pre-retention
    * history, a merge landed before the flip re-aligned, a compaction
    * fold dropped history, or `spark.graft.index.alignedAsOf=off`),
    * the read falls back to the membership-join plan, whose membership
    * side is the probe-pruned HISTORICAL lists (the l80 discipline).
    * Bounded loudly by what retention kept; the error names the
    * widening knob (`spark.graft.index.retainGens`).
    */
  def searchIvfPqAsOf(spark: SparkSession, indexDir: String,
      queries: DataFrame, nprobe: Int, topk: Int, back: Int): DataFrame = {
    val snap = IndexMaintenance.snapshotStagesMixed(spark, indexDir,
      Seq("centroids", "lists"), back, Seq("pq_codebook", "pq_codes"))
    searchIvfPqOver(spark, indexDir, snap, queries, nprobe, topk,
      aligned =
        if (back == 0) liveAligned(spark, indexDir)
        else alignedAsOf(spark, indexDir, snap("lists")))
  }

  /** BATCH-AXIS time travel for the STREAMED IVFADC layout
    * ([[graft.streaming.VecStream]] with `pqCodes = true`:
    * `lists/batch_id=N/c_id=M` next to `pq_codes/batch_id=N`): the ADC
    * search as the index stood once micro-batch `n` had folded —
    * [[searchIvfAsOfBatch]] completed for the code-serving path. Exact
    * by construction: quantizer AND codebook are frozen (trained
    * standalone before the fold), so "as of batch n" is the same
    * models over the `batch_id <= n` slices of both grown halves —
    * partition filters on the outer replay layer of each, zero extra
    * storage, unbounded history (compaction preserves the batch
    * partitions). The codes-side filter is pruning, not correctness
    * (membership against the sliced lists already scopes later codes
    * out) — it keeps the code scan's I/O proportional to the snapshot
    * the way the lists read is. The aligned artifact carries no
    * batch_id layer and is bypassed (the membership-join plan).
    * Current tombstones still filter. Fails loudly on a batch-less
    * layout.
    */
  def searchIvfPqAsOfBatch(spark: SparkSession, indexDir: String,
      queries: DataFrame, nprobe: Int, topk: Int, n: Long): DataFrame = {
    require(n >= 0L, s"searchIvfPqAsOfBatch($n): negative batch id")
    def sliced(what: String): DataFrame => DataFrame = df => {
      require(df.columns.contains("batch_id"),
        s"searchIvfPqAsOfBatch at $indexDir: the $what carry no " +
          "batch_id= layer — batch-axis history only exists on a " +
          "streamed (VecStream pqCodes) layout; use searchIvfPqAsOf " +
          "for generation history")
      df.where(col("batch_id") <= n)
    }
    searchIvfPqOver(spark, indexDir,
      IndexMaintenance.snapshotStages(spark, indexDir,
        Seq("centroids", "pq_codebook", "lists", "pq_codes")),
      queries, nprobe, topk, aligned = None,
      listsFilter = sliced("lists"), codesFilter = sliced("codes"))
  }

  /** The [[searchIvfPq]] serving plan over an already-resolved
    * four-stage snapshot — shared by the live, generation-asOf and
    * batch-asOf reads so the three cannot drift. `aligned` is the
    * gate-verified aligned code directory to serve, when one exists
    * for the resolved snapshot: the live artifact ([[liveAligned]]),
    * a retained historical copy ([[alignedAsOf]]), or None for the
    * membership-join plan (always the batch axis — the aligned layout
    * carries no batch_id layer); `listsFilter`/`codesFilter` scope the
    * two grown halves (the batch-axis partition filters); identity for
    * live reads.
    */
  private def searchIvfPqOver(spark: SparkSession, indexDir: String,
      snap: Map[String, String], queries: DataFrame,
      nprobe: Int, topk: Int, aligned: Option[String],
      listsFilter: DataFrame => DataFrame = identity,
      codesFilter: DataFrame => DataFrame = identity): DataFrame = {
    val cent = spark.read.parquet(snap("centroids"))
    val q = queries.select(col("query_id"), col("embedding").as("qv"),
      sqrt(dot(col("embedding"), col("embedding"))).as("qn"))
    val probes = q.join(broadcast(cent))
      .select(col("query_id"), col("c_id"),
        cosQ(col("qv"), col("qn"), col("cv"), col("cn")).as("cc"))
      .withColumn("r", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cc").desc, col("c_id").asc)))
      .where(col("r") <= nprobe)
      .select(col("query_id"), col("c_id"))
    // per-query ADC lookup table: 4x16 inner products against the
    // broadcast codebook — 64 dots per query, not |corpus| of them
    val codebook = spark.read.parquet(snap("pq_codebook"))
    val qsubs = queries
      .select(col("query_id"),
        explode(sequence(lit(0L), lit(3L))).as("sub_id"), col("embedding"))
      .select(col("query_id"), col("sub_id"),
        slice(col("embedding"), (col("sub_id") * 16 + 1).cast("int"), lit(16))
          .as("qs"))
    val adc = qsubs.join(broadcast(codebook), Seq("sub_id"))
      .select(col("query_id"), col("sub_id"), col("c_id").as("code"),
        floor(dot(col("qs"), col("cs")) * 1e6 + 0.5).cast("long").as("ip_part"))
    val perCode =
      aligned match {
        case Some(alignedDir) =>
        // the aligned layout (live or retained-at-depth): the probes
        // join keys on the partition column, so the code scan plans
        // only the probed c_id= directories and membership needs no
        // second table at all.
        // Tombstone-filtered: the aligned artifact is NOT invalidated
        // by a delete — the anti-join keeps it exact until the fold
        // (and the fold drops retained copies, [[dropAlignedAll]]).
        val codesByList = Tombstones.filter(spark, indexDir,
          spark.read.parquet(alignedDir), Seq("vec_id"))
        probes.join(codesByList, Seq("c_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            col("sub_id"), col("code"))
        case None =>
        {
        // fallback: membership from the pruned lists (two columns),
        // codes joined by a plain keyed shuffle; tombstone-filtering
        // membership covers the codes side too (deleted ids never join)
        val member = Tombstones.filter(spark, indexDir,
            listsFilter(spark.read.parquet(snap("lists"))), Seq("vec_id"))
          .select(col("c_id"), col("vec_id").as("neighbor_id"))
        val codes = codesFilter(spark.read.parquet(snap("pq_codes")))
        probes.join(member, Seq("c_id"))
          .select(col("query_id"), col("neighbor_id"))
          .join(codes, col("neighbor_id") === col("vec_id"))
          .select(col("query_id"), col("neighbor_id"), col("sub_id"), col("code"))
        }
      }
    val scored = perCode
      .join(broadcast(adc), Seq("query_id", "sub_id", "code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum("ip_part").as("ip_x1e6"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("ip_x1e6").desc, col("neighbor_id").asc)
    graft.plans.TopK.perKey(scored, Seq("query_id"),
        Seq(("ip_x1e6", false), ("neighbor_id", true)), topk)
      .withColumn("rank", row_number().over(w))
      .select("query_id", "rank", "neighbor_id", "ip_x1e6")
      .orderBy("query_id", "rank")
  }

  /** Build and persist a product-quantization index (the l26 code
    * assignment made durable): `indexDir/pq_codebook` holds the 4×16
    * per-subspace centroid table (64 rows — broadcast-sized at any
    * corpus scale), `indexDir/pq_codes` each vector's 4 code bytes as
    * (vec_id, sub_id, code) rows. The corpus footprint drops from 64
    * floats to 4 bytes per vector — the compression that lets a
    * 10⁹-vector corpus fit in cluster memory for ADC scanning.
    */
  def buildPq(embs: DataFrame, indexDir: String): Unit = {
    require(!Tombstones.any(spark(embs), indexDir),
      s"buildPq into $indexDir: the layout carries live tombstones — " +
        "fold them first (compact/retrain) or remove the directory")
    trainPqCodebook(embs, indexDir)
    val codebook = spark(embs).read
      .parquet(stg(spark(embs), indexDir, "pq_codebook"))
    codesOf(embs, codebook)
      .write.mode(SaveMode.Overwrite).parquet(stg(spark(embs), indexDir, "pq_codes"))
  }

  /** Derive and persist ONLY the 4x16 PQ codebook — for callers that
    * own the code table themselves (the streaming fold,
    * [[graft.streaming.VecStream]] with `pqCodes = true`), mirroring
    * [[trainQuantizer]] on the coarse-quantizer side. The codebook
    * derives from the FIXED id window (vec_ids 10..115 step 7 — the
    * shipped-model posture: deterministic, engine-restatable in closed
    * form); code assignment against it is [[codesOf]], shared verbatim
    * by build, merge, and stream.
    */
  def trainPqCodebook(embs: DataFrame, indexDir: String): Unit = {
    val codebook = embs
      .where(col("vec_id").between(10, 115) && (col("vec_id") - 10) % 7 === 0)
      .select(expr("(vec_id - 10) div 7").as("c_id"),
        explode(sequence(lit(0L), lit(3L))).as("sub_id"), col("embedding"))
      .select(col("c_id"), col("sub_id"),
        slice(col("embedding"), (col("sub_id") * 16 + 1).cast("int"), lit(16))
          .as("cs"))
    codebook.write.mode(SaveMode.Overwrite)
      .parquet(stg(spark(embs), indexDir, "pq_codebook"))
  }

  /** PQ code assignment of `embs` (vec_id, embedding) against a
    * codebook frame — the buildPq/mergePq/stream argmin, shared
    * verbatim: per (vector, subspace), the quantized-L2-nearest
    * codebook row with the (d2, c_id) tie-break. Returns
    * (vec_id, sub_id, code).
    */
  private[graft] def codesOf(embs: DataFrame, codebook: DataFrame): DataFrame = {
    val subs = embs
      .select(col("vec_id"),
        explode(sequence(lit(0L), lit(3L))).as("sub_id"), col("embedding"))
      .select(col("vec_id"), col("sub_id"),
        slice(col("embedding"), (col("sub_id") * 16 + 1).cast("int"), lit(16))
          .as("sv"))
    val scored = subs.join(broadcast(codebook), Seq("sub_id"))
      .select(col("vec_id"), col("sub_id"), col("c_id"),
        floor((dot(col("sv"), col("sv")) - lit(2) * dot(col("sv"), col("cs"))
          + dot(col("cs"), col("cs"))) * 1e6 + 0.5).cast("long").as("d2_x1e6"))
    val w = Window.partitionBy("vec_id", "sub_id")
      .orderBy(col("d2_x1e6").asc, col("c_id").asc)
    scored.withColumn("r", row_number().over(w)).where(col("r") === 1)
      .select(col("vec_id"), col("sub_id"), col("c_id").as("code"))
  }

  /** Incrementally MERGE a delta batch into a persisted PQ index — the
    * [[mergeIvf]] posture applied to the code table: the delta's codes
    * are assigned against the EXISTING broadcast codebook (the shipped
    * model; retraining is an offline rebuild) and appended to
    * `pq_codes`. Because [[buildPq]]'s codebook derives from a FIXED id
    * window (vec_ids 10..115 step 7), merged codes equal
    * `buildPq(union)`'s exactly whenever the codebook ids live in the
    * base corpus — VectorIndexSpec pins that equality. O(delta):
    * one broadcast join + one per-(vector, subspace) argmin.
    */
  def mergePq(spark: SparkSession, indexDir: String, delta: DataFrame,
      mergeId: Option[String] = None): Unit =
      IndexMaintenance.withLease(spark, indexDir) {
    // converge any crashed swap before appending ([[DedupIndex.merge]]'s
    // rationale: a journal replay after this append would discard it)
    IndexMaintenance.recoverStages(spark, indexDir, Seq.empty)
    val marker = mergeId.map(id => s"$indexDir/_merges/$id/pq_codes.done")
    if (marker.exists(graft.util.Fs.isFile(spark, _))) return
    val overlap = delta.select(col("vec_id"))
      .join(spark.read.parquet(stg(spark, indexDir, "pq_codes")).select(col("vec_id")),
        Seq("vec_id"), "left_semi")
      .limit(1).count()
    require(overlap == 0L,
      s"mergePq delta shares vec_ids with the indexed corpus at $indexDir")
    requireNotTombstoned(spark, indexDir, delta, "mergePq")
    val codebook = spark.read.parquet(stg(spark, indexDir, "pq_codebook"))
    // stale-alignment guard, as in mergeIvf: the delta's codes are
    // about to be missing from any aligned table — drop it first
    invalidateAligned(spark, indexDir)
    val deltaCodes = codesOf(delta, codebook)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // the mergeIvf provenance recipe on the code side: the delta's
      // codes land under a per-merge pid= partition so the re-align is
      // an O(delta) join of the two pending frames, never a corpus scan
      // fenced per append, as in [[mergeIvf]]: heartbeat or abort
      // before rows a successor's staged rewrite would silently drop
      IndexMaintenance.fence(spark, indexDir)
      deltaCodes.coalesce(1)
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$indexDir/_align_pending/codes/pid=${pendingId(mergeId)}")
      IndexMaintenance.fence(spark, indexDir)
      deltaCodes
        .write.mode(SaveMode.Append).parquet(stg(spark, indexDir, "pq_codes"))
    } finally { deltaCodes.unpersist(); () }
    marker.foreach(graft.util.Fs.touch(spark, _))
  }

  /** Asymmetric-distance (ADC) search over the persisted PQ index: each
    * query computes a 4×16 inner-product lookup table against the
    * broadcast codebook (64 dot products, NOT |corpus| of them), and
    * every corpus vector's approximate score is the sum of its 4
    * code-addressed table entries — one equi-join + one hash agg over
    * the 4-bytes-per-vector codes table; the full-precision embeddings
    * are never read at search time. Returns
    * (query_id, rank, neighbor_id, ip_x1e6).
    */
  def searchPq(spark: SparkSession, indexDir: String, queries: DataFrame,
      topk: Int): DataFrame = {
    val snap = IndexMaintenance.snapshotStages(spark, indexDir,
      Seq("pq_codebook", "pq_codes"))
    val codebook = spark.read.parquet(snap("pq_codebook"))
    val codes = Tombstones.filter(spark, indexDir,
      spark.read.parquet(snap("pq_codes")), Seq("vec_id"))
    val qsubs = queries
      .select(col("query_id"),
        explode(sequence(lit(0L), lit(3L))).as("sub_id"), col("embedding"))
      .select(col("query_id"), col("sub_id"),
        slice(col("embedding"), (col("sub_id") * 16 + 1).cast("int"), lit(16))
          .as("qs"))
    val adc = qsubs.join(broadcast(codebook), Seq("sub_id"))
      .select(col("query_id"), col("sub_id"), col("c_id").as("code"),
        floor(dot(col("qs"), col("cs")) * 1e6 + 0.5).cast("long").as("ip_part"))
    val scored = codes.join(adc, Seq("sub_id", "code"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum("ip_part").as("ip_x1e6"))
    // same bounded-heap final ranking as searchIvf
    val w2 = Window.partitionBy("query_id")
      .orderBy(col("ip_x1e6").desc, col("neighbor_id").asc)
    graft.plans.TopK.perKey(scored, Seq("query_id"),
        Seq(("ip_x1e6", false), ("neighbor_id", true)), topk)
      .withColumn("rank", row_number().over(w2))
      .select("query_id", "rank", "neighbor_id", "ip_x1e6")
      .orderBy("query_id", "rank")
  }
}
