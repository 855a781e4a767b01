package graft.llm

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

import graft.util.Fs

/** The shared COMPACTION / STAGE-SWAP engine behind
  * [[DedupIndex.compact]], [[VectorIndex.compactIvf]]/
  * [[VectorIndex.compactPq]], and [[VectorIndex.retrainIvf]] — one
  * maintenance discipline for every persisted-index lifecycle in the
  * library. See [[DedupIndex.compact]] for the full posture rationale
  * (staged-then-swap, content-preserving crash safety, marker
  * clearing); this object holds only the mechanics so the text and
  * vector indexes cannot drift apart.
  *
  * Store requirements. The swap is three `FileSystem.rename` calls per
  * stage, and its crash-safety argument is exactly "each rename is an
  * atomic metadata move". That is TRUE on HDFS-semantics stores (hdfs,
  * local, viewfs, abfs) and FALSE on S3-class object stores, where
  * rename is a non-atomic copy+delete and a mid-rename crash leaves
  * partially-populated directories. Every entry point therefore gates
  * on [[graft.util.Fs.atomicRename]] and REFUSES object-store index
  * paths instead of claiming them — run maintenance against an
  * HDFS-semantics staging location (or a future pointer-manifest swap,
  * whose one-file current-pointer write IS atomic on object stores).
  * On gated stores, recovery additionally tolerates a partial rename
  * planted by an ungated writer: a swap-intent marker brackets each
  * swap, and while it is up the `_SUCCESS`-gated staged rewrite — not
  * bare existence of the live path — is what recovery trusts.
  */
private[graft] object IndexMaintenance {

  /** Directory-partition columns an index layout may carry, in their
    * nesting order: the streamed folds put `batch_id=` outermost
    * (DocStream: `bands/batch_id=N/bp=X`; VecStream:
    * `lists/batch_id=N/c_id=M`; MediaStream: `bands/batch_id=N/bv=X`),
    * batch layouts use `bp=` (dedup bands) or `c_id=` (IVF lists)
    * alone. The inner columns never co-occur, so one ordered list
    * covers every layout.
    */
  private val PartitionCols = Seq("batch_id", "bp", "bv", "c_id")

  private[graft] def refuseNonAtomic(spark: SparkSession, indexDir: String): Unit =
    require(Fs.atomicRename(spark, indexDir),
      s"index maintenance at $indexDir: the staged-swap protocol requires an " +
        "atomic-rename store (HDFS, local, abfs); this store implements " +
        "rename as a non-atomic copy+delete, under which a crash mid-swap " +
        "can leave a partially-populated live stage. Run maintenance " +
        "against an HDFS-semantics location and copy the result, or keep " +
        "the index on such a store outright.")

  /** Rewrite each stage directory DISTINCT into O(targetFiles) files
    * (one file per partition directory when the stage is
    * directory-partitioned), staging everything under
    * `_compact/<stage>` before any swap, then swapping one stage at a
    * time and clearing `_merges/`.
    *
    * Crash safety. The rewrite is content-preserving, so correctness
    * needs only that a READABLE copy of each stage exists at every
    * instant. The swap therefore never deletes the live stage before
    * its replacement is in place ([[swapStages]]), and [[recoverStages]]
    * (run on entry before anything is read) finishes an interrupted
    * swap from the `_SUCCESS`-gated staged copy — so "a re-run simply
    * finishes the job" holds at every kill point, including mid-swap.
    */
  def compactStages(spark: SparkSession, indexDir: String,
      stages: Seq[String], targetFiles: Int): Unit = {
    refuseNonAtomic(spark, indexDir)
    recoverStages(spark, indexDir, stages)
    stages.foreach { stage =>
      val df = spark.read.parquet(s"$indexDir/$stage")
      val parts = PartitionCols.filter(df.columns.contains)
      val deduped = df.distinct()
      val refiled =
        if (parts.nonEmpty)
          // Hash-cluster on the partition keys: each output directory
          // is then written by exactly one task → one file per dir.
          deduped.repartition(parts.map(col): _*)
            .write.mode(SaveMode.Overwrite).partitionBy(parts: _*)
        else
          deduped.repartition(targetFiles)
            .write.mode(SaveMode.Overwrite)
      refiled.parquet(s"$indexDir/_compact/$stage")
    }
    swapStages(spark, indexDir, stages)
    Fs.delete(spark, s"$indexDir/_compact")
    Fs.delete(spark, s"$indexDir/_merges")
  }

  /** Swap each staged rewrite (`_compact/<stage>`, `_SUCCESS`-complete)
    * into place: live renamed ASIDE (`_compact/_old_<stage>`), staged
    * renamed in, aside dropped — three metadata moves, atomic on the
    * stores [[compactStages]]/[[VectorIndex.retrainIvf]] admit. Each
    * stage's swap is bracketed by an INTENT marker
    * (`_compact/_swapping_<stage>`): while it is up, [[recoverStages]]
    * treats the live path as suspect and restores from the staged copy
    * rather than trusting bare existence — which both closes the
    * partial-rename hole (an ungated object-store writer, or a test
    * simulating one) and lets a multi-stage replacement (retrain's
    * centroids + lists) converge to the staged generation at every
    * kill point instead of serving a mixed index.
    *
    * Callers whose staged content is NOT equal to the live content
    * (retrain) inherit the corresponding contract: after a mid-swap
    * crash the index must not be SERVED until a recovery pass
    * (any maintenance entry) has run — single-writer maintenance
    * windows, the assumption every marker file here already makes.
    */
  def swapStages(spark: SparkSession, indexDir: String,
      stages: Seq[String]): Unit = {
    refuseNonAtomic(spark, indexDir)
    stages.foreach { stage =>
      val live = s"$indexDir/$stage"
      val staged = s"$indexDir/_compact/$stage"
      val aside = s"$indexDir/_compact/_old_$stage"
      val intent = s"$indexDir/_compact/_swapping_$stage"
      require(Fs.isFile(spark, s"$staged/_SUCCESS"),
        s"stage swap for $stage: staged rewrite at $staged is not " +
          "_SUCCESS-complete")
      Fs.touch(spark, intent)
      Fs.delete(spark, aside) // a stale aside from a recovered crash
      require(Fs.rename(spark, live, aside),
        s"compact swap failed renaming $stage aside")
      require(Fs.rename(spark, staged, live),
        s"compact swap failed for $stage")
      Fs.delete(spark, aside)
      Fs.delete(spark, intent)
    }
  }

  /** Restore a consistent live stage after a mid-swap kill, for each
    * stage in order. Two triggers:
    *
    *  - the stage's swap-intent marker is UP: the crash happened inside
    *    [[swapStages]]'s bracket, so bare existence of the live path
    *    proves nothing (it may be the pre-swap original, the completed
    *    swap, or — on a store that faked a rename — a partial copy).
    *    If the `_SUCCESS`-gated staged rewrite is still in `_compact/`,
    *    it is authoritative: whatever sits at the live path is dropped
    *    and staged renamed in. If staged is consumed and live exists,
    *    the staged→live move completed (renames here are atomic by the
    *    entry gate) and live IS the finished swap. If both are gone,
    *    the aside copy restores the pre-swap original. The marker and
    *    aside are then cleared.
    *  - no marker but the live path is MISSING (a crash between the two
    *    renames under the pre-marker protocol, or external damage):
    *    restore from the `_SUCCESS`-gated staged copy, else the aside.
    *
    * A live directory that exists with no marker is left untouched — a
    * half-written `_compact/<stage>` (no `_SUCCESS`) is simply
    * overwritten by the next rewrite.
    */
  def recoverStages(spark: SparkSession, indexDir: String,
      stages: Seq[String]): Unit = stages.foreach { stage =>
    val live = s"$indexDir/$stage"
    val staged = s"$indexDir/_compact/$stage"
    val aside = s"$indexDir/_compact/_old_$stage"
    val intent = s"$indexDir/_compact/_swapping_$stage"
    if (Fs.isFile(spark, intent)) {
      if (Fs.isFile(spark, s"$staged/_SUCCESS")) {
        Fs.delete(spark, live)
        require(Fs.rename(spark, staged, live),
          s"swap recovery failed renaming staged $stage into place")
      } else if (!Fs.exists(spark, live)) {
        require(Fs.exists(spark, aside),
          s"swap recovery for $stage: no staged, live, or aside copy — " +
            "the stage is unrecoverable from this layout")
        require(Fs.rename(spark, aside, live),
          s"swap recovery failed restoring $stage from its aside copy")
      }
      // else: staged consumed and live present — the swap completed
      Fs.delete(spark, aside)
      Fs.delete(spark, intent)
    } else if (!Fs.exists(spark, live)) {
      if (Fs.isFile(spark, s"$staged/_SUCCESS"))
        require(Fs.rename(spark, staged, live),
          s"compact recovery failed renaming staged $stage into place")
      else if (Fs.exists(spark, aside))
        require(Fs.rename(spark, aside, live),
          s"compact recovery failed restoring $stage from its aside copy")
      // else: the stage never existed — let the read fail loudly below
    }
  }
}
