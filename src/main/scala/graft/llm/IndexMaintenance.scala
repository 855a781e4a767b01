package graft.llm

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

import graft.util.Fs

/** The shared COMPACTION engine behind [[DedupIndex.compact]] and
  * [[VectorIndex.compactIvf]]/[[VectorIndex.compactPq]] — one
  * maintenance discipline for every persisted-index lifecycle in the
  * library. See [[DedupIndex.compact]] for the full posture rationale
  * (staged-then-swap, content-preserving crash safety, marker
  * clearing); this object holds only the mechanics so the text and
  * vector indexes cannot drift apart.
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

  /** Rewrite each stage directory DISTINCT into O(targetFiles) files
    * (one file per partition directory when the stage is
    * directory-partitioned), staging everything under
    * `_compact/<stage>` before any swap, then swapping one stage at a
    * time and clearing `_merges/`.
    *
    * Crash safety. The rewrite is content-preserving, so correctness
    * needs only that a READABLE copy of each stage exists at every
    * instant. The swap therefore never deletes the live stage before
    * its replacement is in place: the live directory is renamed ASIDE
    * (`_compact/_old_<stage>`), the staged rewrite renamed in, and only
    * then the aside copy dropped — three metadata moves, each atomic on
    * its store. A crash between the two renames leaves the live path
    * missing but BOTH copies on disk, and [[recoverSwap]] (run on entry
    * before anything is read) finishes the swap from the staged copy —
    * so "a re-run simply finishes the job" holds at every kill point,
    * including mid-swap.
    */
  def compactStages(spark: SparkSession, indexDir: String,
      stages: Seq[String], targetFiles: Int): Unit = {
    stages.foreach(recoverSwap(spark, indexDir, _))
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
    stages.foreach { stage =>
      val live = s"$indexDir/$stage"
      val staged = s"$indexDir/_compact/$stage"
      val aside = s"$indexDir/_compact/_old_$stage"
      Fs.delete(spark, aside) // a stale aside from a recovered crash
      require(Fs.rename(spark, live, aside),
        s"compact swap failed renaming $stage aside")
      require(Fs.rename(spark, staged, live),
        s"compact swap failed for $stage")
      Fs.delete(spark, aside)
    }
    Fs.delete(spark, s"$indexDir/_compact")
    Fs.delete(spark, s"$indexDir/_merges")
  }

  /** Restore a readable live stage after a mid-swap kill: if the live
    * directory is missing, rename in the COMPLETE staged rewrite
    * (`_SUCCESS`-marked — identical logical content) or, failing that,
    * the aside copy. The subsequent compact pass then re-runs normally
    * over the restored stage. A live directory that exists is left
    * untouched — a half-written `_compact/<stage>` (no `_SUCCESS`) is
    * simply overwritten by the new rewrite.
    */
  private def recoverSwap(spark: SparkSession, indexDir: String,
      stage: String): Unit = {
    val live = s"$indexDir/$stage"
    if (!Fs.exists(spark, live)) {
      val staged = s"$indexDir/_compact/$stage"
      val aside = s"$indexDir/_compact/_old_$stage"
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
