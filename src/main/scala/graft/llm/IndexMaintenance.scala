package graft.llm

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

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
    * time and clearing `_merges/`. The rewrite is content-preserving,
    * so a crash at any point leaves a correct index and a re-run
    * finishes the job.
    */
  def compactStages(spark: SparkSession, indexDir: String,
      stages: Seq[String], targetFiles: Int): Unit = {
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
      f.delete(): Unit
    }
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
      val live = new java.io.File(s"$indexDir/$stage")
      val staged = new java.io.File(s"$indexDir/_compact/$stage")
      rmrf(live)
      require(staged.renameTo(live), s"compact swap failed for $stage")
    }
    rmrf(new java.io.File(s"$indexDir/_compact"))
    rmrf(new java.io.File(s"$indexDir/_merges"))
  }
}
