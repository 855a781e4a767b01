package graft.llm

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

import graft.util.Fs

/** TOMBSTONE-based deletion for persisted indexes — the missing
  * lifecycle verb (build / merge / compact / retrain / reband / ...
  * DELETE), shared by [[DedupIndex.delete]], [[VectorIndex.deleteIvf]],
  * [[graft.streaming.MediaStream.deleteFromIndex]] and
  * [[graft.streaming.DocStream.deleteDocs]] so the three index families
  * cannot drift apart.
  *
  * Why tombstones and not an eager rewrite: a takedown (GDPR erasure, a
  * DMCA notice, a licensing retraction) must take effect promptly, but
  * the ids it names touch EVERY id-bearing artifact of an index — at the
  * 100 TB posture an eager rewrite of the signatures + bands + pairs +
  * shingle tables (or every `c_id=` inverted list) per request is a
  * corpus-scale job per takedown. The deletion-vector discipline
  * (Lucene's deleted-docs bitmap, Delta/Iceberg deletion vectors) splits
  * the cost three ways instead:
  *
  *   - DELETE is O(|ids|): the id set lands as one appended parquet
  *     generation under `indexDir/_tombstones` (job-atomic — the
  *     committer publishes the files only at job commit).
  *   - READ pays one anti-join per consumed artifact: every reader
  *     resolves through [[filter]], which no-ops (zero plan change) when
  *     no tombstone set exists and otherwise LEFT ANTI-joins the
  *     artifact's id column(s) against the distinct tombstoned ids.
  *     The tombstone side is maintenance-cadence-bounded (it is cleared
  *     at every fold), so Catalyst's size stats broadcast it and the
  *     anti-join never shuffles the corpus side.
  *   - The FOLD rides the compaction the index already runs:
  *     [[IndexMaintenance.compactStages]] applies the same filter to
  *     each staged rewrite, and the caller clears the tombstone set
  *     AFTER the swap commits. Because the clear is last, every reader
  *     sees the filtered view at every instant of the fold — a crash
  *     between the swap and the clear leaves tombstones that now filter
  *     nothing (inert), and the next fold clears them.
  *
  * At-least-once posture: [[add]] appends; a replayed delete re-appends
  * the same ids, which is inert under anti-join semantics and swept by
  * the next fold. Deleting an id the index never held is a no-op by the
  * same argument (takedown lists routinely name content never crawled).
  *
  * What tombstones deliberately do NOT do: un-derive. Aggregate
  * artifacts already derived FROM a deleted document (corpus-level
  * statistics, trained centroids, a BPE vocabulary) are models, not
  * copies of the document, and removing their influence is a retrain —
  * the maintenance loop's job ([[VectorIndex.retrainIvf]] folds
  * tombstones out of the training corpus for exactly this reason).
  */
private[graft] object Tombstones {

  private def dir(indexDir: String) = s"$indexDir/_tombstones"

  /** Record `ids` (one column, named `idCol`) as deleted — O(|ids|):
    * one distinct + one appended parquet generation. The write is
    * job-atomic; a crashed call leaves no committed rows and the caller
    * simply retries.
    */
  def add(spark: SparkSession, indexDir: String, ids: DataFrame,
      idCol: String): Unit =
    ids.select(col(idCol).as("id")).distinct()
      .write.mode(SaveMode.Append).parquet(dir(indexDir))

  /** Does a committed tombstone set exist? Gated on `_SUCCESS` so a
    * crashed first [[add]] (which leaves no committed files) reads as
    * "no tombstones" — the same state the caller's retry starts from.
    */
  def any(spark: SparkSession, indexDir: String): Boolean =
    Fs.isFile(spark, s"${dir(indexDir)}/_SUCCESS")

  /** The distinct tombstoned ids (one column `id`). Callers must have
    * checked [[any]] first.
    */
  def ids(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(dir(indexDir)).select(col("id")).distinct()

  /** Drop every row of `df` whose value in ANY of `keyCols` is
    * tombstoned — the read-side deletion vector. Identity (no plan
    * change at all) when no tombstone set exists; otherwise one LEFT
    * ANTI join per key column against the broadcastable distinct id
    * set. Multi-column keys (a pairs artifact's two endpoints) are
    * anti-joined independently: a pair dies when EITHER endpoint is
    * deleted.
    */
  def filter(spark: SparkSession, indexDir: String, df: DataFrame,
      keyCols: Seq[String]): DataFrame =
    if (!any(spark, indexDir)) df
    else {
      val ts = ids(spark, indexDir)
      keyCols.foldLeft(df) { (acc, k) =>
        acc.join(ts.withColumnRenamed("id", k), Seq(k), "left_anti")
      }
        // a USING join moves its key to the front — restore the input's
        // column order so positional consumers (Encoders, writers whose
        // schema the artifact pins) see the artifact unchanged
        .select(df.columns.map(col).toIndexedSeq: _*)
    }

  /** Clear the tombstone set — called by the index's fold AFTER the
    * rewritten (tombstone-filtered) stages have swapped in. Crash
    * before this call: the tombstones remain and now filter nothing;
    * the next fold re-applies (a no-op) and clears.
    */
  def clear(spark: SparkSession, indexDir: String): Unit =
    Fs.delete(spark, dir(indexDir))
}
