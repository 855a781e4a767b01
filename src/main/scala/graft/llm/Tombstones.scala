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
  *     The tombstone side is maintenance-cadence-bounded (each fold
  *     retires what it observed; the next entry GCs it), so Catalyst's
  *     size stats broadcast it and the anti-join never shuffles the
  *     corpus side.
  *   - The FOLD rides the compaction the index already runs:
  *     [[IndexMaintenance.compactStages]] applies the same filter to
  *     each staged rewrite. Folded tombstones are then RETIRED, not
  *     deleted: the fold records the files it observed in an
  *     age-stamped retirement cohort (`_FOLDED_<n>`, [[endFold]]) and a
  *     later maintenance entry's [[beginFold]] is the garbage
  *     collector, after the cohort has aged through the SAME retention
  *     window superseded generations get ([[IndexMaintenance]]
  *     `retainGens`, re-read LIVE at each GC decision so a conf change
  *     widens both windows in lockstep),
  *     and for the same reader: a query still scanning a RETAINED pre-fold
  *     generation needs the tombstones its snapshot was filtered by,
  *     and an eager delete would either crash it (vanished files) or
  *     silently serve it deleted rows. Post-fold, the anti-join over
  *     already-folded ids is a no-op on the live generation and exactly
  *     right on a retained one.
  *
  * At-least-once posture: [[add]] appends; a replayed delete re-appends
  * the same ids, which is inert under anti-join semantics and swept by
  * the next fold. Deleting an id the index never held is a no-op by the
  * same argument (takedown lists routinely name content never crawled).
  * A delete landing WHILE a fold runs is never lost: the fold retires
  * only the files it observed at entry ([[beginFold]]), so later
  * appends survive the marker and the next fold takes them. (A delete
  * racing the fold's stage rewrites may be folded into some stages and
  * not others — harmless, since its tombstones stay live and every
  * reader keeps filtering until a fold that observed them completes.)
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

  /** The committed tombstone DATA files currently on disk (markers and
    * committer metadata excluded). Hidden-ness is judged on every path
    * SEGMENT below the tombstone directory, not just the basename — an
    * in-flight (or crashed) Append's `_temporary/**/part-*` task files
    * carry plain basenames but are invisible to parquet reads (Spark's
    * file index skips `_`/`.`-prefixed directories), and counting them
    * here would let [[beginFold]] "observe" files no reader ever saw:
    * [[endFold]] would retire them and the empty-set teardown would be
    * deferred behind a cohort of never-visible files.
    */
  private[graft] def dataFiles(spark: SparkSession, indexDir: String): Seq[String] =
    Fs.listFiles(spark, dir(indexDir))
      .filterNot { p =>
        // segments below the listing root only (anchored on the
        // `_tombstones` component, so the store's scheme prefix and the
        // index path's own segments never trip the filter)
        val i = p.lastIndexOf("/_tombstones/")
        val rel = if (i >= 0) p.substring(i + "/_tombstones/".length)
          else p.split('/').last
        rel.split('/')
          .exists(seg => seg.startsWith("_") || seg.startsWith("."))
      }

  /** The cohort LIFETIME in maintenance entries — THE resolver, shared
    * by the GC decision ([[beginFold]]) and the operability report
    * ([[IndexStatus]]) so the two cannot drift. A pointer-governed
    * layout retains superseded generations for retainGens + 1 further
    * entries and a reader on one needs the tombstones that were
    * filtering it; a rename-protocol layout retains nothing (readers
    * cannot span a swap), so one entry suffices.
    */
  private[graft] def cohortLifetime(spark: SparkSession,
      indexDir: String): Int =
    if (Fs.exists(spark, s"$indexDir/_ptr"))
      IndexMaintenance.retainGens(spark, indexDir) + 1
    else 1

  /** Parse one cohort marker's content into (age, retired file names) —
    * THE parser, shared by the GC decision ([[beginFold]]) and the
    * operability report ([[IndexStatus]]) so the two cannot drift.
    * `age` counts maintenance entries since the fold; a legacy `ttl=k`
    * marker (frozen at fold time by earlier versions) converts to the
    * age its countdown implies under the CURRENT lifetime, so the
    * re-derivation discipline covers it too. An UNPARSEABLE age line
    * (torn write, external edit) reads as age 0 — the cohort's clock
    * restarts, which is the conservative direction: its files keep
    * filtering (a no-op on the folded live generation, exactly right
    * for a retained pre-fold reader) instead of being GC'd on a guess,
    * and the next entry's rewrite repairs the line. No line at all
    * reads as expired (the marker predates the age discipline
    * entirely).
    */
  private[graft] def parseCohort(content: String,
      lifetime: Int): (Int, Seq[String]) = {
    val lines = content.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
    val named = lines.filterNot(l =>
      l.startsWith("age=") || l.startsWith("ttl="))
    val age = lines.collectFirst {
      case l if l.startsWith("age=") =>
        l.drop(4).toIntOption.getOrElse(0)
      case l if l.startsWith("ttl=") =>
        l.drop(4).toIntOption.map(t => (lifetime - t).max(0)).getOrElse(0)
    }.getOrElse(lifetime)
    (age, named)
  }

  /** The retirement-cohort marker files (`_FOLDED_<n>`) currently on
    * disk — each fold's retirement ages and GCs independently, so a
    * later fold cannot reset an earlier cohort's clock.
    */
  private[graft] def markerFiles(spark: SparkSession, indexDir: String): Seq[String] =
    Fs.listFiles(spark, dir(indexDir))
      .filter(_.split('/').last.startsWith("_FOLDED"))

  /** Enter a fold: age every retirement COHORT a previous fold recorded
    * (each `_FOLDED_<n>` marker names one fold's observed files and
    * carries a TTL in maintenance entries — see [[endFold]] for why the
    * TTL mirrors the generation-retention window), GC a cohort's files
    * when its TTL reaches zero, then return the UNRETIRED files THIS
    * fold observes (files an older cohort holds are excluded — renaming
    * them into a fresh cohort would reset their retention clock). Call
    * before the stage rewrites; pass the result to [[endFold]] after
    * the swap. Idempotent at every crash point: deleting a named file
    * twice is a no-op; a marker outliving a crashed GC is re-processed;
    * and the final teardown disarms the `_SUCCESS` gate BEFORE dropping
    * the directory, so no kill point can leave a gate-armed directory
    * with zero data files (which every reader would crash on).
    */
  def beginFold(spark: SparkSession, indexDir: String): Seq[String] = {
    // The cohort lifetime is RE-DERIVED from the live conf at every GC
    // decision, not frozen at fold time: generation hygiene
    // ([[IndexMaintenance]]) reads the live `retainGens` too, so an
    // operator who raises it mid-lifecycle widens BOTH windows in
    // lockstep — a retained pre-fold generation can never outlive the
    // tombstones that were filtering it (the skew a fold-time TTL
    // snapshot allowed). A pointer-governed layout retains superseded
    // generations for retainGens + 1 further entries; a rename-protocol
    // layout retains nothing (readers cannot span a swap), so one entry
    // suffices.
    val lifetime = cohortLifetime(spark, indexDir)
    markerFiles(spark, indexDir).foreach { marker =>
      val (age, named) =
        parseCohort(Fs.readString(spark, marker), lifetime)
      if (age + 1 < lifetime)
        // not yet out of the retention window — age this cohort one entry
        Fs.writeString(spark, marker,
          (s"age=${age + 1}" +: named).mkString("\n"))
      else {
        named.foreach(f => Fs.delete(spark, f))
        Fs.delete(spark, marker)
      }
    }
    if (markerFiles(spark, indexDir).isEmpty &&
        dataFiles(spark, indexDir).isEmpty &&
        Fs.exists(spark, dir(indexDir))) {
      // nothing left to filter and no cohort pending: disarm the gate
      // FIRST (readers then see "no tombstones" — correct, all files
      // are gone), then drop the set whole; a crash between the two
      // converges here on the next entry
      Fs.delete(spark, s"${dir(indexDir)}/_SUCCESS")
      Fs.delete(spark, dir(indexDir))
    }
    // this fold observes only the UNRETIRED files: re-naming a file an
    // earlier cohort already holds would reset its retention clock
    val retired = markerFiles(spark, indexDir).flatMap { m =>
      parseCohort(Fs.readString(spark, m), lifetime)._2
    }.toSet
    dataFiles(spark, indexDir).filterNot(retired)
  }

  /** Complete a fold that rewrote EVERY id-bearing stage: retire the
    * observed tombstone files by naming them in the `_FOLDED` marker.
    * They stay on disk — still filtering, which is a no-op on the
    * folded live generation and exactly right for a reader on a
    * retained pre-fold generation — until [[beginFold]] GCs them after
    * the cohort has aged through the generation-retention window. The
    * marker records only the cohort's AGE (entries since the fold,
    * starting at 0); the lifetime itself is re-derived from the LIVE
    * `retainGens` at each GC decision ([[beginFold]]) so it mirrors
    * the GENERATION retention window even when the conf changes
    * mid-lifecycle: on a pointer-governed index a generation
    * superseded at entry N stays readable until entry
    * N + retainGens + 1's hygiene pass, and a reader on it needs the
    * tombstones that were filtering it — so the tombstones outlive
    * their fold by the same retainGens + 1 entries, whatever
    * retainGens says when the question is asked. On a rename-protocol
    * index nothing superseded is retained (readers cannot span a swap
    * at all), so one entry suffices. Folds that covered only SOME
    * id-bearing stages must not call this (the tombstones are still
    * load-bearing on the unfolded stages).
    */
  def endFold(spark: SparkSession, indexDir: String,
      observed: Seq[String]): Unit =
    if (observed.nonEmpty) {
      val next = markerFiles(spark, indexDir)
        .map(_.split('/').last.stripPrefix("_FOLDED_"))
        .flatMap(_.toLongOption).maxOption.getOrElse(0L) + 1L
      Fs.writeString(spark, s"${dir(indexDir)}/_FOLDED_$next",
        ("age=0" +: observed).mkString("\n"))
    }
}
