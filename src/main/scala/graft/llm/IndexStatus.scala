package graft.llm

import org.apache.spark.sql.SparkSession

import graft.util.Fs

/** One generation of one stage: `gen = 0` is the bare pre-pointer
  * directory, `gen >= 1` a published `_gen/<stage>/gN`. `modifiedAt`
  * is the store's mtime (epoch millis) — an operational age signal,
  * never a correctness input (store clocks skew).
  */
case class GenerationStatus(gen: Long, path: String, live: Boolean,
    modifiedAt: Long)

/** One index stage with every on-disk generation. `batchFrontier` is
  * the highest `batch_id=` replay partition of the LIVE generation
  * when the stage is stream-grown ([[graft.streaming.VecStream]] /
  * [[graft.streaming.DocStream]] layouts), `None` otherwise.
  */
case class StageStatus(stage: String, liveGen: Long,
    generations: Seq[GenerationStatus], batchFrontier: Option[Long])

/** One tombstone retirement cohort (`_FOLDED_<n>`): its clock
  * (`age` maintenance entries since the fold, GC'd when
  * `age + 1 >= lifetime`, lifetime re-derived from the LIVE retention
  * window at every decision — [[Tombstones.beginFold]]) and the
  * number of retired files it still holds.
  */
case class CohortStatus(marker: String, age: Int, lifetime: Int,
    retiredFiles: Int)

/** The deletion state: whether the tombstone read gate is armed,
  * how many tombstone data files are still filtering, and the
  * retirement cohorts with their clocks.
  */
case class TombstoneStatus(gateUp: Boolean, dataFiles: Int,
    cohorts: Seq[CohortStatus])

/** The maintenance lease as currently written — `expired` judged
  * against this machine's wall clock (the same clock the takeover
  * logic uses).
  */
case class LeaseStatus(owner: String, expiresAt: Long, expired: Boolean)

/** The aligned-PQ serving artifacts: whether the LIVE
  * `pq_codes_by_list` gate is up ([[VectorIndex.alignPqToLists]]) and
  * which RETAINED historical copies exist (`_RETAINED`-gated,
  * serving [[VectorIndex.searchIvfPqAsOf]] at depth).
  */
case class AlignedStatus(liveGateUp: Boolean, retainedGens: Seq[Long])

/** READ-ONLY operability report over a persisted index directory —
  * every lifecycle artifact the maintenance protocols write, in one
  * place, so an operator can answer "what history does this index
  * hold, what is pending, who is writing" without reconstructing any
  * writer's session conf. Composes the exact readers the protocols
  * themselves use (pointer resolution, cohort markers, the lease
  * file, the recorded retention) — the report cannot drift from the
  * mechanics. Zero writes, zero Spark jobs: a handful of driver-side
  * metadata probes, safe to call while maintenance or serving runs
  * (a concurrent flip may tear ACROSS fields — each field is
  * individually consistent; use [[IndexMaintenance.snapshotStages]]
  * for read-path consistency).
  */
case class IndexStatus(
    indexDir: String,
    protocol: String,
    retainGens: Int,
    retentionRecorded: Boolean,
    stages: Seq[StageStatus],
    aligned: Option[AlignedStatus],
    tombstones: Option[TombstoneStatus],
    lease: Option[LeaseStatus],
    /* audit families with a RECORDED verdict row under `_maintenance/`
     * (e.g. `balance`, `banding`). Audits record a row on every run,
     * healthy or not — presence means "an audit has spoken", not "a
     * maintenance action is due": reading a verdict's own due flag
     * costs a Spark job, and this report runs none (maintainIfDue is
     * the consumer that reads and acts). */
    recordedVerdicts: Seq[String],
    pendingMerges: Seq[String],
    journalPending: Boolean) {

  /** Human-readable rendering (operator console). */
  def describe: String = {
    val sb = new StringBuilder
    sb ++= s"index $indexDir  protocol=$protocol  retainGens=$retainGens"
    sb ++= (if (retentionRecorded) " (layout-recorded)\n" else " (session conf)\n")
    stages.foreach { st =>
      sb ++= s"  stage ${st.stage}: live g${st.liveGen}"
      st.batchFrontier.foreach(b => sb ++= s", batch frontier $b")
      sb ++= "\n"
      st.generations.foreach { g =>
        sb ++= s"    g${g.gen}${if (g.live) " (live)" else ""} ${g.path}" +
          s" mtime=${g.modifiedAt}\n"
      }
    }
    aligned.foreach { a =>
      sb ++= s"  aligned codes: live gate ${if (a.liveGateUp) "UP" else "down"}"
      if (a.retainedGens.nonEmpty)
        sb ++= a.retainedGens.sorted.mkString(", retained at depth: g", " g", "")
      sb ++= "\n"
    }
    tombstones.foreach { t =>
      sb ++= s"  tombstones: gate ${if (t.gateUp) "UP" else "down"}, " +
        s"${t.dataFiles} data file(s)\n"
      t.cohorts.foreach(c => sb ++= s"    cohort ${c.marker}: age ${c.age}/" +
        s"${c.lifetime}, ${c.retiredFiles} retired file(s)\n")
    }
    lease.foreach(l => sb ++= s"  lease: ${l.owner} until ${l.expiresAt}" +
      s"${if (l.expired) " (EXPIRED)" else ""}\n")
    if (recordedVerdicts.nonEmpty)
      sb ++= recordedVerdicts.mkString("  recorded audit verdicts: ", ", ", "\n")
    if (pendingMerges.nonEmpty)
      sb ++= pendingMerges.mkString("  merge markers: ", ", ", "\n")
    if (journalPending)
      sb ++= "  WARNING: unreplayed swap journal (crashed mid-swap; the " +
        "next maintenance entry converges it)\n"
    sb.result()
  }
}

object IndexStatus {

  /** Gather the report. See [[IndexStatus]] for the contract. */
  def of(spark: SparkSession, indexDir: String): IndexStatus = {
    val alignedStage = "pq_codes_by_list"
    // stage discovery: bare non-underscore directories, plus anything
    // the pointer or generation layouts know about (a stage whose bare
    // directory was GC'd past the retention budget still exists)
    val bare = Fs.listDirNames(spark, indexDir)
      .filterNot(n => n.startsWith("_") || n == alignedStage)
    // stage POINTERS are files (not directories), minus the swap
    // journal — a stage reachable only through its pointer (bare dir
    // GC'd past the budget) must still be discovered
    val pointed = Fs.listFileNames(spark, s"$indexDir/_ptr")
      .filterNot(_ == "_intent")
    val genned = Fs.listDirNames(spark, s"$indexDir/_gen")
      .filterNot(_ == alignedStage)
    val stageNames = (bare ++ pointed ++ genned).distinct.sorted
    val stages = stageNames.map { stage =>
      val liveGen = IndexMaintenance.liveGenNumber(spark, indexDir, stage)
      val bareGen =
        if (Fs.exists(spark, s"$indexDir/$stage"))
          Seq(0L -> s"$indexDir/$stage")
        else Seq.empty
      val pubGens = Fs.listDirNames(spark, s"$indexDir/_gen/$stage")
        .flatMap(g => g.drop(1).toLongOption.map(_ -> s"$indexDir/_gen/$stage/$g"))
      val gens = (bareGen ++ pubGens).sortBy(_._1).map { case (n, p) =>
        GenerationStatus(n, p, live = n == liveGen,
          Fs.modifiedAt(spark, p).getOrElse(0L))
      }
      val livePath = Fs.stagePath(spark, indexDir, stage)
      val frontier = Fs.listDirNames(spark, livePath)
        .filter(_.startsWith("batch_id="))
        .flatMap(_.stripPrefix("batch_id=").toLongOption)
        .maxOption
      StageStatus(stage, liveGen, gens, frontier)
    }
    val aligned =
      if (Fs.exists(spark, s"$indexDir/$alignedStage") ||
          Fs.exists(spark, s"$indexDir/_gen/$alignedStage"))
        Some(AlignedStatus(
          Fs.isFile(spark, s"$indexDir/$alignedStage/_SUCCESS"),
          Fs.listDirNames(spark, s"$indexDir/_gen/$alignedStage")
            .filter(g => Fs.isFile(spark,
              s"$indexDir/_gen/$alignedStage/$g/_RETAINED"))
            .flatMap(_.drop(1).toLongOption).sorted))
      else None
    val retain = IndexMaintenance.retainGens(spark, indexDir)
    val tombstones =
      if (Fs.exists(spark, s"$indexDir/_tombstones")) {
        val lifetime = Tombstones.cohortLifetime(spark, indexDir)
        // the SHARED cohort parser (Tombstones.parseCohort — the GC
        // decision's own), hardened per-marker: a concurrent fold may
        // GC a marker between the listing and the read, and the report
        // promises to be safe to call while maintenance runs
        val cohorts = Tombstones.markerFiles(spark, indexDir).flatMap { m =>
          try {
            val (age, named) =
              Tombstones.parseCohort(Fs.readString(spark, m), lifetime)
            Some(CohortStatus(m.split('/').last, age, lifetime, named.size))
          } catch { case _: java.io.IOException => None }
        }
        Some(TombstoneStatus(
          Fs.isFile(spark, s"$indexDir/_tombstones/_SUCCESS"),
          Tombstones.dataFiles(spark, indexDir).size, cohorts))
      } else None
    val lease = IndexMaintenance
      .readLease(spark, IndexMaintenance.leasePath(indexDir))
      .map { case (owner, expires) =>
        LeaseStatus(owner, expires, expires < System.currentTimeMillis())
      }
    IndexStatus(
      indexDir = indexDir,
      // the protocol GOVERNING THE LAYOUT as it stands — from the
      // layout alone (a published _ptr is sticky), never the caller's
      // session conf: this report must describe the index without any
      // writer's conf, and swapMode only selects what the NEXT
      // maintenance entry will do on a not-yet-pointed layout
      protocol =
        if (Fs.exists(spark, s"$indexDir/_ptr")) "pointer"
        else "rename",
      retainGens = retain,
      retentionRecorded =
        IndexMaintenance.recordedRetention(spark, indexDir).isDefined,
      stages = stages,
      aligned = aligned,
      tombstones = tombstones,
      lease = lease,
      recordedVerdicts =
        Fs.listDirNames(spark, s"$indexDir/_maintenance").sorted,
      pendingMerges = Fs.listDirNames(spark, s"$indexDir/_merges").sorted,
      journalPending =
        Fs.isFile(spark, s"$indexDir/_ptr/_intent") ||
          Fs.isFile(spark, s"$indexDir/_compact/_swap_set"))
  }
}
