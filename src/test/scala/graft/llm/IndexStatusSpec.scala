package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The read-only operability report ([[IndexStatus]]) and the
  * layout-recorded retention window ([[IndexMaintenance.setRetention]])
  * over real lifecycle fixtures — the report must reflect exactly what
  * the protocols wrote, and the recorded window must out-rank any
  * session conf at every GC decision (generations AND tombstone
  * cohorts, in lockstep).
  */
class IndexStatusSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("status reports stages, generations, retained aligned codes, tombstones, merge markers, lease") {
    val dir = Files.createTempDirectory("idxstatus").toString
    val idx = s"$dir/idx"
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = embs.where($"vec_id" >= 10)
    VectorIndex.buildIvf(corpus.where($"vec_id" % 9 =!= 5), idx)
    VectorIndex.buildPq(corpus.where($"vec_id" % 9 =!= 5), idx)
    VectorIndex.mergeIvf(spark, idx, corpus.where($"vec_id" % 9 === 5),
      mergeId = Some("st-ivf"))
    VectorIndex.mergePq(spark, idx, corpus.where($"vec_id" % 9 === 5),
      mergeId = Some("st-pq"))
    // merge provenance markers are visible until the next retrain
    // clears them (a replayed mergeId must then fail the overlap guard)
    val stM = IndexStatus.of(spark, idx)
    assert(stM.pendingMerges.contains("st-ivf") &&
      stM.pendingMerges.contains("st-pq"), stM.describe)
    VectorIndex.alignPqToLists(spark, idx)
    VectorIndex.retrainIvf(spark, idx, swapMode = Some("pointer"))
    VectorIndex.alignPqToLists(spark, idx)
    VectorIndex.deleteIvf(spark, idx,
      corpus.limit(3).select($"vec_id"))

    val st = IndexStatus.of(spark, idx)
    assert(st.protocol == "pointer", st.describe)
    // the four index stages, with the coarse pair flipped to g1 and
    // the PQ halves never flipped (g0 live)
    val byStage = st.stages.map(s => s.stage -> s).toMap
    assert(Set("centroids", "lists", "pq_codes", "pq_codebook")
      .subsetOf(byStage.keySet), st.describe)
    assert(byStage("lists").liveGen == 1L, st.describe)
    assert(byStage("centroids").liveGen == 1L, st.describe)
    assert(byStage("pq_codes").liveGen == 0L, st.describe)
    // both generations of the coarse pair on disk, exactly one live,
    // with a real mtime
    val listGens = byStage("lists").generations
    assert(listGens.map(_.gen).sorted == Seq(0L, 1L), st.describe)
    assert(listGens.count(_.live) == 1 &&
      listGens.find(_.live).get.gen == 1L, st.describe)
    assert(listGens.forall(_.modifiedAt > 0L), st.describe)
    assert(byStage("lists").batchFrontier.isEmpty, st.describe)
    // the aligned artifact: live gate up (re-aligned) AND the retained
    // historical copy at the superseded generation
    assert(st.aligned.exists(a => a.liveGateUp && a.retainedGens == Seq(0L)),
      st.describe)
    // the takedown armed the tombstone gate; nothing folded yet
    assert(st.tombstones.exists(t =>
      t.gateUp && t.dataFiles >= 1 && t.cohorts.isEmpty), st.describe)
    // the retrain cleared the merge markers
    assert(st.pendingMerges.isEmpty, st.describe)
    assert(!st.journalPending, st.describe)
    assert(st.lease.isEmpty, "a released lease still reported")

    // a fold (full compact) retires the tombstones into an age-0 cohort
    // with the lifetime the retention window implies (retainGens+1)
    VectorIndex.compact(spark, idx)
    val st2 = IndexStatus.of(spark, idx)
    assert(st2.tombstones.exists(_.cohorts.exists(c =>
      c.age == 0 && c.lifetime == 2 && c.retiredFiles >= 1)), st2.describe)
    // the fold dropped all retained aligned history (frozen copies
    // could resurrect folded ids)
    assert(st2.aligned.forall(_.retainedGens.isEmpty), st2.describe)

    // the lease is visible (and unexpired) exactly while a maintenance
    // body holds it
    IndexMaintenance.withLease(spark, idx) {
      val held = IndexStatus.of(spark, idx)
      assert(held.lease.exists(l => !l.expired && l.owner.nonEmpty),
        held.describe)
    }
    assert(IndexStatus.of(spark, idx).lease.isEmpty,
      "lease still reported after release")
  }

  test("status reports the batch frontier of stream-grown stages and a pending swap journal") {
    val dir = Files.createTempDirectory("idxstatusb").toString
    val idx = s"$dir/idx"
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = embs.where($"vec_id" >= 10)
    VectorIndex.trainQuantizer(corpus, idx)
    VectorIndex.trainPqCodebook(corpus, idx)
    graft.streaming.VecStream.ingestBatch(
      corpus.where($"vec_id" % 2 === 0), idx, 0L, pqCodes = true)
    graft.streaming.VecStream.ingestBatch(
      corpus.where($"vec_id" % 2 === 1), idx, 1L, pqCodes = true)
    val st = IndexStatus.of(spark, idx)
    val byStage = st.stages.map(s => s.stage -> s).toMap
    assert(byStage("lists").batchFrontier.contains(1L), st.describe)
    assert(byStage("pq_codes").batchFrontier.contains(1L), st.describe)
    // a planted (crashed-swap) journal is surfaced loudly
    val j = s"$dir/journal"
    graft.util.Fs.writeString(spark, s"$j/_ptr/_intent", "lists=g1")
    assert(IndexStatus.of(spark, j).journalPending)
    assert(IndexStatus.of(spark, j).describe.contains("WARNING"))
  }

  test("layout-recorded retention out-ranks the session conf at every GC decision; cohorts follow in lockstep; clearing restores conf") {
    val dir = Files.createTempDirectory("idxretain").toString
    val idx = s"$dir/idx"
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = embs.where($"vec_id" >= 10)
    VectorIndex.buildIvf(corpus, idx)
    // RECORD a 2-generation window in the layout, then run maintenance
    // under a session that says 0 — the stand-in for a different
    // writer's fresh session, which must NOT GC the promised history
    IndexMaintenance.setRetention(spark, idx, Some(2))
    spark.conf.set("spark.graft.index.retainGens", "0")
    try {
      VectorIndex.retrainIvf(spark, idx, swapMode = Some("pointer"))
      VectorIndex.retrainIvf(spark, idx, swapMode = Some("pointer"))
      VectorIndex.retrainIvf(spark, idx, swapMode = Some("pointer"))
      // GC is deferred to the NEXT maintenance entry's hygiene pass —
      // run it explicitly so the window is exactly applied
      IndexMaintenance.recoverStages(spark, idx, Seq("centroids", "lists"))
      val st = IndexStatus.of(spark, idx)
      assert(st.retainGens == 2 && st.retentionRecorded, st.describe)
      val lists = st.stages.find(_.stage == "lists").get
      // live g3 plus the TWO retained generations the record promises —
      // a conf-governed pass at 0 would have GC'd both
      assert(lists.liveGen == 3L, st.describe)
      assert(lists.generations.map(_.gen).sorted == Seq(1L, 2L, 3L),
        st.describe)
      // both depths resolve (the read-side proof of the same promise)
      val q = embs.where($"vec_id" < 10)
        .select($"vec_id".as("query_id"), $"embedding")
      assert(VectorIndex.searchIvfAsOf(spark, idx, q, 4, 5, back = 2)
        .count() > 0)
      // a takedown folded under the recorded window gets the lockstep
      // cohort lifetime (recorded 2 + 1), not the conf's (0 + 1)
      VectorIndex.deleteIvf(spark, idx, corpus.limit(2).select($"vec_id"))
      VectorIndex.compactIvf(spark, idx)
      val st2 = IndexStatus.of(spark, idx)
      assert(st2.tombstones.exists(_.cohorts.exists(_.lifetime == 3)),
        st2.describe)
      // NARROWING the record takes effect at the next entry's hygiene
      IndexMaintenance.setRetention(spark, idx, Some(0))
      VectorIndex.retrainIvf(spark, idx, swapMode = Some("pointer"))
      IndexMaintenance.recoverStages(spark, idx, Seq("centroids", "lists"))
      val st3 = IndexStatus.of(spark, idx)
      val lists3 = st3.stages.find(_.stage == "lists").get
      assert(lists3.generations.map(_.gen) == Seq(lists3.liveGen),
        st3.describe)
      // CLEARING the record hands control back to the session conf
      IndexMaintenance.setRetention(spark, idx, None)
      assert(!IndexStatus.of(spark, idx).retentionRecorded)
      assert(IndexMaintenance.retainGens(spark, idx) == 0,
        "cleared record did not fall back to the session conf")
    } finally spark.conf.unset("spark.graft.index.retainGens")
    assert(IndexMaintenance.retainGens(spark, idx) == 1,
      "unset conf did not fall back to the default window")
  }
}
