package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted MinHash/LSH dedup-index lifecycle: build writes
  * signatures + prefix-partitioned bands + candidate pairs; the
  * index-backed pairs are CELL-IDENTICAL to the inline l03 formulation
  * (the TopKPerKeySpec parity discipline); probe finds a new near-dup
  * batch's corpus twins while reading only matching band partitions.
  */
class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** The dup-augmented corpus the declared dedup queries run on (every
    * 10th doc duplicated under doc_id+100000) — built here from the raw
    * table so the spec does not depend on LlmQueries' private fixture.
    */
  private def corpus = {
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    base.unionByName(
      base.where($"doc_id" % 10 === 0)
        .withColumn("doc_id", $"doc_id" + 100000))
  }

  test("index-backed candidate pairs are cell-identical to the inline formulation") {
    val dir = Files.createTempDirectory("dedupidx").toString
    DedupIndex.build(corpus, s"$dir/idx")

    val fromIndex = DedupIndex.candidatePairs(spark, s"$dir/idx")
      .orderBy("doc_a", "doc_b").as[(Long, Long)].collect()
    val inline = LlmQueries.lshPairsFor(corpus)
      .as[(Long, Long)].collect()
    assert(fromIndex.length == inline.length,
      s"index ${fromIndex.length} pairs vs inline ${inline.length}")
    assert(fromIndex.sameElements(inline), "pair sets diverge")
    assert(fromIndex.nonEmpty, "fixture produced no candidate pairs")
    assert(fromIndex.forall { case (a, b) => a < b }, "pair orientation broken")
  }

  test("signatures and bands round-trip the persisted artifacts exactly") {
    val dir = Files.createTempDirectory("dedupidx").toString
    DedupIndex.build(corpus, s"$dir/idx")

    val sigCols = DedupIndex.signatures(spark, s"$dir/idx").columns.sorted
    assert(sigCols.head == "doc_id" && sigCols.count(_.startsWith("sig")) == 16)
    val persisted = DedupIndex.signatures(spark, s"$dir/idx")
      .orderBy("doc_id").collect()
    val recomputed = LlmQueries.minhashSignatures(corpus)
      .orderBy("doc_id").collect()
    assert(persisted.sameElements(recomputed), "persisted signatures drifted")

    // bands are directory-partitioned by the key's first hex char
    val bandDirs = new java.io.File(s"$dir/idx/bands").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bp="))
    assert(bandDirs.nonEmpty, "no bp= partition directories written")
    assert(bandDirs.length <= 16, s"${bandDirs.length} prefix dirs > 16")
    // every doc appears once per band
    val n = corpus.count()
    assert(DedupIndex.bands(spark, s"$dir/idx").count() == 2 * n)
  }

  test("persisted shingle sets cover every doc with its exact distinct-shingle count") {
    val dir = Files.createTempDirectory("dedupidx").toString
    DedupIndex.build(corpus, s"$dir/idx")
    val sets = DedupIndex.shingleSets(spark, s"$dir/idx")
    assert(sets.columns.sorted.toSeq == Seq("doc_id", "sh_set"))
    assert(sets.count() == corpus.count(), "one row per corpus doc")
    // spot-exact: a doc's persisted set is the distinct 4-gram set of
    // its text (values, not just counts — order inside the array is
    // build-defined, so compare as sets)
    val doc = corpus.orderBy("doc_id").limit(1)
      .as[(Long, String)].collect().head
    val persisted = sets.where($"doc_id" === doc._1)
      .select($"sh_set").as[Seq[String]].collect().head.toSet
    val expected = (1 to math.max(doc._2.length - 3, 1))
      .map(i => doc._2.substring(i - 1, math.min(i + 3, doc._2.length))).toSet
    assert(persisted == expected, "persisted shingle set drifted from text")
  }

  test("resume skips committed stages and redoes only the missing ones") {
    val dir = Files.createTempDirectory("dedupidx").toString
    DedupIndex.build(corpus, s"$dir/idx")
    // simulate a build that died between the bands and pairs stages
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
      f.delete(): Unit
    }
    rmrf(new java.io.File(s"$dir/idx/pairs"))
    rmrf(new java.io.File(s"$dir/idx/shingle_sets"))
    val sigMarker = new java.io.File(s"$dir/idx/signatures/_SUCCESS")
    val before = sigMarker.lastModified()
    DedupIndex.build(corpus, s"$dir/idx", resume = true)
    assert(sigMarker.lastModified() == before,
      "resume rewrote the already-committed signatures stage")
    // the redone stages are complete and consistent with the signatures
    val pairs = DedupIndex.candidatePairs(spark, s"$dir/idx")
      .orderBy("doc_a", "doc_b").as[(Long, Long)].collect()
    val inline = LlmQueries.lshPairsFor(corpus).as[(Long, Long)].collect()
    assert(pairs.sameElements(inline), "resumed pairs diverge from inline")
    assert(DedupIndex.shingleSets(spark, s"$dir/idx").count() == corpus.count())
  }

  test("probe finds a new batch's corpus twins without touching corpus text") {
    val dir = Files.createTempDirectory("dedupidx").toString
    DedupIndex.build(corpus, s"$dir/idx")

    // a batch of verbatim copies of corpus docs under fresh ids: every
    // batch doc must surface its source as a candidate (exact dup ==
    // identical signature == same bucket in EVERY band)
    val batch = corpus.where($"doc_id" % 10 === 3).limit(5)
      .select(($"doc_id" + 900000).as("doc_id"), $"text")
    val sources = batch.select(($"doc_id" - 900000).as("doc_id")).as[Long].collect().toSet
    val got = DedupIndex.probe(spark, s"$dir/idx", batch)
      .as[(Long, Long)].collect()
    val hits = got.collect { case (b, c) if c == b - 900000 => c }.toSet
    assert(hits == sources, s"probe missed twins: ${sources -- hits}")

    // the probe plan reads the bands artifact, never the signatures or
    // any text column — the corpus-side input is the pruned band files
    val plan = DedupIndex.probe(spark, s"$dir/idx", batch)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bands"), "probe does not scan the bands artifact")
    assert(!plan.contains("signatures"), "probe re-reads the signature table")
  }

  test("merge appends a delta in place and equals a from-scratch rebuild") {
    val dir = Files.createTempDirectory("dedupidx").toString
    val base = corpus.where($"doc_id" % 3 =!= 2)
    // Delta: fresh ids, containing near/exact twins of indexed docs
    // (verbatim copies under +900000) AND novel docs, so the merged
    // pairs must gain both delta×corpus and delta×delta entries.
    val delta = corpus.where($"doc_id" % 3 === 2)
      .select(($"doc_id" + 900000).as("doc_id"), $"text")
      .unionByName(corpus.where($"doc_id" % 30 === 0)
        .select(($"doc_id" + 950000).as("doc_id"), $"text"))
    DedupIndex.build(base, s"$dir/merged")
    DedupIndex.merge(spark, s"$dir/merged", delta)
    DedupIndex.build(base.unionByName(delta), s"$dir/scratch")

    def pairsOf(p: String) = DedupIndex.candidatePairs(spark, p)
      .as[(Long, Long)].collect().toSet
    val merged = pairsOf(s"$dir/merged")
    val scratch = pairsOf(s"$dir/scratch")
    assert(merged == scratch,
      s"pairs diverge: merged-only=${(merged -- scratch).take(5)} " +
        s"scratch-only=${(scratch -- merged).take(5)}")
    // The merge added real work in both directions.
    val baseIds = base.select($"doc_id").as[Long].collect().toSet
    assert(merged.exists { case (a, b) => baseIds(a) ^ baseIds(b) },
      "no delta×corpus pair surfaced")
    assert(merged.exists { case (a, b) => !baseIds(a) && !baseIds(b) },
      "no delta×delta pair surfaced")

    // Every sibling artifact covers exactly the union's docs.
    val wantDocs = baseIds ++ delta.select($"doc_id").as[Long].collect().toSet
    for (artifact <- Seq("signatures", "shingle_sets")) {
      val ids = spark.read.parquet(s"$dir/merged/$artifact")
        .select($"doc_id").as[Long].collect()
      assert(ids.length == wantDocs.size, s"$artifact row count")
      assert(ids.toSet == wantDocs, s"$artifact doc coverage")
    }
    val bandRows = DedupIndex.bands(spark, s"$dir/merged")
      .groupBy($"doc_id").count().as[(Long, Long)].collect()
    assert(bandRows.map(_._1).toSet == wantDocs, "bands doc coverage")
    assert(bandRows.forall(_._2 > 0), "empty band set for some doc")
  }

  test("merge rejects a delta whose ids overlap the indexed corpus") {
    val dir = Files.createTempDirectory("dedupidx").toString
    DedupIndex.build(corpus, s"$dir/idx")
    val before = DedupIndex.signatures(spark, s"$dir/idx").count()
    val overlapping = corpus.limit(3) // same ids as indexed docs
    intercept[IllegalArgumentException] {
      DedupIndex.merge(spark, s"$dir/idx", overlapping)
    }
    // nothing was appended before the guard fired
    assert(DedupIndex.signatures(spark, s"$dir/idx").count() == before,
      "guard fired after mutating the index")
  }

  test("compact bounds file growth, removes at-least-once duplicates, keeps layout") {
    val dir = Files.createTempDirectory("dedupidx").toString
    val idx = s"$dir/idx"
    val base = corpus.where($"doc_id" % 3 === 0)
    val d1 = corpus.where($"doc_id" % 3 === 1)
      .select(($"doc_id" + 900000).as("doc_id"), $"text")
    val d2 = corpus.where($"doc_id" % 3 === 2)
      .select(($"doc_id" + 950000).as("doc_id"), $"text")
    DedupIndex.build(base, idx)
    DedupIndex.merge(spark, idx, d1, mergeId = Some("d1"))
    DedupIndex.merge(spark, idx, d2, mergeId = Some("d2"))
    // Simulate the documented at-least-once residual: one stage's append
    // replayed after its commit (duplicate full rows in pairs).
    val replayed = DedupIndex.candidatePairs(spark, idx).limit(7).collect()
    spark.createDataFrame(
        spark.sparkContext.parallelize(replayed.toIndexedSeq),
        DedupIndex.candidatePairs(spark, idx).schema)
      .write.mode("append").parquet(s"$idx/pairs")
    assert(DedupIndex.candidatePairs(spark, idx).count() >
      DedupIndex.candidatePairs(spark, idx).distinct().count(),
      "fixture failed to plant duplicate pairs")
    def parquetFiles(p: String) = new java.io.File(p).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$idx/pairs") > 4,
      "fixture should have accumulated more pair files than one write's worth")

    DedupIndex.compact(spark, idx, targetFiles = 4)

    // Content: every artifact identical to a from-scratch rebuild.
    DedupIndex.build(base.unionByName(d1).unionByName(d2), s"$dir/scratch")
    def pairsOf(p: String) = DedupIndex.candidatePairs(spark, p)
      .as[(Long, Long)].collect().toSet
    assert(pairsOf(idx) == pairsOf(s"$dir/scratch"), "compacted pairs diverge")
    assert(DedupIndex.candidatePairs(spark, idx).count() ==
      pairsOf(idx).size.toLong, "duplicate pair rows survived compaction")
    val n = base.count() + d1.count() + d2.count()
    assert(DedupIndex.signatures(spark, idx).count() == n)
    assert(DedupIndex.shingleSets(spark, idx).count() == n)
    assert(DedupIndex.bands(spark, idx).count() == 2 * n)
    // Files: bounded; bands keep their bp= pruning directories.
    assert(parquetFiles(s"$idx/pairs") <= 4, "pairs file count not bounded")
    val bandDirs = new java.io.File(s"$idx/bands").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bp="))
    assert(bandDirs.nonEmpty, "compaction lost the bp= partition layout")
    assert(bandDirs.forall(d => parquetFiles(d.getPath) == 1),
      "a bp= dir holds more than one file after compaction")
    // Markers cleared; staging gone; replaying an old mergeId now fails
    // loudly on the id-overlap guard instead of silently skipping.
    assert(!new java.io.File(s"$idx/_merges").exists(), "_merges not cleared")
    assert(!new java.io.File(s"$idx/_compact").exists(), "_compact left behind")
    intercept[IllegalArgumentException] {
      DedupIndex.merge(spark, idx, d1, mergeId = Some("d1"))
    }
  }

  test("compact recovers from a mid-swap kill: every crash window leaves a usable index") {
    val dir = Files.createTempDirectory("dedupswap").toString
    DedupIndex.build(corpus, s"$dir/idx")
    val want = DedupIndex.candidatePairs(spark, s"$dir/idx")
      .as[(Long, Long)].collect().toSet
    assert(want.nonEmpty, "fixture produced no pairs")

    // Window 1 — killed BETWEEN the two swap renames: the staged
    // rewrite is complete (its write carries _SUCCESS), the live stage
    // is renamed aside, nothing sits at the live path. The documented
    // recovery is "a re-run simply finishes the job".
    spark.read.parquet(s"$dir/idx/pairs").distinct().repartition(2)
      .write.parquet(s"$dir/idx/_compact/pairs")
    assert(graft.util.Fs.rename(spark, s"$dir/idx/pairs",
      s"$dir/idx/_compact/_old_pairs"))
    assert(!graft.util.Fs.exists(spark, s"$dir/idx/pairs"))
    DedupIndex.compact(spark, s"$dir/idx")
    assert(DedupIndex.candidatePairs(spark, s"$dir/idx")
      .as[(Long, Long)].collect().toSet == want,
      "recovery from the mid-swap window lost or changed pairs")
    assert(!graft.util.Fs.exists(spark, s"$dir/idx/_compact"),
      "_compact not cleared after recovery")

    // Window 2 — only the aside copy survives (staged rewrite lost):
    // recovery falls back to restoring the aside copy.
    assert(graft.util.Fs.rename(spark, s"$dir/idx/pairs",
      s"$dir/idx/_compact/_old_pairs"))
    DedupIndex.compact(spark, s"$dir/idx")
    assert(DedupIndex.candidatePairs(spark, s"$dir/idx")
      .as[(Long, Long)].collect().toSet == want,
      "recovery from the aside-only window lost or changed pairs")

    // Window 3 — a PARTIAL rename planted at the live path: the
    // object-store failure mode the atomicRename gate refuses outright,
    // simulated here to pin that recovery is belt-and-suspenders even
    // against it. The swap-intent marker is up, the staged rewrite is
    // complete (_SUCCESS), and the live stage holds a truncated file
    // subset — bare existence of the live path must NOT be trusted.
    spark.read.parquet(s"$dir/idx/pairs").distinct().repartition(2)
      .write.parquet(s"$dir/idx/_compact/pairs")
    graft.util.Fs.touch(spark, s"$dir/idx/_compact/_swapping_pairs")
    graft.util.Fs.delete(spark, s"$dir/idx/pairs")
    val stagedFiles = new java.io.File(s"$dir/idx/_compact/pairs").listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(stagedFiles.length > 1, "fixture needs a multi-file staged rewrite")
    new java.io.File(s"$dir/idx/pairs").mkdirs()
    java.nio.file.Files.copy(stagedFiles.head.toPath,
      new java.io.File(s"$dir/idx/pairs", stagedFiles.head.getName).toPath)
    assert(spark.read.parquet(s"$dir/idx/pairs").count() <
      want.size.toLong, "fixture failed to plant a truncated live stage")
    DedupIndex.compact(spark, s"$dir/idx")
    assert(DedupIndex.candidatePairs(spark, s"$dir/idx")
      .as[(Long, Long)].collect().toSet == want,
      "recovery served the partial-rename residue instead of the staged copy")
    assert(!graft.util.Fs.exists(spark, s"$dir/idx/_compact"),
      "swap-intent bookkeeping not cleared after partial-rename recovery")
  }

  test("pointer-protocol compact: object-store swap via one-file publish; crash windows converge") {
    val dir = Files.createTempDirectory("dedupptr").toString
    val idx = s"$dir/idx"
    DedupIndex.build(corpus, idx)
    // the documented at-least-once residual: committed pair rows
    // re-appended past their marker — the duplicates compact removes
    val pairs0 = DedupIndex.candidatePairs(spark, idx)
    val replayed = pairs0.limit(20).collect()
    spark.createDataFrame(
        spark.sparkContext.parallelize(replayed.toIndexedSeq), pairs0.schema)
      .write.mode("append").parquet(s"$idx/pairs")
    val want = DedupIndex.candidatePairs(spark, idx)
      .as[(Long, Long)].collect().toSet
    assert(want.nonEmpty, "fixture produced no pairs")

    {
      // swap mode passed per-call — the session conf stays untouched
      DedupIndex.compact(spark, idx, swapMode = Some("pointer"))
      // the swap moved every stage under a published generation: the
      // pointer file names it and the resolver serves the generation
      // path; the bare pre-pointer directory is RETAINED (it is the
      // one superseded copy — an in-flight reader that resolved the
      // stage pre-flip still holds paths into it)
      for (stage <- Seq("signatures", "bands", "pairs", "shingle_sets")) {
        assert(graft.util.Fs.isFile(spark, s"$idx/_ptr/$stage"),
          s"$stage: no pointer published")
        assert(graft.util.Fs.exists(spark, s"$idx/$stage"),
          s"$stage: superseded bare directory dropped at flip time — " +
            "in-flight readers would lose files mid-scan")
        assert(graft.util.Fs.stagePath(spark, idx, stage)
          .startsWith(s"$idx/_gen/$stage/"), s"$stage: resolver not redirected")
      }
      // content parity: the duplicate rows are gone, nothing else moved
      val got = DedupIndex.candidatePairs(spark, idx)
      assert(got.as[(Long, Long)].collect().toSet == want,
        "pointer-mode compact lost or changed pairs")
      assert(got.count() == want.size.toLong,
        "pointer-mode compact kept the planted duplicates")
      // the probe path reads through the resolver (pruned as before)
      assert(DedupIndex.probe(spark, idx,
        corpus.where($"doc_id" % 10 === 0).limit(5)).count() > 0)

      // a second compact bumps the generation; g1 is superseded but
      // RETAINED (retainGens default 1) — a reader that resolved g1
      // just before this flip still completes its scan
      val preFlipPath = graft.util.Fs.stagePath(spark, idx, "pairs")
      DedupIndex.compact(spark, idx)
      assert(graft.util.Fs.readString(spark, s"$idx/_ptr/pairs").trim == "g2")
      assert(graft.util.Fs.exists(spark, preFlipPath),
        "superseded generation deleted at flip — pre-flip readers lose files")
      assert(spark.read.parquet(preFlipPath).count() == want.size.toLong,
        "retained superseded generation no longer readable")
      assert(graft.util.Fs.listDirNames(spark, s"$idx/_gen/pairs").toSet ==
        Set("g1", "g2"), "retention window wrong after second flip")

      // merges keep working against the pointed layout: appends land in
      // the live generation and the pair set grows exactly as before
      val delta = corpus.where($"doc_id" % 10 === 3)
        .withColumn("doc_id", $"doc_id" + 500000)
      DedupIndex.merge(spark, idx, delta, mergeId = Some("ptr-delta"))
      val merged = DedupIndex.candidatePairs(spark, idx)
        .as[(Long, Long)].collect().toSet
      assert(merged.size > want.size, "merge after pointer compact added no pairs")
      assert(want.subsetOf(merged), "merge after pointer compact lost pairs")

      // crash window 1 — journal written, flips not run: recovery
      // replays the journal (the staged generation was verified
      // complete before the journal existed), never serving a mix
      val pre = DedupIndex.candidatePairs(spark, idx)
        .as[(Long, Long)].collect().toSet
      val staged = graft.llm.IndexMaintenance.stagedDir(spark, idx, "pairs")
      DedupIndex.candidatePairs(spark, idx).distinct()
        .write.parquet(staged)
      val gen = staged.split('/').last
      graft.util.Fs.writeString(spark, s"$idx/_ptr/_intent", s"pairs $gen")
      graft.llm.IndexMaintenance.recoverStages(spark, idx, Seq("pairs"))
      assert(graft.util.Fs.readString(spark, s"$idx/_ptr/pairs").trim == gen,
        "journal replay did not complete the flip")
      assert(!graft.util.Fs.isFile(spark, s"$idx/_ptr/_intent"),
        "journal not cleared after replay")
      assert(DedupIndex.candidatePairs(spark, idx)
        .as[(Long, Long)].collect().toSet == pre,
        "journal replay changed the pair set")

      // crash window 2 — a rewrite aborted mid-write (partial
      // generation, no journal): it is unreferenced garbage; recovery's
      // hygiene pass drops it and the next compact proceeds normally.
      // Steady-state garbage stays bounded: current + one retained
      // superseded + the just-superseded copy awaiting the next entry.
      val orphan = graft.llm.IndexMaintenance.stagedDir(spark, idx, "pairs")
      graft.util.Fs.touch(spark, s"$orphan/part-00000.parquet")
      assert(!graft.util.Fs.isFile(spark, s"$orphan/_SUCCESS"))
      DedupIndex.compact(spark, idx)
      assert(DedupIndex.candidatePairs(spark, idx)
        .as[(Long, Long)].collect().toSet == pre,
        "compact after an aborted rewrite lost pairs")
      assert(graft.util.Fs.listDirNames(spark, s"$idx/_gen/pairs").toSet ==
        Set("g2", "g3", "g4"),
        "generation GC did not converge to the bounded retention window")
    }

    // mode is STICKY on layout: with the override gone (auto, local
    // disk), this index stays pointer-governed — the rename protocol
    // would look for live stages at bare paths that no longer exist
    assert(graft.llm.IndexMaintenance.pointerMode(spark, idx),
      "auto mode must keep a pointer layout pointer-governed")
    val before = DedupIndex.candidatePairs(spark, idx)
      .as[(Long, Long)].collect().toSet
    DedupIndex.compact(spark, idx)
    assert(DedupIndex.candidatePairs(spark, idx)
      .as[(Long, Long)].collect().toSet == before,
      "auto-mode compact over a pointer layout lost pairs")
  }

  test("explicit swapMode=rename on a pointer-governed layout fails loudly, served pairs untouched") {
    val dir = Files.createTempDirectory("dedupguard").toString
    val idx = s"$dir/idx"
    DedupIndex.build(corpus, idx)
    DedupIndex.compact(spark, idx, swapMode = Some("pointer"))
    val want = DedupIndex.candidatePairs(spark, idx)
      .as[(Long, Long)].collect().toSet
    // with flips retaining the superseded bare copy, a forced rename
    // swap would otherwise "succeed" against the stale bare directory
    // while every reader keeps resolving through the pointer
    val e = intercept[IllegalArgumentException](
      DedupIndex.compact(spark, idx, swapMode = Some("rename")))
    assert(e.getMessage.contains("pointer-governed"),
      s"wrong guard message: ${e.getMessage}")
    assert(DedupIndex.candidatePairs(spark, idx)
      .as[(Long, Long)].collect().toSet == want,
      "the refused rename-mode compact changed served pairs")
  }

  test("retainGens=0: flips still never delete; the next maintenance entry GCs all superseded copies") {
    val dir = Files.createTempDirectory("dedupgc").toString
    val idx = s"$dir/idx"
    DedupIndex.build(corpus, idx)
    val want = DedupIndex.candidatePairs(spark, idx)
      .as[(Long, Long)].collect().toSet
    DedupIndex.compact(spark, idx, swapMode = Some("pointer"))
    // even at retention 0 the flip itself defers deletion: the bare
    // pre-pointer copy survives until the NEXT maintenance entry
    assert(graft.util.Fs.exists(spark, s"$idx/pairs"),
      "flip deleted the superseded copy in the same call")
    spark.conf.set("spark.graft.index.retainGens", "0")
    try {
      DedupIndex.compact(spark, idx) // entry hygiene GCs bare; flips to g2
      assert(!graft.util.Fs.exists(spark, s"$idx/pairs"),
        "retainGens=0 entry hygiene kept the bare pre-pointer copy")
      DedupIndex.compact(spark, idx) // entry hygiene GCs g1; flips to g3
      assert(graft.util.Fs.listDirNames(spark, s"$idx/_gen/pairs").toSet ==
        Set("g2", "g3"),
        "retainGens=0 did not converge to {just-superseded, current}")
      assert(DedupIndex.candidatePairs(spark, idx)
        .as[(Long, Long)].collect().toSet == want,
        "GC cadence changed served content")
    } finally spark.conf.unset("spark.graft.index.retainGens")
  }

  test("banding-pressure audit records a verdict; maintainIfDue consumes it with the 1x16 reband") {
    val dir = Files.createTempDirectory("dedupmaint").toString
    val idx = s"$dir/idx"
    DedupIndex.build(corpus, idx)
    // healthy: verdict recorded, reband=false, actuator is a no-op
    assert(!DedupIndex.auditBandingPressure(spark, idx),
      "healthy fixture corpus trips the candidate-volume bar")
    val healthy = spark.read.parquet(s"$idx/_maintenance/banding")
      .select($"pressure_x1e4", $"bar_x1e4", $"reband")
      .as[(Long, Long, Boolean)].head()
    assert(!healthy._3 && healthy._1 <= healthy._2,
      s"healthy verdict inconsistent: $healthy")
    assert(!DedupIndex.maintainIfDue(spark, idx),
      "maintainIfDue actuated on a healthy verdict")
    assert(DedupIndex.bandingOf(spark, idx) == ((2, 8)),
      "no-op maintenance changed the banding scheme")

    // flood: one page re-emitted under fresh ids — pressure blows the
    // bar, the verdict is recorded, the actuator rebands to 1x16 and
    // clears it only after the reband committed
    val page = corpus.orderBy($"doc_id").limit(1)
      .select($"text").as[String].head()
    val flood = spark.range(1, 121)
      .select(($"id" + 900000L).as("doc_id"), lit(page).as("text"))
    DedupIndex.merge(spark, idx, flood, mergeId = Some("maint-flood"))
    assert(DedupIndex.auditBandingPressure(spark, idx),
      "the flood did not trip the candidate-volume bar")
    assert(DedupIndex.maintenanceDue(spark, idx))
    assert(DedupIndex.maintainIfDue(spark, idx),
      "a recorded reband verdict was not actuated")
    assert(DedupIndex.bandingOf(spark, idx) == ((1, 16)),
      "the actuator did not leave the index in the target scheme")
    assert(!DedupIndex.maintenanceDue(spark, idx),
      "the consumed verdict was not cleared")
    // the maintained index serves: flood pairs are all present under
    // the new scheme (identical text -> identical full signature)
    val floodPairs = DedupIndex.candidatePairs(spark, idx)
      .where($"doc_a" >= 900000L && $"doc_b" >= 900000L).count()
    assert(floodPairs == 120L * 119L / 2L,
      s"rebanded index lost flood pairs: $floodPairs")
    // and a post-maintenance merge bands in the NEW scheme (the l88
    // guarantee, re-checked through the maintenance path)
    val delta = corpus.where($"doc_id" % 10 === 7)
      .withColumn("doc_id", $"doc_id" + 700000L)
    DedupIndex.merge(spark, idx, delta, mergeId = Some("maint-post"))
    val crossDup = DedupIndex.candidatePairs(spark, idx)
      .where($"doc_b" === $"doc_a" + 700000L).count()
    assert(crossDup > 0,
      "post-maintenance merge banded in a stale scheme (no exact-dup pairs)")
  }

  test("compact preserves a streamed index's batch_id= replay partitions") {
    val dir = Files.createTempDirectory("dedupidx").toString
    val idx = s"$dir/idx"
    // The DocStream fold's layout: every artifact under batch_id=N, with
    // bands nested batch_id=N/bp=X — written here directly so the spec
    // exercises layout preservation without running a stream.
    Seq(0, 1).foreach { b =>
      val batch = corpus.where($"doc_id" % 2 === b)
        .select(($"doc_id" + b * 700000).as("doc_id"), $"text")
      DedupIndex.bandsOf(batch)
        .write.mode("overwrite").partitionBy("bp")
        .parquet(s"$idx/bands/batch_id=$b")
      DedupIndex.signaturesOf(batch)
        .write.mode("overwrite").parquet(s"$idx/signatures/batch_id=$b")
      DedupIndex.pairsOfBands(DedupIndex.bandsOf(batch))
        .write.mode("overwrite").parquet(s"$idx/pairs/batch_id=$b")
      DedupIndex.shingleSetsOf(batch)
        .write.mode("overwrite").parquet(s"$idx/shingle_sets/batch_id=$b")
    }
    def sortedRows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(df.columns.sorted.map(col).toIndexedSeq: _*).collect().toSeq
    val before = Seq("signatures", "bands", "pairs", "shingle_sets")
      .map(a => a -> sortedRows(spark.read.parquet(s"$idx/$a"))).toMap

    DedupIndex.compact(spark, idx)

    Seq("signatures", "bands", "pairs", "shingle_sets").foreach { a =>
      val df = spark.read.parquet(s"$idx/$a")
      assert(df.columns.contains("batch_id"), s"$a lost its batch_id column")
      assert(sortedRows(df) == before(a), s"$a content drifted under compaction")
      val batchDirs = new java.io.File(s"$idx/$a").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      assert(batchDirs.map(_.getName).sorted.toSeq ==
        Seq("batch_id=0", "batch_id=1"), s"$a batch_id= dirs not preserved")
    }
    // the nested bands layout survives: batch_id=N/bp=X
    val nested = new java.io.File(s"$idx/bands/batch_id=0").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bp="))
    assert(nested.nonEmpty, "bands lost the nested bp= layout")
  }

  test("reband derives a new scheme from persisted signatures; merges/probes follow it") {
    val dir = Files.createTempDirectory("dedupreband").toString
    val idx = s"$dir/idx"
    val base = corpus.where($"doc_id" % 7 =!= 3)
    val delta = corpus.where($"doc_id" % 7 === 3)
    DedupIndex.build(base, idx)
    assert(DedupIndex.bandingOf(spark, idx) == ((2, 8)),
      "fresh build must report the production 2x8 scheme")
    val pairs2x8 = DedupIndex.candidatePairs(spark, idx)
      .as[(Long, Long)].collect().toSet

    DedupIndex.reband(spark, idx, 4, 4)
    assert(DedupIndex.bandingOf(spark, idx) == ((4, 4)),
      "scheme not readable from the rebanded artifact")
    // contract: rebanded == the 4x4 derivation from the SAME signatures
    val want = LlmQueries.lshSelfJoin(
        LlmQueries.bandedOfSigs(DedupIndex.signatures(spark, idx), 4, 4))
      .as[(Long, Long)].collect().toSet
    val got = DedupIndex.candidatePairs(spark, idx)
      .as[(Long, Long)].collect().toSet
    assert(got == want, "rebanded pairs diverge from the 4x4 derivation")
    // a finer banding is recall-leaning: an 8-lane band match is two
    // 4-lane matches, so every 2x8 pair survives and new ones appear
    assert(pairs2x8.subsetOf(got), "reband lost 2x8 candidates")
    assert(got.size > pairs2x8.size, "4x4 banding emitted no new candidates")
    // bp= pruning directories rebuilt
    assert(graft.util.Fs.listDirNames(spark,
      graft.util.Fs.stagePath(spark, idx, "bands"))
      .exists(_.startsWith("bp=")), "bp= pruning layout lost")

    // merges against the rebanded index band their delta in the NEW
    // scheme: merged pairs == the 4x4 derivation over the union
    DedupIndex.merge(spark, idx, delta, mergeId = Some("reband-delta"))
    val wantUnion = LlmQueries.lshSelfJoin(
        LlmQueries.bandedOfSigs(DedupIndex.signatures(spark, idx), 4, 4))
      .as[(Long, Long)].collect().toSet
    assert(DedupIndex.candidatePairs(spark, idx)
      .as[(Long, Long)].collect().toSet == wantUnion,
      "post-reband merge banded its delta in the wrong scheme")
    // probe follows the scheme too (a 2x8-banded probe would miss)
    assert(DedupIndex.probe(spark, idx, delta.limit(5)).count() > 0,
      "post-reband probe found nothing")

    // invalid scheme and streamed layouts are refused
    intercept[IllegalArgumentException] {
      DedupIndex.reband(spark, idx, 5, 3)
    }
    val sdir = Files.createTempDirectory("dedupstreamed").toString
    graft.streaming.DocStream.ingestBatch(
      base.limit(10), s"$sdir/corpus", 0L, Some(s"$sdir/idx"))
    intercept[IllegalArgumentException] {
      DedupIndex.reband(spark, s"$sdir/idx", 4, 4)
    }
  }

  test("a crash BETWEEN two rename-protocol stage swaps converges via the set journal") {
    val dir = Files.createTempDirectory("dedupsetjournal").toString
    val idx = s"$dir/idx"
    DedupIndex.build(corpus, idx)
    // stage a NOT-content-equal replacement for both stages (what a
    // reband stages): 4x4 bands + their pairs
    val sigs = DedupIndex.signatures(spark, idx)
    val banded4 = LlmQueries.bandedOfSigs(sigs, 4, 4)
      .withColumn("bp", substring($"bkey", 1, 1))
    banded4.write.partitionBy("bp").parquet(s"$idx/_compact/bands")
    graft.util.Fs.writeString(spark, s"$idx/_compact/bands/_SCHEME", "4x4")
    LlmQueries.lshSelfJoin(banded4).write.parquet(s"$idx/_compact/pairs")
    val wantPairs = LlmQueries.lshSelfJoin(banded4)
      .as[(Long, Long)].collect().toSet
    // the crash: the set journal is up, the BANDS swap completed (its
    // intent marker cleared, staged consumed), the PAIRS swap never
    // ran — every per-stage marker is quiescent, yet the live set is
    // mixed (4x4 bands over 2x8 pairs)
    graft.util.Fs.writeString(spark, s"$idx/_compact/_swap_set", "bands\npairs")
    graft.util.Fs.delete(spark, s"$idx/bands")
    assert(graft.util.Fs.rename(spark, s"$idx/_compact/bands", s"$idx/bands"))
    assert(DedupIndex.candidatePairs(spark, idx)
      .as[(Long, Long)].collect().toSet != wantPairs,
      "fixture failed to produce a mixed half-swapped state")

    graft.llm.IndexMaintenance.recoverStages(spark, idx, Seq("bands", "pairs"))
    assert(DedupIndex.candidatePairs(spark, idx)
      .as[(Long, Long)].collect().toSet == wantPairs,
      "recovery did not finish the journaled pairs swap — mixed set served")
    assert(DedupIndex.bandingOf(spark, idx) == ((4, 4)))
    assert(!graft.util.Fs.isFile(spark, s"$idx/_compact/_swap_set"),
      "set journal not cleared after convergence")
  }

  test("bp pruning prefix widens to 2 hex chars; width is self-described and followed") {
    val dir = Files.createTempDirectory("dedupwide").toString
    val idx = s"$dir/idx"
    val base = corpus.where($"doc_id" % 7 =!= 3)
    val delta = corpus.where($"doc_id" % 7 === 3)
    DedupIndex.build(base, idx, prefixLen = 2)
    assert(DedupIndex.prefixLenOf(spark, idx) == 2,
      "width not readable from the live layout")
    val dirs = graft.util.Fs.listDirNames(spark,
        graft.util.Fs.stagePath(spark, idx, "bands"))
      .filter(_.startsWith("bp="))
    assert(dirs.forall(_.length == 5), s"bp values not 2 hex chars: ${dirs.take(3)}")
    assert(dirs.size > 16, s"2-char prefix yielded only ${dirs.size} partitions")

    // the prefix is layout only: pairs equal a width-1 build's
    DedupIndex.build(base, s"$dir/narrow")
    assert(DedupIndex.candidatePairs(spark, idx)
        .as[(Long, Long)].collect().toSet ==
      DedupIndex.candidatePairs(spark, s"$dir/narrow")
        .as[(Long, Long)].collect().toSet,
      "prefix width changed the candidate pairs")

    // probe and merge band their input at the index's width (a 1-char
    // probe against a 2-char layout would prune to nonexistent dirs)
    assert(DedupIndex.probe(spark, idx, delta.limit(5)).count() ==
      DedupIndex.probe(spark, s"$dir/narrow", delta.limit(5)).count(),
      "probe results diverge across prefix widths")
    DedupIndex.merge(spark, idx, delta, mergeId = Some("wide-delta"))
    DedupIndex.merge(spark, s"$dir/narrow", delta, mergeId = Some("narrow-delta"))
    assert(DedupIndex.candidatePairs(spark, idx)
        .as[(Long, Long)].collect().toSet ==
      DedupIndex.candidatePairs(spark, s"$dir/narrow")
        .as[(Long, Long)].collect().toSet,
      "merge under a widened prefix lost candidates")

    // reband can widen in the same pass; both properties re-derive
    DedupIndex.reband(spark, s"$dir/narrow", 4, 4, prefixLen = 2)
    assert(DedupIndex.bandingOf(spark, s"$dir/narrow") == ((4, 4)))
    assert(DedupIndex.prefixLenOf(spark, s"$dir/narrow") == 2)
  }

  test("merge with a mergeId is idempotent: replay and partial-failure resume") {
    val dir = Files.createTempDirectory("dedupidx").toString
    val base = corpus.where($"doc_id" % 3 =!= 2)
    val delta = corpus.where($"doc_id" % 3 === 2)
      .select(($"doc_id" + 900000).as("doc_id"), $"text")
    DedupIndex.build(base, s"$dir/idx")
    DedupIndex.merge(spark, s"$dir/idx", delta, mergeId = Some("d1"))
    def counts() = Seq("pairs", "bands", "signatures", "shingle_sets")
      .map(a => a -> spark.read.parquet(s"$dir/idx/$a").count()).toMap
    val after = counts()
    // full replay with the same id: every stage skips, nothing appends
    DedupIndex.merge(spark, s"$dir/idx", delta, mergeId = Some("d1"))
    assert(counts() == after, "replayed merge re-appended committed stages")
    // partial-failure resume: drop the markers for the LAST two stages
    // (simulating a merge that died after pairs+bands committed) —
    // the resume must NOT re-append pairs or bands, and must not trip
    // the disjointness guard even though the delta's ids are now half
    // merged in.
    new java.io.File(s"$dir/idx/_merges/d1/signatures.done").delete()
    new java.io.File(s"$dir/idx/_merges/d1/shingle_sets.done").delete()
    // roll the index back to that crash state
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
      f.delete(): Unit
    }
    rmrf(new java.io.File(s"$dir/idx/signatures"))
    rmrf(new java.io.File(s"$dir/idx/shingle_sets"))
    LlmQueries.minhashSignatures(base)
      .write.parquet(s"$dir/idx/signatures")
    DedupIndex.shingleSetsOf(base)
      .write.parquet(s"$dir/idx/shingle_sets")
    DedupIndex.merge(spark, s"$dir/idx", delta, mergeId = Some("d1"))
    val resumed = counts()
    assert(resumed("pairs") == after("pairs"), "resume re-appended pairs")
    assert(resumed("bands") == after("bands"), "resume re-appended bands")
    assert(resumed("signatures") == after("signatures"), "signatures not completed")
    assert(resumed("shingle_sets") == after("shingle_sets"), "shingle_sets not completed")
  }

  test("pointer-mode tombstone retirement matches the generation retention window; cohorts age independently") {
    val dir = Files.createTempDirectory("dedupttl").toString
    val idx = s"$dir/idx"
    DedupIndex.build(corpus, idx)
    def markers() = Option(new java.io.File(s"$idx/_tombstones").listFiles())
      .map(_.count(_.getName.startsWith("_FOLDED"))).getOrElse(0)
    def served() = DedupIndex.signatures(spark, idx)
      .select($"doc_id").as[Long].collect().toSet
    val idsA = corpus.where($"doc_id" % 10 === 0 && $"doc_id" < 100000)
      .select($"doc_id")
    val idsB = corpus.where($"doc_id" % 10 === 1).select($"doc_id")
    val setA = idsA.as[Long].collect().toSet
    val setB = idsB.as[Long].collect().toSet
    DedupIndex.delete(spark, idx, idsA)
    // fold A under the pointer protocol: cohort 1 retires with
    // ttl = retainGens + 1 = 2 — its files must SURVIVE the next entry
    // (a reader on the retained pre-fold generation still needs them)
    DedupIndex.compact(spark, idx, swapMode = Some("pointer"))
    assert(markers() == 1, "fold A did not retire a cohort")
    DedupIndex.delete(spark, idx, idsB)
    // entry 2: ages cohort 1 (kept), folds B into its own cohort —
    // the fresh cohort must NOT reset cohort 1's clock
    DedupIndex.compact(spark, idx)
    assert(markers() == 2, s"expected two independent cohorts, got ${markers()}")
    // entry 3: cohort 1 falls out of the retention window (GC'd),
    // cohort 2 ages
    DedupIndex.compact(spark, idx)
    assert(markers() == 1, s"cohort 1 not GC'd at entry 3 (markers=${markers()})")
    // entry 4: cohort 2 GC'd; nothing left — the set is dropped whole
    DedupIndex.compact(spark, idx)
    assert(!new java.io.File(s"$idx/_tombstones").exists(),
      "retirement did not converge to an empty tombstone set")
    // served view was the survivors-only corpus throughout and still is
    assert(served().intersect(setA ++ setB).isEmpty,
      "a deleted id was served after retirement converged")
  }

  test("asOf reads serve the retained superseded generation; bounds and takedowns enforced") {
    val dir = Files.createTempDirectory("dedupasof").toString
    val idx = s"$dir/idx"
    DedupIndex.build(corpus, idx)
    // never pointer-swapped: no history exists, and the error says so
    val ex0 = intercept[IllegalArgumentException] {
      DedupIndex.candidatePairsAsOf(spark, idx, back = 1).count()
    }
    assert(ex0.getMessage.contains("never"), ex0.getMessage)
    val pairs2x8 = DedupIndex.candidatePairs(spark, idx)
      .as[(Long, Long)].collect().toSet
    DedupIndex.reband(spark, idx, 1, 16, swapMode = Some("pointer"))
    val pairs1x16 = DedupIndex.candidatePairs(spark, idx)
      .as[(Long, Long)].collect().toSet
    assert(pairs1x16 != pairs2x8, "fixture: reband changed nothing to travel to")
    // back=1 is the pre-reband 2x8 artifact, exactly
    assert(DedupIndex.candidatePairsAsOf(spark, idx, back = 1)
      .as[(Long, Long)].collect().toSet == pairs2x8,
      "asOf(1) is not the superseded generation")
    // past the retention window: loud, with the widening knob named
    val ex1 = intercept[IllegalArgumentException] {
      DedupIndex.candidatePairsAsOf(spark, idx, back = 2).count()
    }
    assert(ex1.getMessage.contains("retainGens"), ex1.getMessage)
    // a takedown beats time travel: current tombstones filter history
    val victim = pairs2x8.head._1
    DedupIndex.delete(spark, idx, Seq(victim).toDF("doc_id"))
    val historic = DedupIndex.candidatePairsAsOf(spark, idx, back = 1)
      .as[(Long, Long)].collect().toSet
    assert(!historic.exists(p => p._1 == victim || p._2 == victim),
      "a deleted id was served from a historical snapshot")
  }

  test("delete tombstones documents: filtered reads equal a survivors-only build; compact folds and clears") {
    val dir = Files.createTempDirectory("dedupidx").toString
    DedupIndex.build(corpus, s"$dir/idx")
    // delete every 10th base doc — each has a planted +100000 twin, so
    // the deletion visibly removes candidate pairs
    val deleted = corpus.where($"doc_id" % 10 === 0 && $"doc_id" < 100000)
      .select($"doc_id")
    val deletedIds = deleted.as[Long].collect().toSet
    assert(deletedIds.nonEmpty)
    DedupIndex.delete(spark, s"$dir/idx", deleted)
    // replayed delete is inert (at-least-once posture)
    DedupIndex.delete(spark, s"$dir/idx", deleted)

    // every reader filters, and the filtered view equals a from-scratch
    // build over the surviving corpus (row-local artifacts make the two
    // identical by construction — this is the delete's core contract)
    val survivors = corpus.where(!$"doc_id".isin(deletedIds.toSeq: _*))
    DedupIndex.build(survivors, s"$dir/ref")
    def pairsOf(idx: String) = DedupIndex.candidatePairs(spark, s"$dir/$idx")
      .orderBy("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    val filteredPairs = pairsOf("idx")
    assert(filteredPairs.nonEmpty)
    assert(filteredPairs == pairsOf("ref"), "filtered pairs != survivors-only build")
    assert(!filteredPairs.exists { case (a, b) =>
      deletedIds(a) || deletedIds(b) }, "a deleted endpoint survived")
    val sigIds = DedupIndex.signatures(spark, s"$dir/idx")
      .select("doc_id").as[Long].collect().toSet
    assert(sigIds.intersect(deletedIds).isEmpty, "deleted signature served")
    assert(DedupIndex.shingleSets(spark, s"$dir/idx").count() ==
      survivors.count(), "shingle sets not filtered")

    // probe: a batch pasting a deleted doc's text must not hit the
    // deleted corpus doc (its surviving +100000 twin still matches)
    val sample = deletedIds.min
    val batch = corpus.where($"doc_id" === sample)
      .select(($"doc_id" + 500000).as("doc_id"), $"text")
    val hits = DedupIndex.probe(spark, s"$dir/idx", batch)
      .select("corpus_doc").as[Long].collect().toSet
    assert(!hits.contains(sample), "probe served a deleted corpus doc")
    assert(hits.contains(sample + 100000), "probe lost the surviving twin")

    // merge re-adding a deleted (unfolded) id fails loudly
    val readd = corpus.where($"doc_id" === sample)
    val ex = intercept[IllegalArgumentException] {
      DedupIndex.merge(spark, s"$dir/idx", readd)
    }
    assert(ex.getMessage.contains("doc_ids"), ex.getMessage)
    // and so does an in-place REBUILD over the tombstoned layout — the
    // stale set would silently re-delete any rebuilt tombstoned id
    val exb = intercept[IllegalArgumentException] {
      DedupIndex.build(corpus, s"$dir/idx")
    }
    assert(exb.getMessage.contains("tombstones"), exb.getMessage)

    // compact folds the removals into the artifacts and RETIRES the
    // set (kept one further maintenance cycle for readers on retained
    // generations — the _FOLDED marker names what the NEXT entry GCs);
    // the served view is unchanged, and the RAW artifacts are clean
    DedupIndex.compact(spark, s"$dir/idx")
    assert(Option(new java.io.File(s"$dir/idx/_tombstones").listFiles())
      .exists(_.exists(_.getName.startsWith("_FOLDED"))),
      "fold did not retire the observed tombstones")
    assert(pairsOf("idx") == filteredPairs, "fold changed the served pairs")
    val rawSigIds = spark.read.parquet(s"$dir/idx/signatures")
      .select("doc_id").as[Long].collect().toSet
    assert(rawSigIds.intersect(deletedIds).isEmpty, "fold left deleted rows")
    // retired-but-not-yet-GCed tombstones still refuse a re-add (the
    // conservative direction — they still filter readers)
    intercept[IllegalArgumentException] {
      DedupIndex.merge(spark, s"$dir/idx", readd)
    }
    // the NEXT maintenance entry garbage-collects the retired files;
    // the id is then legitimately re-addable
    DedupIndex.compact(spark, s"$dir/idx")
    assert(!new java.io.File(s"$dir/idx/_tombstones").exists(),
      "second maintenance entry did not GC the retired tombstones")
    DedupIndex.merge(spark, s"$dir/idx", readd)
    assert(DedupIndex.signatures(spark, s"$dir/idx")
      .where($"doc_id" === sample).count() == 1L, "re-add after fold failed")
  }

  test("raising retainGens mid-lifecycle extends the cohort in lockstep: historical reads never see a tombstoned row") {
    val dir = Files.createTempDirectory("dedupcohort").toString
    val idx = s"$dir/idx"
    DedupIndex.build(corpus, idx)
    val ids = corpus.where($"doc_id" % 10 === 0 && $"doc_id" < 100000)
      .select($"doc_id")
    val deleted = ids.as[Long].collect().toSet
    DedupIndex.delete(spark, idx, ids)
    def markers() = Option(new java.io.File(s"$idx/_tombstones").listFiles())
      .map(_.count(_.getName.startsWith("_FOLDED"))).getOrElse(0)
    // entry 1: fold under the pointer protocol (cohort retired, age=0)
    DedupIndex.compact(spark, idx, swapMode = Some("pointer"))
    assert(markers() == 1, "fold did not retire a cohort")
    // the operator RAISES retainGens after the fold: generation hygiene
    // now keeps pre-fold generations longer, and the cohort's lifetime
    // must stretch with it (a frozen fold-time TTL would GC the
    // tombstones at entry 3 while the pre-fold bare generation survives
    // to entry 5 — a historical read would then serve deleted rows)
    spark.conf.set("spark.graft.index.retainGens", "3")
    try {
      DedupIndex.compact(spark, idx) // entry 2
      DedupIndex.compact(spark, idx) // entry 3
      assert(markers() == 1,
        "cohort GC'd at entry 3 — the lifetime was frozen at fold time " +
          "instead of re-derived from the live retainGens")
      // the deepest retained snapshot is the PRE-FOLD bare generation:
      // its raw rows still hold the deleted ids, so the still-live
      // tombstones are load-bearing here
      val rawHistoric = spark.read.parquet(
        IndexMaintenance.stagePathAsOf(spark, idx, "pairs", 3))
      assert(rawHistoric.where($"doc_a".isin(deleted.toSeq: _*) ||
        $"doc_b".isin(deleted.toSeq: _*)).count() > 0,
        "fixture: the pre-fold generation should still hold deleted pairs raw")
      (1 to 3).foreach { back =>
        val served = DedupIndex.candidatePairsAsOf(spark, idx, back)
          .as[(Long, Long)].collect()
        assert(!served.exists(p => deleted(p._1) || deleted(p._2)),
          s"asOf($back) served a tombstoned row")
      }
      // a REFUSED entry (live foreign lease) must not age the cohort:
      // beginFold runs inside the lease, so a refused attempt is a
      // no-op on the retirement clock
      val lease = new java.io.File(s"$idx/_maintenance/_lease")
      lease.getParentFile.mkdirs()
      java.nio.file.Files.write(lease.toPath,
        s"owner=other/thread-1\nexpires=${System.currentTimeMillis() + 3600000L}"
          .getBytes("UTF-8"))
      val marker = new java.io.File(s"$idx/_tombstones").listFiles()
        .filter(_.getName.startsWith("_FOLDED")).head
      val ageBefore = new String(
        java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8")
        .linesIterator.next()
      intercept[IllegalArgumentException] { DedupIndex.compact(spark, idx) }
      assert(new String(
        java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8")
        .linesIterator.next() == ageBefore,
        "a lease-refused entry aged the retirement cohort")
      assert(lease.delete())
      DedupIndex.compact(spark, idx) // entry 4: cohort age 3 < 4 — kept
      assert(markers() == 1, "cohort GC'd one entry early")
      DedupIndex.compact(spark, idx) // entry 5: age 4 — out of the window
      assert(!new java.io.File(s"$idx/_tombstones").exists(),
        "retirement did not converge once the widened window elapsed")
    } finally spark.conf.unset("spark.graft.index.retainGens")
  }

  test("an uncommitted append's _temporary task files are not counted as tombstone data") {
    val dir = Files.createTempDirectory("deduptemp").toString
    val idx = s"$dir/idx"
    DedupIndex.build(corpus, idx)
    DedupIndex.delete(spark, idx,
      corpus.where($"doc_id" % 10 === 0 && $"doc_id" < 100000)
        .select($"doc_id"))
    DedupIndex.compact(spark, idx) // entry 1: fold + retire
    // plant the on-disk residue of an in-flight (or crashed) Append:
    // committer task files under _temporary/ — never visible to a
    // parquet read, so no reader was ever filtered by them
    val tmpTask = new java.io.File(
      s"$idx/_tombstones/_temporary/0/task_0/part-00000.parquet")
    tmpTask.getParentFile.mkdirs()
    assert(tmpTask.createNewFile())
    // entry 2: GCs the retired cohort; with no COMMITTED data files
    // left the set must tear down whole — counting the task file as
    // data would defer the teardown (and retire a never-visible file
    // into a fresh cohort)
    DedupIndex.compact(spark, idx)
    assert(!new java.io.File(s"$idx/_tombstones").exists(),
      "an uncommitted _temporary task file deferred the empty-set teardown")
  }

  test("a marker-resumed merge still refuses a delta whose ids were deleted after the crash") {
    val dir = Files.createTempDirectory("dedupresume").toString
    val idx = s"$dir/idx"
    val base = corpus.where($"doc_id" % 5 =!= 4)
    val delta = corpus.where($"doc_id" % 5 === 4)
    DedupIndex.build(base, idx)
    DedupIndex.merge(spark, idx, delta, mergeId = Some("d1"))
    // roll back to the crash state "signatures committed, shingle_sets
    // not": the resume path whose done("signatures") gate used to skip
    // the tombstone guard entirely
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
      f.delete(): Unit
    }
    assert(new java.io.File(s"$idx/_merges/d1/shingle_sets.done").delete())
    rmrf(new java.io.File(s"$idx/shingle_sets"))
    DedupIndex.shingleSetsOf(base).write.parquet(s"$idx/shingle_sets")
    // a takedown lands between the crash and the retry, naming delta ids
    DedupIndex.delete(spark, idx, delta.select($"doc_id").limit(3))
    // the retry must fail LOUDLY instead of appending the remaining
    // stage's rows pre-deleted (a silent re-delete)
    val ex = intercept[IllegalArgumentException] {
      DedupIndex.merge(spark, idx, delta, mergeId = Some("d1"))
    }
    assert(ex.getMessage.contains("tombstoned"), ex.getMessage)
  }

  test("maintenance lease: a live conflicting lease refuses loudly; a crashed holder's expires; two in-JVM threads are two writers") {
    val dir = Files.createTempDirectory("deduplease").toString
    val idx = s"$dir/idx"
    DedupIndex.build(corpus, idx)
    val lease = new java.io.File(s"$idx/_maintenance/_lease")
    lease.getParentFile.mkdirs()
    // a LIVE lease held by another process: the entry must refuse
    java.nio.file.Files.write(lease.toPath,
      s"owner=other-driver/thread-1\nexpires=${System.currentTimeMillis() + 3600000L}"
        .getBytes("UTF-8"))
    val ex = intercept[IllegalArgumentException] {
      DedupIndex.compact(spark, idx)
    }
    assert(ex.getMessage.contains("lease"), ex.getMessage)
    // merges are writers too: the same live lease refuses them
    val exm = intercept[IllegalArgumentException] {
      DedupIndex.merge(spark, idx,
        corpus.limit(1).select(($"doc_id" + 700000L).as("doc_id"), $"text"))
    }
    assert(exm.getMessage.contains("lease"), exm.getMessage)
    // a CRASHED holder's lease (expired TTL): the entry takes over,
    // completes, and releases
    java.nio.file.Files.write(lease.toPath,
      s"owner=crashed-driver/thread-1\nexpires=${System.currentTimeMillis() - 1000L}"
        .getBytes("UTF-8"))
    DedupIndex.compact(spark, idx)
    assert(!lease.exists(), "the completed entry did not release its lease")
    // a second THREAD of this process is still a second writer: while
    // thread A holds the lease, thread B's entry must refuse (and A's
    // own nested swap re-enters fine — every compact above exercises
    // compactStages -> swapStages under one lease)
    val started = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    @volatile var holderFailed: Option[Throwable] = None
    val holder = new Thread(() =>
      try IndexMaintenance.withLease(spark, idx) {
        started.countDown(); release.await()
      } catch { case t: Throwable => holderFailed = Some(t); started.countDown() })
    holder.start()
    started.await()
    assert(holderFailed.isEmpty, s"holder thread failed: $holderFailed")
    val ex2 = intercept[IllegalArgumentException] {
      DedupIndex.compact(spark, idx)
    }
    assert(ex2.getMessage.contains("THIS process"), ex2.getMessage)
    release.countDown()
    holder.join()
    DedupIndex.compact(spark, idx) // released: the next entry proceeds
  }

  test("an overrunning holder's release leaves a successor's live lease in place") {
    val idx = Files.createTempDirectory("leaseover").toString
    val lease = new java.io.File(s"$idx/_maintenance/_lease")
    // TTL 0: our own lease is expired the moment it is written — the
    // documented takeover window, forced open
    spark.conf.set("spark.graft.index.leaseMs", "0")
    try {
      IndexMaintenance.withLease(spark, idx) {
        // a second driver legitimately takes over the expired lease
        // while we are still (over)running (written through the same
        // Fs path a real takeover uses)
        graft.util.Fs.writeString(spark, lease.getPath,
          s"owner=successor-driver/thread-9\nexpires=${System.currentTimeMillis() + 3600000L}")
      }
    } finally spark.conf.unset("spark.graft.index.leaseMs")
    // our release must NOT delete the successor's live lease — that
    // would re-open the window to a third writer
    assert(lease.exists(), "release deleted a successor's live lease")
    val restored = new String(
      java.nio.file.Files.readAllBytes(lease.toPath), "UTF-8")
    assert(restored.contains("successor-driver"),
      "successor lease content clobbered")
    // the rename-claim restore must never SHORTEN the successor's
    // expiry (the rewrite bumps by max(claimed, now + TTL) — with this
    // fixture's TTL of 0, the claimed +1h must survive)
    val expiry = restored.split("\n").collectFirst {
      case l if l.startsWith("expires=") => l.drop(8).trim.toLong
    }.get
    assert(expiry >= System.currentTimeMillis() + 3000000L,
      s"restore shortened the successor's expiry to $expiry")
  }

  test("a torn lease file reads as expired and is taken over, not wedged forever") {
    val dir = Files.createTempDirectory("leasetorn").toString
    val idx = s"$dir/idx"
    DedupIndex.build(corpus, idx)
    // a crash mid-writeString (or an external edit) leaves an
    // unparsable expires= — acquisition must read it as a crashed
    // holder (expired) and take over, NOT throw NumberFormatException:
    // takeover is the only path that overwrites the file, so a throwing
    // parse would wedge maintenance until manual deletion
    graft.util.Fs.writeString(spark, s"$idx/_maintenance/_lease",
      s"owner=crashed-driver/thread-1\nexpires=${Long.MaxValue}x")
    DedupIndex.compact(spark, idx) // takes over, completes, releases
    assert(!new java.io.File(s"$idx/_maintenance/_lease").exists(),
      "the take-over entry did not release its lease")
  }

  test("aliased index-path spellings collide on one in-JVM lease entry") {
    val idx = Files.createTempDirectory("leasealias").toString
    val started = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    @volatile var holderFailed: Option[Throwable] = None
    val holder = new Thread(() =>
      try IndexMaintenance.withLease(spark, idx) {
        started.countDown(); release.await()
      } catch { case t: Throwable => holderFailed = Some(t); started.countDown() })
    holder.start()
    started.await()
    assert(holderFailed.isEmpty, s"holder thread failed: $holderFailed")
    try {
      // a trailing slash or a file: scheme prefix spells the SAME index:
      // both must be refused as a second in-JVM writer — two map keys
      // would let both threads win putIfAbsent and race the non-atomic
      // file protocol the map exists to guard
      for (alias <- Seq(s"$idx/", s"file:$idx")) {
        val ex = intercept[IllegalArgumentException] {
          IndexMaintenance.withLease(spark, alias) {
            fail(s"second writer entered via alias $alias")
          }
        }
        assert(ex.getMessage.contains("THIS process"), ex.getMessage)
      }
    } finally { release.countDown(); holder.join() }
  }

  test("fence: a TTL-overrun holder taken over aborts its swap loudly, leaving the successor intact") {
    val idx = Files.createTempDirectory("leasefence").toString
    val leaseFile = s"$idx/_maintenance/_lease"
    // a _SUCCESS-complete staged rewrite, so the swap reaches its fence
    // (the pre-fence requires must pass)
    graft.util.Fs.touch(spark, s"$idx/_compact/st/_SUCCESS")
    // TTL 0: the holder is expired the moment it acquires — the
    // overrun window, forced open
    spark.conf.set("spark.graft.index.leaseMs", "0")
    try {
      val ex = intercept[IllegalStateException] {
        IndexMaintenance.withLease(spark, idx) {
          // a successor legitimately takes over the expired lease while
          // our maintenance pass is still (over)running
          graft.util.Fs.writeString(spark, leaseFile,
            s"owner=successor-driver/thread-9\nexpires=${System.currentTimeMillis() + 3600000L}")
          // the zombie's in-flight pass now tries to publish its swap:
          // the fence must abort BEFORE the journal write or any rename
          IndexMaintenance.swapStages(spark, idx, Seq("st"),
            swapMode = Some("rename"))
        }
      }
      assert(ex.getMessage.contains("lease"), ex.getMessage)
    } finally spark.conf.unset("spark.graft.index.leaseMs")
    // the successor's world is untouched: its lease survives (release
    // checked ownership), no swap journal was written, the zombie's
    // staged copy was never consumed
    assert(graft.util.Fs.readString(spark, leaseFile)
      .contains("successor-driver"), "successor lease clobbered")
    assert(!graft.util.Fs.exists(spark, s"$idx/_compact/_swap_set"),
      "the fenced zombie still wrote its swap journal")
    assert(graft.util.Fs.isFile(spark, s"$idx/_compact/st/_SUCCESS"),
      "the fenced zombie still consumed its staged copy")
    assert(!graft.util.Fs.exists(spark, s"$idx/st"),
      "the fenced zombie still renamed a stage into place")
  }

  test("fence renews an overrun lease nobody took over, instead of aborting") {
    val idx = Files.createTempDirectory("leaseheart").toString
    spark.conf.set("spark.graft.index.leaseMs", "0")
    try {
      IndexMaintenance.withLease(spark, idx) {
        // expired, but no successor: the fence re-reads, finds our own
        // owner token, renews (the heartbeat), and lets the pass go on
        IndexMaintenance.fence(spark, idx)
        assert(graft.util.Fs.readString(spark, s"$idx/_maintenance/_lease")
          .contains("owner="), "renewal lost the lease file")
      }
    } finally spark.conf.unset("spark.graft.index.leaseMs")
  }

  test("a fence-aborted swap disarms only its OWN just-written journal") {
    val dir = Files.createTempDirectory("disarm").toString
    val j = s"$dir/_swap_set"
    // ours: the abort path deletes it (recovery must not replay it)
    graft.util.Fs.writeString(spark, j, "signatures")
    IndexMaintenance.disarmOwnJournal(spark, j, "signatures")
    assert(!graft.util.Fs.exists(spark, j), "own journal left armed")
    // a successor's journal written in the abort gap: left in place
    graft.util.Fs.writeString(spark, j, "lists g2")
    IndexMaintenance.disarmOwnJournal(spark, j, "signatures")
    assert(graft.util.Fs.isFile(spark, j), "a successor's journal was disarmed")
    // already gone: a no-op
    graft.util.Fs.delete(spark, j)
    IndexMaintenance.disarmOwnJournal(spark, j, "signatures")
  }

  test("takeover double-reads an expired/torn lease: a heartbeat completing in the gap refuses the contender") {
    val dir = Files.createTempDirectory("leasedouble").toString
    val lease = s"$dir/_maintenance/_lease"
    // first read will see a TORN lease (unparsable expires= — also what
    // a heartbeat rewrite caught mid-truncate looks like); a thread
    // standing in for the live holder completes the "renewal" well
    // inside the contender's 100ms re-read beat
    graft.util.Fs.writeString(spark, lease,
      "owner=live-holder/thread-3\nexpires=")
    val renewer = new Thread(() => {
      Thread.sleep(30L)
      graft.util.Fs.writeString(spark, lease,
        s"owner=live-holder/thread-3\nexpires=${System.currentTimeMillis() + 3600000L}")
    })
    renewer.start()
    val ex = intercept[IllegalArgumentException] {
      IndexMaintenance.withLease(spark, dir) {
        fail("contender acquired over a live holder's mid-renewal lease")
      }
    }
    renewer.join()
    assert(ex.getMessage.contains("lease"), ex.getMessage)
    assert(graft.util.Fs.readString(spark, lease).contains("live-holder"),
      "the contender clobbered the live holder's lease")
  }

  test("a merge converges a crashed swap's journal BEFORE appending, so the append survives later recovery") {
    val dir = Files.createTempDirectory("mergeconv").toString
    val idx = s"$dir/idx"
    DedupIndex.build(corpus, idx)
    // plant the crashed-mid-swap state a killed compact leaves: a
    // _SUCCESS-complete staged rewrite of signatures plus the armed set
    // journal. A merge appending WITHOUT converging this first would be
    // silently discarded when a later entry's recovery replays the
    // (pre-merge) staged copy over the live stage.
    spark.read.parquet(s"$idx/signatures")
      .write.parquet(s"$idx/_compact/signatures")
    graft.util.Fs.writeString(spark, s"$idx/_compact/_swap_set", "signatures")
    val delta = corpus.orderBy("doc_id").limit(1)
      .select(($"doc_id" + 900000L).as("doc_id"), $"text")
    val did = delta.select($"doc_id").as[Long].head()
    DedupIndex.merge(spark, idx, delta, mergeId = Some("conv1"))
    assert(!graft.util.Fs.exists(spark, s"$idx/_compact/_swap_set"),
      "merge appended without converging the crashed swap")
    // the merged row is in the live stage AND survives the next
    // maintenance entry (nothing left to replay over it)
    DedupIndex.compact(spark, idx)
    assert(spark.read.parquet(s"$idx/signatures")
      .where($"doc_id" === did).count() == 1L,
      "the merged row was lost to a stale journal replay")
  }

  test("a fully-committed merge replays as an inert no-op, even after one of its ids was deleted") {
    val dir = Files.createTempDirectory("mergenoop").toString
    val idx = s"$dir/idx"
    DedupIndex.build(corpus, idx)
    val delta = corpus.orderBy("doc_id").limit(2)
      .select(($"doc_id" + 800000L).as("doc_id"), $"text")
    DedupIndex.merge(spark, idx, delta, mergeId = Some("m1"))
    val rawSigs = spark.read.parquet(s"$idx/signatures").count()
    // a takedown of one merged id lands AFTER the merge fully committed
    DedupIndex.delete(spark, idx, delta.limit(1).select($"doc_id"))
    // the docstring's retry contract: a re-run with the same id skips
    // committed stages — ALL four committed means the replay appends
    // nothing and must not throw on the tombstone guard (the guard
    // protects rows about to land; a completed merge lands none)
    DedupIndex.merge(spark, idx, delta, mergeId = Some("m1"))
    assert(spark.read.parquet(s"$idx/signatures").count() == rawSigs,
      "the no-op replay appended rows")
    // a PARTIALLY-committed retry still refuses the tombstoned delta:
    // its remaining stages would append rows pre-deleted
    graft.util.Fs.touch(spark, s"$idx/_merges/m2/signatures.done")
    val ex = intercept[IllegalArgumentException] {
      DedupIndex.merge(spark, idx, delta, mergeId = Some("m2"))
    }
    assert(ex.getMessage.contains("tombstoned"), ex.getMessage)
  }

  test("fence from a non-holding thread neither renews nor aborts another thread's lease") {
    val idx = Files.createTempDirectory("fencefgn").toString
    val leaseFile = s"$idx/_maintenance/_lease"
    val started = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    @volatile var holderFailed: Option[Throwable] = None
    // TTL 0: the holder's lease is expired the moment it is written, so
    // a fence that DID act would renew (no successor) or abort (with
    // one) — the two misbehaviors a foreign thread must not produce
    spark.conf.set("spark.graft.index.leaseMs", "0")
    val holder = new Thread(() =>
      try IndexMaintenance.withLease(spark, idx) {
        started.countDown(); release.await()
      } catch { case t: Throwable => holderFailed = Some(t); started.countDown() })
    holder.start()
    started.await()
    try {
      assert(holderFailed.isEmpty, s"holder thread failed: $holderFailed")
      val before = graft.util.Fs.readString(spark, leaseFile)
      // a thread that holds nothing calls fence (a spec-level direct
      // call to swap mechanics): it must NOT heartbeat-renew the
      // holder's expired lease on its behalf
      IndexMaintenance.fence(spark, idx)
      assert(graft.util.Fs.readString(spark, leaseFile) == before,
        "a foreign thread's fence renewed the holder's lease")
      // nor abort against a successor it never raced: with a foreign
      // frame present, fence must behave like the no-frame case
      graft.util.Fs.writeString(spark, leaseFile,
        s"owner=successor-driver/thread-9\nexpires=${System.currentTimeMillis() + 3600000L}")
      IndexMaintenance.fence(spark, idx) // must not throw
      assert(graft.util.Fs.readString(spark, leaseFile)
        .contains("successor-driver"), "foreign fence touched the lease")
    } finally {
      spark.conf.unset("spark.graft.index.leaseMs")
      release.countDown(); holder.join()
    }
  }

  test("an overrun release with no successor claims by rename, deletes its own lease, and leaves no claim litter") {
    val idx = Files.createTempDirectory("leaseclaim").toString
    // TTL 0 forces the overrun-release path (the live fast path never
    // reads); on this rename-capable store it must go through the
    // claim-by-rename protocol and still fully clean up after itself
    spark.conf.set("spark.graft.index.leaseMs", "0")
    try IndexMaintenance.withLease(spark, idx) { () }
    finally spark.conf.unset("spark.graft.index.leaseMs")
    val files = Option(new java.io.File(s"$idx/_maintenance").list())
      .getOrElse(Array.empty[String])
    assert(!files.exists(_.startsWith("_lease")),
      s"overrun release left lease litter: ${files.mkString(",")}")
  }

  test("the takeover probe beat honors spark.graft.index.leaseProbeMs (a slow store's renewal is not falsely taken over)") {
    val dir = Files.createTempDirectory("leaseprobe").toString
    val lease = s"$dir/_maintenance/_lease"
    // first read sees a TORN lease; the stand-in holder's renewal lands
    // ~150ms later — PAST the default 100ms beat (a small-file write
    // stalling on a slow store), but inside the widened 600ms one
    graft.util.Fs.writeString(spark, lease,
      "owner=live-holder/thread-3\nexpires=")
    spark.conf.set("spark.graft.index.leaseProbeMs", "600")
    val renewer = new Thread(() => {
      Thread.sleep(150L)
      graft.util.Fs.writeString(spark, lease,
        s"owner=live-holder/thread-3\nexpires=${System.currentTimeMillis() + 3600000L}")
    })
    renewer.start()
    try {
      val ex = intercept[IllegalArgumentException] {
        IndexMaintenance.withLease(spark, dir) {
          fail("contender acquired over a slow live renewal inside the widened beat")
        }
      }
      assert(ex.getMessage.contains("lease"), ex.getMessage)
      assert(graft.util.Fs.readString(spark, lease).contains("live-holder"),
        "the contender clobbered the slow holder's lease")
    } finally {
      renewer.join()
      spark.conf.unset("spark.graft.index.leaseProbeMs")
    }
  }

  test("a merge's per-stage appends are fenced: a taken-over holder aborts before landing rows") {
    val dir = Files.createTempDirectory("mergefence").toString
    val idx = s"$dir/idx"
    DedupIndex.build(corpus.where($"doc_id" % 3 =!= 2), idx)
    val delta = corpus.where($"doc_id" % 3 === 2)
    val sigsBefore = spark.read.parquet(s"$idx/signatures").count()
    val pairsBefore = spark.read.parquet(s"$idx/pairs").count()
    val leaseFile = s"$idx/_maintenance/_lease"
    spark.conf.set("spark.graft.index.leaseMs", "0")
    try {
      val ex = intercept[IllegalStateException] {
        IndexMaintenance.withLease(spark, idx) {
          // a successor legitimately takes over the expired lease while
          // this (overrunning) pass is still working; the pass then
          // merges a delta — re-entrant on the same thread, so the
          // merge runs inside the taken-over frame and its first
          // per-stage fence must abort BEFORE any append lands
          graft.util.Fs.writeString(spark, leaseFile,
            s"owner=successor-driver/thread-9\nexpires=${System.currentTimeMillis() + 3600000L}")
          DedupIndex.merge(spark, idx, delta)
        }
      }
      assert(ex.getMessage.contains("lease"), ex.getMessage)
    } finally spark.conf.unset("spark.graft.index.leaseMs")
    assert(spark.read.parquet(s"$idx/signatures").count() == sigsBefore,
      "the fenced merge still appended signature rows")
    assert(spark.read.parquet(s"$idx/pairs").count() == pairsBefore,
      "the fenced merge still appended pair rows")
    assert(graft.util.Fs.readString(spark, leaseFile)
      .contains("successor-driver"), "the successor's lease was clobbered")
  }
}
