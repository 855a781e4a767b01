package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streaming corpus fold must admit each document exactly once —
  * across batches, across casing/punct variants, and across replays.
  */
class DocStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming ingest folds batches into a deduplicated corpus") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("docstream").toString
    val input = MemoryStream[(Long, String)]
    val q = DocStream.ingest(
      input.toDF().toDF("doc_id", "text"),
      s"$dir/corpus", s"$dir/ckpt")
    try {
      // batch 0: two originals + an in-batch exact copy of A
      input.addData((1L, "alpha document one"), (2L, "beta document two"),
        (3L, "alpha document one"))
      q.processAllAvailable()
      // batch 1: exact copy of A (cross-batch), case/punct variant of B,
      // and one genuinely new doc
      input.addData((4L, "alpha document one"), (5L, "Beta DOCUMENT two!!"),
        (6L, "gamma document three"))
      q.processAllAvailable()
    } finally q.stop()
    val corpus = DocStream.corpus(spark, s"$dir/corpus")
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
    assert(corpus.map(_._1).toSeq == Seq(1L, 2L, 6L),
      s"corpus ids ${corpus.map(_._1).toSeq} != Seq(1, 2, 6)")
  }

  test("near-dup probe rejects a small edit of a held document, reading only matching bp= partitions") {
    val dir = Files.createTempDirectory("docneardup").toString
    val base = "the quick brown fox jumps over the lazy dog while seventeen " +
      "green turtles march slowly across the ancient stone bridge carrying " +
      "baskets of ripe yellow mangoes toward the bustling village market " +
      "where merchants trade spices silk and copper pots"
    // one in-place WORD edit: not an exact dup, not a canonicalization
    // dup (the changed letter survives lower/strip-punct), but >97% of
    // the character-4-gram shingles are shared, so the MinHash banding
    // must still bucket the pair somewhere
    val variant = base.replace("copper pots", "copper pans")
    val b0 = Seq((1L, base), (2L, "an unrelated second document about sailing boats"))
      .toDF("doc_id", "text")
    val b1 = Seq((3L, variant), (4L, "a genuinely novel third document about mountain weather"))
      .toDF("doc_id", "text")
    // precondition, not an assumption: the pair really collides in >=1 band
    val shared = graft.llm.DedupIndex.bandsOf(Seq((1L, base)).toDF("doc_id", "text"))
      .select($"band", $"bkey")
      .join(graft.llm.DedupIndex.bandsOf(Seq((3L, variant)).toDF("doc_id", "text"))
        .select($"band", $"bkey"), Seq("band", "bkey"))
      .count()
    assert(shared >= 1, "fixture pair does not band-collide; pick a closer variant")

    val idx = Some(s"$dir/idx")
    DocStream.ingestBatch(b0, s"$dir/corpus", 0L, idx)
    DocStream.ingestBatch(b1, s"$dir/corpus", 1L, idx)
    val ids = DocStream.corpus(spark, s"$dir/corpus")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 4L),
      s"near-dup doc 3 should be rejected, novel doc 4 kept: got $ids")

    // replay of batch 1 with the index on: still a no-op (its own band
    // partition is excluded from the probe, its own files rewritten)
    DocStream.ingestBatch(b1, s"$dir/corpus", 1L, idx)
    val afterReplay = DocStream.corpus(spark, s"$dir/corpus")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(afterReplay == Seq(1L, 2L, 4L), s"replay corrupted the corpus: $afterReplay")

    // the probe prunes the corpus-bands scan to the bp= prefixes the
    // batch hashes into — the scan's PartitionFilters must carry the
    // IN list over bp, not read all 16 prefix directories
    val held = spark.read.parquet(s"$dir/idx/bands").where($"batch_id" =!= 9L)
    val probePlan = graft.llm.DedupIndex
      .probeAgainst(held, b1.select($"doc_id", $"text"))
      .queryExecution.executedPlan.toString
    val bandScanFilters = probePlan.linesIterator
      .filter(l => l.contains("PartitionFilters") && l.contains("/bands"))
      .toList
    assert(bandScanFilters.exists(l => l.contains("bp#") && l.contains(" IN ")),
      s"bands scan is not partition-pruned on bp:\n${bandScanFilters.mkString("\n").take(2000)}")
  }

  test("streaming ingest with the near-dup index rejects edits across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("docstreamidx").toString
    val base = "the quick brown fox jumps over the lazy dog while seventeen " +
      "green turtles march slowly across the ancient stone bridge carrying " +
      "baskets of ripe yellow mangoes toward the bustling village market " +
      "where merchants trade spices silk and copper pots"
    val input = MemoryStream[(Long, String)]
    val q = DocStream.ingest(
      input.toDF().toDF("doc_id", "text"),
      s"$dir/corpus", s"$dir/ckpt", Some(s"$dir/idx"))
    try {
      input.addData((1L, base), (2L, "an unrelated second document about sailing boats"))
      q.processAllAvailable()
      input.addData(
        (3L, base.replace("copper pots", "copper pans")), // near-dup of doc 1
        (4L, "a genuinely novel third document about mountain weather"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = DocStream.corpus(spark, s"$dir/corpus")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 4L),
      s"streaming near-dup rejection failed: got $ids")
  }

  test("post-stream index serves every artifact identically to a rebuild over the surviving corpus") {
    val dir = Files.createTempDirectory("docfullidx").toString
    val base = "the quick brown fox jumps over the lazy dog while seventeen " +
      "green turtles march slowly across the ancient stone bridge carrying " +
      "baskets of ripe yellow mangoes toward the bustling village market " +
      "where merchants trade spices silk and copper pots"
    // docs 1+2 are near-dups arriving in the SAME batch: both are kept
    // (only exact/canonical dups are in-batch-rejected), so the streamed
    // pairs artifact must carry their band collision. Doc 4 is a
    // near-dup of HELD doc 1 and is rejected.
    val b0 = Seq((1L, base), (2L, base.replace("copper pots", "silver pots")),
      (3L, "an unrelated second document about sailing boats"))
      .toDF("doc_id", "text")
    val b1 = Seq((4L, base.replace("copper pots", "copper pans")),
      (5L, "a genuinely novel third document about mountain weather"))
      .toDF("doc_id", "text")
    val idx = Some(s"$dir/idx")
    DocStream.ingestBatch(b0, s"$dir/corpus", 0L, idx)
    DocStream.ingestBatch(b1, s"$dir/corpus", 1L, idx)
    val surviving = DocStream.corpus(spark, s"$dir/corpus")
      .select($"doc_id", $"text")
    assert(surviving.select($"doc_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L, 5L), "unexpected surviving corpus")
    graft.llm.DedupIndex.build(surviving, s"$dir/rebuild")

    def pairsOf(p: String) = spark.read.parquet(s"$p/pairs")
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val streamed = pairsOf(s"$dir/idx")
    assert(streamed == pairsOf(s"$dir/rebuild"),
      s"streamed pairs $streamed diverge from rebuild")
    assert(streamed.contains((1L, 2L)), "in-batch near-dup pair missing")

    val sigCols = graft.llm.DedupIndex.signatures(spark, s"$dir/rebuild")
      .columns.sorted.map(col)
    def sigsOf(p: String) = spark.read.parquet(s"$p/signatures")
      .select(sigCols.toIndexedSeq: _*).orderBy("doc_id").collect().toSeq
    assert(sigsOf(s"$dir/idx") == sigsOf(s"$dir/rebuild"),
      "streamed signatures diverge from rebuild")

    def bandsOf(p: String) = graft.llm.DedupIndex.bands(spark, p)
      .as[(Long, Long, String)].collect().toSet
    assert(bandsOf(s"$dir/idx") == bandsOf(s"$dir/rebuild"),
      "streamed bands diverge from rebuild")

    def shinglesOf(p: String) = graft.llm.DedupIndex.shingleSets(spark, p)
      .select($"doc_id", $"sh_set").as[(Long, Seq[String])].collect()
      .map { case (id, ss) => (id, ss.toSet) }.toMap
    assert(shinglesOf(s"$dir/idx") == shinglesOf(s"$dir/rebuild"),
      "streamed shingle sets diverge from rebuild")

    // replaying the last batch leaves every artifact unchanged
    DocStream.ingestBatch(b1, s"$dir/corpus", 1L, idx)
    assert(pairsOf(s"$dir/idx") == streamed, "replay changed the pairs artifact")
    assert(sigsOf(s"$dir/idx") == sigsOf(s"$dir/rebuild"),
      "replay changed the signatures artifact")
  }

  test("drift gate rejects a drifted batch whole; clean batches and replays unaffected") {
    val dir = Files.createTempDirectory("docstream-gate").toString
    val corpusDir = s"$dir/corpus"
    val idxDir = s"$dir/idx"
    def doc(id: Long, words: Int, salt: String) =
      (id, (0 until words).map(w => s"w$w$salt${id}").mkString(" "))
    // reference era: ~10-token documents (bucket 0)
    val b0 = spark.createDataset(Seq(doc(1, 10, "a"), doc(2, 11, "b"),
      doc(3, 12, "c"), doc(4, 10, "d"), doc(5, 11, "e"))).toDF("doc_id", "text")
    // a clean batch from the same distribution
    val b1 = spark.createDataset(Seq(doc(6, 10, "f"), doc(7, 12, "g"),
      doc(8, 11, "h"))).toDF("doc_id", "text")
    // a drifted batch: every document 40+ tokens (bucket 2) — the spam
    // flood / broken-crawler shape the gate exists to stop
    val b2 = spark.createDataset(Seq(doc(9, 40, "i"), doc(10, 44, "j"),
      doc(11, 42, "k"))).toDF("doc_id", "text")

    DocStream.ingestBatch(b0, corpusDir, 0L, Some(idxDir), driftGate = true)
    DocStream.ingestBatch(b1, corpusDir, 1L, Some(idxDir), driftGate = true)
    DocStream.ingestBatch(b2, corpusDir, 2L, Some(idxDir), driftGate = true)

    def corpusIds() = DocStream.corpus(spark, corpusDir)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(corpusIds() == (1L to 8L).toSeq,
      s"gate verdicts wrong: corpus holds ${corpusIds()}")
    // the rejected batch grew NEITHER the corpus nor the dedup index
    val sigIds = spark.read.parquet(s"$idxDir/signatures")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(sigIds == (1L to 8L).toSeq, s"index grew on a gated batch: $sigIds")
    // gate log: batch 0 ungated (no reference), batch 1 clean, batch 2 rejected
    val log = DocStream.gateLog(spark, corpusDir)
      .select($"batch_id".cast("long"), $"rejected")
      .as[(Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(log == Seq((1L, false), (2L, true)), s"gate log $log")
    // replay of the rejected batch: same reference (its own empty
    // partition is excluded), same verdict, corpus unchanged
    DocStream.ingestBatch(b2, corpusDir, 2L, Some(idxDir), driftGate = true)
    assert(corpusIds() == (1L to 8L).toSeq, "replayed gated batch mutated corpus")
    // replay of a HELD batch under the gate: still a no-op, still held
    DocStream.ingestBatch(b1, corpusDir, 1L, Some(idxDir), driftGate = true)
    assert(corpusIds() == (1L to 8L).toSeq, "replayed clean batch mutated corpus")
  }

  test("drift gate with an EMPTY reference: a batch-0 crash replay is a no-op, not a wedge") {
    val dir = Files.createTempDirectory("docstream-gate0").toString
    val b0 = Seq((1L, "first doc here"), (2L, "second doc here"))
      .toDF("doc_id", "text")
    DocStream.ingestBatch(b0, s"$dir/corpus", 0L, driftGate = true)
    // the crash-recovery case: the corpus directory now EXISTS but the
    // reference (everything except batch 0's own partition) is zero
    // rows — the gate must treat that like the missing-dir first-batch
    // case, not divide by a zero reference total
    DocStream.ingestBatch(b0, s"$dir/corpus", 0L, driftGate = true)
    val ids = DocStream.corpus(spark, s"$dir/corpus")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L), s"batch-0 replay under the gate broke: $ids")
  }

  test("a replayed batch is a no-op: no duplicates, no data loss") {
    val dir = Files.createTempDirectory("docreplay").toString
    val b0 = Seq((1L, "first doc"), (2L, "second doc")).toDF("doc_id", "text")
    val b1 = Seq((3L, "third doc"), (4L, "first doc")).toDF("doc_id", "text")
    DocStream.ingestBatch(b0, s"$dir/corpus", 0L)
    DocStream.ingestBatch(b1, s"$dir/corpus", 1L)
    val afterFirst = DocStream.corpus(spark, s"$dir/corpus")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(afterFirst == Seq(1L, 2L, 3L), s"unexpected corpus $afterFirst")
    // failure-recovery replay of batch 1: must rewrite the same content,
    // not reject-its-own-output-and-overwrite-empty (the data-loss trap)
    DocStream.ingestBatch(b1, s"$dir/corpus", 1L)
    val afterReplay = DocStream.corpus(spark, s"$dir/corpus")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(afterReplay == Seq(1L, 2L, 3L),
      s"replay corrupted the corpus: $afterReplay")
  }

  test("compactCorpus bounds file count, keeps content + gate log, and replays stay no-ops") {
    val dir = Files.createTempDirectory("doccompact").toString
    val corpusDir = s"$dir/corpus"
    val b0 = Seq((1L, "alpha doc one"), (2L, "beta doc two")).toDF("doc_id", "text")
    val b1 = Seq((3L, "gamma doc three"), (4L, "alpha doc one")).toDF("doc_id", "text")
    val b2 = Seq((5L, "delta doc four"), (6L, "omega doc five")).toDF("doc_id", "text")
    DocStream.ingestBatch(b0, corpusDir, 0L, driftGate = true)
    DocStream.ingestBatch(b1, corpusDir, 1L, driftGate = true)
    DocStream.ingestBatch(b2, corpusDir, 2L, driftGate = true)
    def ids() = DocStream.corpus(spark, corpusDir)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    def parquetFiles(p: String) = graft.util.Fs.listFiles(spark, p)
      .count(_.endsWith(".parquet"))
    assert(ids() == Seq(1L, 2L, 3L, 5L, 6L), s"pre-compact corpus ${ids()}")
    val gateRows = DocStream.gateLog(spark, corpusDir).count()
    assert(gateRows == 2L, "batches 1 and 2 should each have a gate verdict")
    val before = parquetFiles(s"$corpusDir/docs")

    DocStream.compactCorpus(spark, corpusDir)
    assert(ids() == Seq(1L, 2L, 3L, 5L, 6L), "compaction changed the corpus")
    assert(DocStream.gateLog(spark, corpusDir).count() == gateRows,
      "compaction destroyed the gate log")
    // one file per batch_id= replay partition afterwards
    val after = parquetFiles(graft.util.Fs.stagePath(spark, corpusDir, "docs"))
    assert(after <= 3 && after < before,
      s"compaction did not bound the file count: $before -> $after")

    // replay stability survives the rewrite: the replayed batch still
    // excludes its own partition and overwrites only its own files
    DocStream.ingestBatch(b1, corpusDir, 1L, driftGate = true)
    assert(ids() == Seq(1L, 2L, 3L, 5L, 6L), "post-compact replay mutated corpus")
    // and the fold keeps growing normally
    DocStream.ingestBatch(
      Seq((7L, "epsilon doc six"), (8L, "beta doc two")).toDF("doc_id", "text"),
      corpusDir, 3L, driftGate = true)
    assert(ids() == Seq(1L, 2L, 3L, 5L, 6L, 7L), "post-compact ingest broken")
  }

  test("compactCorpus migrates a legacy corpus (batch partitions at the top level)") {
    val dir = Files.createTempDirectory("doclegacy").toString
    val corpusDir = s"$dir/corpus"
    // the pre-stage layout, written the way the old fold wrote it:
    // keyed survivor rows directly under corpusDir/batch_id=N
    def keyed(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("h", md5($"text"))
      .withColumn("norm_key", md5(trim(regexp_replace(
        regexp_replace(lower($"text"), "[^a-z0-9 ]", ""), " +", " "))))
    keyed(Seq((1L, "legacy doc one"), (2L, "legacy doc two"))
      .toDF("doc_id", "text")).write.parquet(s"$corpusDir/batch_id=0")
    def ids() = DocStream.corpus(spark, corpusDir)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(ids() == Seq(1L, 2L), "legacy layout unreadable through corpus()")

    // the fold keeps appending IN the legacy layout (no silent split)
    DocStream.ingestBatch(
      Seq((3L, "legacy doc three"), (4L, "legacy doc one"))
        .toDF("doc_id", "text"), corpusDir, 1L)
    assert(ids() == Seq(1L, 2L, 3L), s"legacy-layout ingest broken: ${ids()}")
    assert(!graft.util.Fs.exists(spark, s"$corpusDir/docs"),
      "ingest into a legacy corpus must not fork a second layout")

    // migration + compaction: batch partitions move under docs/, the
    // top level is clean, content and replay discipline are preserved
    DocStream.compactCorpus(spark, corpusDir)
    assert(ids() == Seq(1L, 2L, 3L), "migration changed the corpus")
    assert(graft.util.Fs.listDirNames(spark, corpusDir)
      .forall(!_.startsWith("batch_id=")),
      "legacy batch partitions left at the corpus top level")
    assert(graft.util.Fs.listDirNames(spark,
        graft.util.Fs.stagePath(spark, corpusDir, "docs"))
      .count(_.startsWith("batch_id=")) == 2,
      "migrated stage lost a batch partition")
    DocStream.ingestBatch(
      Seq((5L, "legacy doc five"), (6L, "legacy doc two"))
        .toDF("doc_id", "text"), corpusDir, 2L)
    assert(ids() == Seq(1L, 2L, 3L, 5L), "post-migration ingest broken")
  }

  test("a crashed mid-migration (split layout) fails reads and folds loudly; the re-run converges") {
    val dir = Files.createTempDirectory("docsplit").toString
    val corpusDir = s"$dir/corpus"
    def keyed(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("h", md5($"text"))
      .withColumn("norm_key", md5(trim(regexp_replace(
        regexp_replace(lower($"text"), "[^a-z0-9 ]", ""), " +", " "))))
    keyed(Seq((1L, "split doc one")).toDF("doc_id", "text"))
      .write.parquet(s"$corpusDir/batch_id=0")
    keyed(Seq((2L, "split doc two")).toDF("doc_id", "text"))
      .write.parquet(s"$corpusDir/batch_id=1")
    // simulate the crash window: one partition migrated, one not —
    // serving or folding against only the migrated half would admit a
    // duplicate of doc 2 and read partial corpora
    graft.util.Fs.touch(spark, s"$corpusDir/docs/_MIGRATED")
    assert(graft.util.Fs.rename(spark, s"$corpusDir/batch_id=0",
      s"$corpusDir/docs/batch_id=0"))
    intercept[IllegalArgumentException](
      DocStream.corpus(spark, corpusDir).count())
    intercept[IllegalArgumentException](
      DocStream.ingestBatch(
        Seq((3L, "split doc two")).toDF("doc_id", "text"), corpusDir, 2L))
    // the documented recovery: re-running the migration converges
    DocStream.compactCorpus(spark, corpusDir)
    val ids = DocStream.corpus(spark, corpusDir)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L), s"migration re-run lost documents: $ids")
    // and the duplicate that would have slipped through is rejected
    DocStream.ingestBatch(
      Seq((3L, "split doc two")).toDF("doc_id", "text"), corpusDir, 2L)
    val after = DocStream.corpus(spark, corpusDir)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(after == Seq(1L, 2L), s"post-recovery fold admitted a dup: $after")
  }

  test("deleteDocs tombstones the corpus and its index; content re-admits, ids stay taken; compact folds") {
    val dir = Files.createTempDirectory("docstream").toString
    val (corpusDir, idxDir) = (s"$dir/corpus", s"$dir/idx")
    DocStream.ingestBatch(
      Seq((1L, "alpha takedown target document"),
        (2L, "beta kept document two here"))
        .toDF("doc_id", "text"), corpusDir, 0L, Some(idxDir))
    DocStream.ingestBatch(
      Seq((3L, "gamma kept document three here")).toDF("doc_id", "text"),
      corpusDir, 1L, Some(idxDir))
    DocStream.deleteDocs(spark, corpusDir, Seq(1L).toDF("doc_id"),
      Some(idxDir))
    // served corpus and index exclude the deleted doc immediately
    assert(DocStream.corpus(spark, corpusDir)
      .select($"doc_id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    assert(graft.llm.DedupIndex.signatures(spark, idxDir)
      .select($"doc_id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    // the deleted doc's exact text re-admits under a NEW id (its hash
    // and bands no longer block), a re-used deleted ID stays taken, and
    // a near-dup edit of the deleted doc also re-admits
    DocStream.ingestBatch(
      Seq((4L, "alpha takedown target document"),
        (1L, "unrelated fresh text entirely new"),
        (5L, "alpha takedown target documents")).toDF("doc_id", "text"),
      corpusDir, 2L, Some(idxDir))
    val ids = DocStream.corpus(spark, corpusDir)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(2L, 3L, 4L, 5L),
      s"expected re-admits 4,5 and id 1 still taken; got $ids")
    // the fold RETIRES the tombstones on both artifacts (kept one more
    // maintenance cycle; the raw stages are already clean)
    DocStream.compactCorpus(spark, corpusDir)
    graft.llm.DedupIndex.compact(spark, idxDir)
    assert(Option(new java.io.File(s"$corpusDir/_tombstones").listFiles())
      .exists(_.exists(_.getName.startsWith("_FOLDED"))))
    assert(Option(new java.io.File(s"$idxDir/_tombstones").listFiles())
      .exists(_.exists(_.getName.startsWith("_FOLDED"))))
    assert(spark.read.parquet(s"$corpusDir/docs").select("doc_id")
      .as[Long].collect().sorted.toSeq == Seq(2L, 3L, 4L, 5L),
      "fold left the deleted doc in the raw corpus stage")
    assert(spark.read.parquet(s"$idxDir/signatures").where($"doc_id" === 1L)
      .count() == 0L, "fold left the deleted doc in the raw index")
    // retired-but-not-GCed tombstones (on EITHER artifact) keep the id
    // taken — the gate consults both
    DocStream.ingestBatch(
      Seq((1L, "unrelated fresh text entirely new")).toDF("doc_id", "text"),
      corpusDir, 3L, Some(idxDir))
    assert(DocStream.corpus(spark, corpusDir).where($"doc_id" === 1L)
      .count() == 0L, "retired-but-live tombstone did not keep the id taken")
    // the NEXT maintenance entries GC the retired sets; the id is free
    DocStream.compactCorpus(spark, corpusDir)
    graft.llm.DedupIndex.compact(spark, idxDir)
    assert(!new java.io.File(s"$corpusDir/_tombstones").exists())
    assert(!new java.io.File(s"$idxDir/_tombstones").exists())
    DocStream.ingestBatch(
      Seq((1L, "unrelated fresh text entirely new")).toDF("doc_id", "text"),
      corpusDir, 4L, Some(idxDir))
    assert(DocStream.corpus(spark, corpusDir).where($"doc_id" === 1L)
      .count() == 1L, "post-GC re-use of the retired id failed")
  }

  test("corpusAsOfBatch: batch-axis snapshots, compaction-surviving, takedown-filtered, partition-pruned") {
    val dir = Files.createTempDirectory("docasof").toString
    val corpusDir = s"$dir/corpus"
    DocStream.ingestBatch(
      Seq((1L, "alpha document one"), (2L, "beta document two"))
        .toDF("doc_id", "text"), corpusDir, 0L)
    DocStream.ingestBatch(
      Seq((3L, "gamma document three"), (4L, "alpha document one"))
        .toDF("doc_id", "text"), corpusDir, 1L)
    DocStream.ingestBatch(
      Seq((5L, "delta document four")).toDF("doc_id", "text"), corpusDir, 2L)
    def ids(n: Long) = DocStream.corpusAsOfBatch(spark, corpusDir, n)
      .select($"doc_id").as[Long].collect().toSeq.sorted
    assert(ids(0L) == Seq(1L, 2L), s"asOfBatch(0) = ${ids(0L)}")
    assert(ids(1L) == Seq(1L, 2L, 3L), "asOfBatch(1) must exclude batch 2 " +
      "and the cross-batch duplicate the fold rejected")
    assert(ids(2L) == Seq(1L, 2L, 3L, 5L), s"asOfBatch(2) = ${ids(2L)}")
    // the partition filter reaches the scan: only batch_id <= n
    // directories are planned
    val plan = DocStream.corpusAsOfBatch(spark, corpusDir, 0L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("batch_id"),
      s"the batch_id <= n filter did not reach the scan as a partition " +
        s"filter:\n$plan")
    // unlike generation history, the batch axis SURVIVES compaction
    // (replay partitions are preserved by the rewrite)
    DocStream.compactCorpus(spark, corpusDir)
    assert(ids(1L) == Seq(1L, 2L, 3L),
      "compaction destroyed the batch-axis history")
    // a takedown beats time travel: current tombstones filter every
    // snapshot, including ones taken 'before' the delete
    DocStream.deleteDocs(spark, corpusDir, Seq(2L).toDF("doc_id"))
    assert(ids(0L) == Seq(1L),
      "a deleted doc was served from a batch-axis snapshot")
  }
}
