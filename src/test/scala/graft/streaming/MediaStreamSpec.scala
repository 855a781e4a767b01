package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.media.{MediaOps, MediaQueries}

/** The streaming media-fingerprint fold: per-batch aHash ingest, exact
  * and perceptual rejection against the held index, replay idempotence,
  * and consumer parity with a batch fingerprint build.
  */
class MediaStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def assets = MediaOps.mediaTable(spark, sf)
    .select($"media_id", $"payload")

  private def fpOf(df: org.apache.spark.sql.DataFrame) =
    df.select($"media_id", MediaQueries.aHash16($"payload").as("fp"))

  test("pointer-protocol compact of the streamed layout: replay writes follow the pointer") {
    val dir = Files.createTempDirectory("mediaptr").toString
    val b0 = assets.where($"media_id".between(10, 29))
    val b1 = assets.where($"media_id".between(30, 49))
    MediaStream.ingestBatch(b0, dir, 0L)
    MediaStream.ingestBatch(b1, dir, 1L)
    val want = MediaStream.fingerprints(spark, dir)
      .select($"media_id").as[Long].collect().toSet

    spark.conf.set("spark.graft.index.swapMode", "pointer")
    try {
      MediaStream.compactIndex(spark, dir)
      for (stage <- Seq("fps", "bands")) {
        assert(graft.util.Fs.isFile(spark, s"$dir/_ptr/$stage"),
          s"$stage: no pointer published")
        // the superseded bare copy is RETAINED for in-flight readers
        // (retainGens); later maintenance entries GC it
        assert(graft.util.Fs.exists(spark, s"$dir/$stage"),
          s"$stage: superseded bare directory dropped at flip time")
      }
      assert(MediaStream.fingerprints(spark, dir)
        .select($"media_id").as[Long].collect().toSet == want,
        "pointer-mode compact changed the held set")
      // the batch_id= replay partitions survived inside the generation
      val batchDirs = graft.util.Fs
        .listDirNames(spark, graft.util.Fs.stagePath(spark, dir, "fps"))
        .filter(_.startsWith("batch_id=")).sorted
      assert(batchDirs == Seq("batch_id=0", "batch_id=1"),
        s"replay partitions lost: $batchDirs")

      // a crash-replay of batch 1 must overwrite its partition INSIDE
      // the pointed generation — a write to the (retained, stale) bare
      // path would fork the index into two layouts
      val bareBefore = graft.util.Fs.listFiles(spark, s"$dir/fps").toSet
      MediaStream.ingestBatch(b1, dir, 1L)
      assert(graft.util.Fs.listFiles(spark, s"$dir/fps").toSet == bareBefore,
        "replay wrote into the retained bare copy instead of the " +
          "pointed generation")
      assert(MediaStream.fingerprints(spark, dir)
        .select($"media_id").as[Long].collect().toSet == want,
        "post-compact replay changed the held set")
      // and the fold still dedups against the pointed layout
      val copy = assets.where($"media_id" === 15)
        .select(lit(900001L).as("media_id"), $"payload")
      MediaStream.ingestBatch(copy, dir, 2L)
      assert(MediaStream.fingerprints(spark, dir)
        .select($"media_id").as[Long].collect().toSet == want,
        "exact-dup gate missed against the pointed layout")
    } finally spark.conf.unset("spark.graft.index.swapMode")
  }

  test("ingest rejects exact copies and perceptual near-dups of held assets") {
    val dir = Files.createTempDirectory("mediastream").toString
    val b0 = assets.where($"media_id".between(10, 29))
    MediaStream.ingestBatch(b0, dir, 0L, rejectHammingLe = Some(1))

    // an exact copy of held asset 15 under a fresh id (exact gate) ...
    val copy = assets.where($"media_id" === 15)
      .select(lit(900001L).as("media_id"), $"payload")
    // ... and a one-byte EDIT of held asset 16 (md5 differs, so only the
    // perceptual gate can catch it). Self-validate the premise: the
    // edited payload's aHash must be within hamming 1 of the original.
    val edited = assets.where($"media_id" === 16)
      .select(lit(900002L).as("media_id"),
        concat(lit(Array[Byte]('Z'.toByte)),
          expr("substring(payload, 2, length(payload) - 1)")).as("payload"))
    val Seq(fpOrig) = fpOf(assets.where($"media_id" === 16))
      .select($"fp").as[Long].collect().toSeq
    val Seq(fpEdit) = fpOf(edited).select($"fp").as[Long].collect().toSeq
    assert(java.lang.Long.bitCount(fpOrig ^ fpEdit) <= 1,
      s"test premise broken: edit moved the aHash by ${java.lang.Long.bitCount(fpOrig ^ fpEdit)} bits")

    val novel = assets.where($"media_id".between(30, 39))
    MediaStream.ingestBatch(novel.unionByName(copy).unionByName(edited),
      dir, 1L, rejectHammingLe = Some(1))

    val heldIds = MediaStream.fingerprints(spark, dir)
      .select($"media_id").as[Long].collect().sorted.toSeq
    assert(heldIds == ((10L to 39L).toSeq),
      s"expected survivors 10..39 (copy+edit rejected), got $heldIds")
  }

  test("payload-size drift gate rejects a padded flood; clean batches and replays pass") {
    val dir = Files.createTempDirectory("mediagate").toString
    val b0 = assets.where($"media_id".between(10, 209))
    val b1 = assets.where($"media_id".between(210, 309))
    // the drifted batch: every payload padded with a 300-byte tail —
    // the encoder-change / padded-spam shape that shifts the size
    // histogram long before any content check fires
    val b2 = assets.where($"media_id".between(310, 409))
      .select($"media_id",
        concat($"payload", lit(Array.fill(300)('x'.toByte))).as("payload"))
    MediaStream.ingestBatch(b0, dir, 0L, driftGate = true)
    MediaStream.ingestBatch(b1, dir, 1L, driftGate = true)
    MediaStream.ingestBatch(b2, dir, 2L, driftGate = true)

    def heldIds() = MediaStream.fingerprints(spark, dir)
      .select($"media_id").as[Long].collect().sorted.toSeq
    assert(heldIds() == (10L to 309L).toSeq,
      s"gate verdicts wrong: index holds ${heldIds().size} ids")
    val log = MediaStream.gateLog(spark, dir)
      .select($"batch_id".cast("long"), $"rejected")
      .as[(Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(log == Seq((1L, false), (2L, true)), s"gate log $log")
    // replays: rejected stays rejected, held stays held, index unchanged
    MediaStream.ingestBatch(b2, dir, 2L, driftGate = true)
    assert(heldIds() == (10L to 309L).toSeq, "replayed gated batch grew the index")
    MediaStream.ingestBatch(b1, dir, 1L, driftGate = true)
    assert(heldIds() == (10L to 309L).toSeq, "replayed clean batch mutated the index")
    // an EMPTY micro-batch under the gate: ungated, no crash, no growth
    MediaStream.ingestBatch(assets.where(lit(false)), dir, 3L, driftGate = true)
    assert(heldIds() == (10L to 309L).toSeq, "empty gated batch mutated the index")
  }

  test("drift gate on a pre-plen fps index: batch ingests ungated, no unresolved-column failure") {
    val dir = Files.createTempDirectory("mediagateold").toString
    val b0 = assets.where($"media_id".between(10, 109))
    MediaStream.ingestBatch(b0, dir, 0L)
    // simulate an index written BEFORE the size column existed: rewrite
    // the held fps generation without plen (same rows otherwise)
    val legacy = spark.read.parquet(s"$dir/fps/batch_id=0").drop("plen")
    legacy.write.mode("overwrite").parquet(s"$dir/fps_legacy")
    graft.util.Fs.delete(spark, s"$dir/fps/batch_id=0")
    spark.read.parquet(s"$dir/fps_legacy")
      .write.mode("overwrite").parquet(s"$dir/fps/batch_id=0")
    assert(!spark.read.parquet(s"$dir/fps").columns.contains("plen"),
      "fixture failed to strip plen from the held index")
    // gating a new batch against the legacy index must DEGRADE (skip
    // the size gate), not throw: the batch lands and no verdict is
    // logged for it
    val b1 = assets.where($"media_id".between(110, 159))
    MediaStream.ingestBatch(b1, dir, 1L, driftGate = true)
    val heldIds = MediaStream.fingerprints(spark, dir)
      .select($"media_id").as[Long].collect().sorted.toSeq
    assert(heldIds == (10L to 159L).toSeq,
      s"legacy-index gate skip lost rows: ${heldIds.size} ids held")
    assert(!graft.util.Fs.exists(spark, s"$dir/_gate/batch_id=1"),
      "size gate logged a verdict it could not have computed")
  }

  test("post-stream index equals a batch fingerprint build; replay is a no-op") {
    val dir = Files.createTempDirectory("mediastream2").toString
    val b0 = assets.where($"media_id".between(10, 59))
    val b1 = assets.where($"media_id".between(60, 99))
    MediaStream.ingestBatch(b0, dir, 0L)
    MediaStream.ingestBatch(b1, dir, 1L)

    val expected = fpOf(assets.where($"media_id".between(10, 99)))
      .as[(Long, Long)].collect().toMap
    val got = MediaStream.fingerprints(spark, dir)
      .select($"media_id", $"fp").as[(Long, Long)].collect()
    assert(got.length == expected.size, s"${got.length} rows != ${expected.size}")
    got.foreach { case (id, fp) =>
      assert(fp == expected(id), s"asset $id fp $fp != batch ${expected(id)}")
    }

    // pair-mining consumers see the same candidates as a batch build
    val streamedPairs = MediaQueries.hammingPairsOf(
        MediaStream.fingerprints(spark, dir).select($"media_id", $"fp"))
      .as[(Long, Long, Long)].collect().toSet
    val batchPairs = MediaQueries.hammingPairsOf(
        fpOf(assets.where($"media_id".between(10, 99))))
      .as[(Long, Long, Long)].collect().toSet
    assert(streamedPairs == batchPairs,
      s"streamed-index pairs diverge from batch build: ${streamedPairs.diff(batchPairs)} / ${batchPairs.diff(streamedPairs)}")

    // replay of batch 1: byte-identical rewrite, no duplicates
    MediaStream.ingestBatch(b1, dir, 1L)
    assert(MediaStream.fingerprints(spark, dir).count() == expected.size,
      "replay changed the index")

    // between-runs compaction: consumers unchanged, batch_id= replay
    // partitions preserved, per-partition file count collapsed to one
    MediaStream.compactIndex(spark, dir)
    val compacted = MediaStream.fingerprints(spark, dir)
      .select($"media_id", $"fp").as[(Long, Long)].collect()
    assert(compacted.length == expected.size, "compaction changed row count")
    compacted.foreach { case (id, fp) =>
      assert(fp == expected(id), s"compaction drifted asset $id")
    }
    assert(MediaQueries.hammingPairsOf(
        MediaStream.fingerprints(spark, dir).select($"media_id", $"fp"))
      .as[(Long, Long, Long)].collect().toSet == batchPairs,
      "pair consumers drifted under compaction")
    val fpDirs = new java.io.File(s"$dir/fps").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
    assert(fpDirs.map(_.getName).sorted.toSeq ==
      Seq("batch_id=0", "batch_id=1"), "fps batch_id= dirs not preserved")
    assert(fpDirs.forall(d => d.listFiles()
        .count(f => f.isFile && f.getName.endsWith(".parquet")) == 1),
      "a fps batch partition holds more than one file after compaction")
    // the preserved layout still honors the fold's replay discipline
    MediaStream.ingestBatch(b1, dir, 1L)
    assert(MediaStream.fingerprints(spark, dir).count() == expected.size,
      "post-compact replay changed the index")
  }

  test("streaming source end-to-end via foreachBatch") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("mediastream3").toString
    val rows = assets.where($"media_id".between(10, 29))
      .as[(Long, Array[Byte])].collect().toSeq
    val input = MemoryStream[(Long, Array[Byte])]
    val q = MediaStream.ingest(
      input.toDF().toDF("media_id", "payload"),
      dir, s"$dir/ckpt", rejectHammingLe = Some(1))
    try {
      input.addData(rows.take(10))
      q.processAllAvailable()
      // second micro-batch re-sends a held payload under a new id
      // alongside genuinely new assets
      input.addData(rows.drop(10) :+ ((900001L, rows.head._2)))
      q.processAllAvailable()
    } finally q.stop()
    val ids = MediaStream.fingerprints(spark, dir)
      .select($"media_id").as[Long].collect().sorted.toSeq
    assert(ids == ((10L to 29L).toSeq), s"streamed index ids $ids")
  }

  test("deleteFromIndex tombstones assets: copies re-admit, ids stay taken, compact folds") {
    val dir = Files.createTempDirectory("mediastream").toString
    MediaStream.ingestBatch(assets.where($"media_id".between(10, 29)),
      dir, 0L, rejectHammingLe = Some(1))
    MediaStream.deleteFromIndex(spark, dir, Seq(15L).toDF("media_id"))
    assert(!MediaStream.fingerprints(spark, dir)
      .select($"media_id").as[Long].collect().contains(15L),
      "deleted asset still served")
    // an exact copy of the DELETED asset under a fresh id now admits
    // (pre-delete the exact gate rejected it — see the ingest spec
    // above), while a re-use of the deleted id stays taken
    val copy = assets.where($"media_id" === 15)
      .select(lit(900001L).as("media_id"), $"payload")
    val reuse = assets.where($"media_id" === 30)
      .select(lit(15L).as("media_id"), $"payload")
    MediaStream.ingestBatch(copy.unionByName(reuse), dir, 1L,
      rejectHammingLe = Some(1))
    val ids = MediaStream.fingerprints(spark, dir)
      .select($"media_id").as[Long].collect().sorted.toSeq
    assert(ids.contains(900001L), "copy of the deleted asset was rejected")
    assert(!ids.contains(15L), "re-used deleted id was admitted")
    // the fold rewrites both stages minus the tombstoned rows and
    // RETIRES the set; the next maintenance entry GCs it
    MediaStream.compactIndex(spark, dir)
    assert(Option(new java.io.File(s"$dir/_tombstones").listFiles())
      .exists(_.exists(_.getName.startsWith("_FOLDED"))),
      "compactIndex did not retire the tombstones")
    assert(spark.read.parquet(s"$dir/fps").where($"media_id" === 15L)
      .count() == 0L, "fold left the deleted asset in fps")
    assert(spark.read.parquet(s"$dir/bands").where($"media_id" === 15L)
      .count() == 0L, "fold left the deleted asset in bands")
    MediaStream.compactIndex(spark, dir)
    assert(!new java.io.File(s"$dir/_tombstones").exists(),
      "second maintenance entry did not GC the retired tombstones")
  }

  test("fingerprintsAsOfBatch: batch-axis snapshots, compaction-surviving, takedown-filtered") {
    val dir = Files.createTempDirectory("mediaasof").toString
    val assets = graft.media.MediaOps.mediaTable(spark, sf)
      .select($"media_id", $"payload")
    MediaStream.ingestBatch(assets.where($"media_id".between(10, 29)), dir, 0L)
    MediaStream.ingestBatch(assets.where($"media_id".between(30, 49)), dir, 1L)
    def ids(n: Long) = MediaStream.fingerprintsAsOfBatch(spark, dir, n)
      .select($"media_id").as[Long].collect().sorted.toSeq
    assert(ids(0L) == (10L to 29L).toSeq, s"asOfBatch(0) = ${ids(0L)}")
    assert(ids(1L) == (10L to 49L).toSeq, s"asOfBatch(1) = ${ids(1L)}")
    // the batch axis survives compaction (replay partitions preserved)
    MediaStream.compactIndex(spark, dir)
    assert(ids(0L) == (10L to 29L).toSeq,
      "compaction destroyed the batch-axis history")
    // a takedown beats time travel: current tombstones filter snapshots
    MediaStream.deleteFromIndex(spark, dir, Seq(15L).toDF("media_id"))
    assert(!ids(0L).contains(15L),
      "a deleted asset was served from a batch-axis snapshot")
  }

  test("fingerprintsAsOf: generation-axis snapshots; post-flip batches stay current-only; bounds and takedowns enforced") {
    val dir = Files.createTempDirectory("mediaasofgen").toString
    val assets = graft.media.MediaOps.mediaTable(spark, sf)
      .select($"media_id", $"payload")
    MediaStream.ingestBatch(assets.where($"media_id".between(10, 29)), dir, 0L)
    // never pointer-flipped: no history exists, and the error says so
    val ex0 = intercept[IllegalArgumentException] {
      MediaStream.fingerprintsAsOf(spark, dir, back = 1).count()
    }
    assert(ex0.getMessage.contains("never"), ex0.getMessage)
    MediaStream.compactIndex(spark, dir, swapMode = Some("pointer"))
    // a post-flip micro-batch appends into the CURRENT generation: the
    // retained one stays exactly the pre-compact content
    MediaStream.ingestBatch(assets.where($"media_id".between(30, 39)), dir, 1L)
    def ids(back: Int) = MediaStream.fingerprintsAsOf(spark, dir, back)
      .select($"media_id").as[Long].collect().sorted.toSeq
    assert(ids(1) == (10L to 29L).toSeq, s"asOf(1) = ${ids(1)}")
    assert(ids(0) == (10L to 39L).toSeq, s"asOf(0) = ${ids(0)}")
    // past what ever existed: loud, with the widening knob named
    val ex1 = intercept[IllegalArgumentException] {
      MediaStream.fingerprintsAsOf(spark, dir, back = 2).count()
    }
    assert(ex1.getMessage.contains("retainGens"), ex1.getMessage)
    // a takedown beats time travel on the generation axis too
    MediaStream.deleteFromIndex(spark, dir, Seq(15L).toDF("media_id"))
    assert(!ids(1).contains(15L),
      "a deleted asset was served from a generation snapshot")
  }
}
