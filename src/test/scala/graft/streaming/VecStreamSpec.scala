package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.VectorIndex

/** The streaming embedding-index fold: frozen-quantizer assignment per
  * micro-batch, id + near-dup rejection against the held lists, replay
  * idempotence, and search over the grown layout.
  */
class VecStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def embs = spark.read.parquet(s"$sf/embeddings.parquet")
    .select($"vec_id", $"embedding")

  test("ingest folds batches into the lists; exact/near dups and held ids are rejected") {
    val dir = Files.createTempDirectory("vecstream").toString
    VectorIndex.trainQuantizer(embs, s"$dir/idx")

    val b0 = embs.where($"vec_id".between(10, 29))
    VecStream.ingestBatch(b0, s"$dir/idx", 0L, dupCosX1e6 = Some(999000L))
    // batch 1: an exact-copy EMBEDDING of a held vector under a fresh id
    // (near-dup gate), a re-sent held id (id gate), and novel vectors
    val twin = embs.where($"vec_id" === 15)
      .select(lit(900001L).as("vec_id"), $"embedding")
    val heldId = embs.where($"vec_id" === 40)
      .select(lit(12L).as("vec_id"), $"embedding") // id 12 already held
    val novel = embs.where($"vec_id".between(30, 39))
    VecStream.ingestBatch(novel.unionByName(twin).unionByName(heldId),
      s"$dir/idx", 1L, dupCosX1e6 = Some(999000L))

    val heldIds = spark.read.parquet(s"$dir/idx/lists")
      .select($"vec_id").as[Long].collect().sorted.toSeq
    assert(heldIds == ((10L to 39L).toSeq),
      s"expected survivors 10..39 (twin+held-id rejected), got $heldIds")

    // replay of batch 1: byte-identical rewrite, no duplicates
    VecStream.ingestBatch(novel.unionByName(twin).unionByName(heldId),
      s"$dir/idx", 1L, dupCosX1e6 = Some(999000L))
    assert(spark.read.parquet(s"$dir/idx/lists")
      .select($"vec_id").as[Long].collect().sorted.toSeq == ((10L to 39L).toSeq),
      "replay changed the lists")
  }

  test("in-batch id dedup is deterministic: a replay picks the same survivor") {
    // one vec_id arriving twice in a micro-batch with DIFFERENT
    // embeddings (an at-least-once upstream): the survivor must not
    // depend on arrival order, or a crash replay rewrites its partition
    // with different bytes
    val dup = embs.where($"vec_id" === 40)
      .select(lit(900001L).as("vec_id"), $"embedding")
    val dup2 = embs.where($"vec_id" === 41)
      .select(lit(900001L).as("vec_id"), $"embedding")
    val rest = embs.where($"vec_id".between(10, 19))
    def run(first: org.apache.spark.sql.DataFrame,
        second: org.apache.spark.sql.DataFrame): Map[Long, Seq[Float]] = {
      val dir = Files.createTempDirectory("vecdet").toString
      VectorIndex.trainQuantizer(embs, s"$dir/idx")
      VecStream.ingestBatch(rest.unionByName(first).unionByName(second),
        s"$dir/idx", 0L)
      spark.read.parquet(s"$dir/idx/lists")
        .select($"vec_id", $"embedding").as[(Long, Array[Float])]
        .collect().map { case (v, e) => v -> e.toSeq }.toMap
    }
    val a = run(dup, dup2)
    val b = run(dup2, dup)
    assert(a == b, "in-batch dedup survivor depends on arrival order")
    // and the surviving embedding is the deterministic (lexicographic
    // array-min) choice, not whichever row happened to come first
    val e40 = embs.where($"vec_id" === 40).select($"embedding")
      .as[Array[Float]].head().toSeq
    val e41 = embs.where($"vec_id" === 41).select($"embedding")
      .as[Array[Float]].head().toSeq
    val wantMin = Seq(e40, e41).min(Ordering.Implicits.seqOrdering[Seq, Float])
    assert(a(900001L) == wantMin, "survivor is not the array-min embedding")
  }

  test("assignment-drift gate rejects a constant-direction flood; clean batches and replays pass") {
    val dir = Files.createTempDirectory("vecgate").toString
    VectorIndex.trainQuantizer(embs, s"$dir/idx")
    // INTERLEAVED clean split (mod-3, like the mod-4 calibration): a
    // contiguous id range is NOT distribution-representative in this
    // synthetic corpus (ids cluster by topic — a contiguous 100-id
    // "clean" batch reads 3.1e7, above the bar, and legitimately so)
    val b0 = embs.where($"vec_id".between(10, 409) && $"vec_id" % 3 =!= 2)
    val b1 = embs.where($"vec_id".between(10, 409) && $"vec_id" % 3 === 2)
    // the drifted batch: every vector the same unit-norm direction —
    // the broken-encoder failure a norm check cannot see; it floods a
    // single quantizer cell
    val b2 = embs.where($"vec_id".between(410, 499))
      .select($"vec_id", array_repeat(lit(0.125f), 64).as("embedding"))
    VecStream.ingestBatch(b0, s"$dir/idx", 0L, driftGate = true)
    VecStream.ingestBatch(b1, s"$dir/idx", 1L, driftGate = true)
    VecStream.ingestBatch(b2, s"$dir/idx", 2L, driftGate = true)

    def heldIds() = spark.read.parquet(s"$dir/idx/lists")
      .select($"vec_id").as[Long].collect().sorted.toSeq
    assert(heldIds() == (10L to 409L).toSeq,
      s"gate verdicts wrong: lists hold ${heldIds().size} ids")
    // gate log: batch 0 ungated (no reference), batch 1 clean, batch 2 rejected
    val log = VecStream.gateLog(spark, s"$dir/idx")
      .select($"batch_id".cast("long"), $"rejected")
      .as[(Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(log == Seq((1L, false), (2L, true)), s"gate log $log")
    // replay of the rejected batch: same reference (own partition
    // excluded), same verdict, index unchanged
    VecStream.ingestBatch(b2, s"$dir/idx", 2L, driftGate = true)
    assert(heldIds() == (10L to 409L).toSeq, "replayed gated batch grew the index")
    // replay of a held batch under the gate: still held, still a no-op
    VecStream.ingestBatch(b1, s"$dir/idx", 1L, driftGate = true)
    assert(heldIds() == (10L to 409L).toSeq, "replayed clean batch mutated the index")
    // an EMPTY micro-batch under the gate: ungated, no crash, no growth
    VecStream.ingestBatch(embs.where(lit(false)), s"$dir/idx", 3L, driftGate = true)
    assert(heldIds() == (10L to 409L).toSeq, "empty gated batch mutated the index")
  }

  test("post-stream lists equal the frozen-quantizer assignment; search works pruned") {
    val dir = Files.createTempDirectory("vecstream2").toString
    VectorIndex.trainQuantizer(embs, s"$dir/idx")
    VecStream.ingestBatch(embs.where($"vec_id".between(10, 59)), s"$dir/idx", 0L)
    VecStream.ingestBatch(embs.where($"vec_id".between(60, 99)), s"$dir/idx", 1L)

    val cent = spark.read.parquet(s"$dir/idx/centroids")
    def vdot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.VectorFunctions.vecDot(a, b)
    val e = embs.where($"vec_id".between(10, 99))
      .select($"vec_id", $"embedding",
        sqrt(vdot($"embedding", $"embedding")).as("nrm"))
    val expected = e.join(broadcast(cent))
      .select($"vec_id",
        struct(floor(vdot($"embedding", $"cv") / ($"nrm" * $"cn") * 1e6 + 0.5)
          .cast("long").as("cc"), (-$"c_id").as("nc")).as("k"), $"c_id")
      .groupBy("vec_id").agg(max_by($"c_id", $"k").as("c_id"))
      .as[(Long, Long)].collect().toMap
    val got = spark.read.parquet(s"$dir/idx/lists")
      .select($"vec_id", $"c_id").as[(Long, Long)].collect()
    assert(got.length == 90, s"${got.length} rows != 90 survivors")
    got.foreach { case (v, c) =>
      assert(c == expected(v), s"vec $v in list $c, expected ${expected(v)}")
    }

    // search over the batch-layered layout: self-query ranks itself
    // first, and the list scan is still dynamically pruned on c_id
    val queries = embs.where($"vec_id" === 42)
      .select($"vec_id".as("query_id"), $"embedding")
    val res = VectorIndex.searchIvf(spark, s"$dir/idx", queries, 4, 5)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"streamed lists scan is not dynamically pruned:\n${plan.take(1500)}")
    val top = res.as[(Long, Int, Long, Long)].collect().minBy(_._2)
    assert(top._3 == 42L && top._4 == 1000000L,
      s"self-query top-1 is ${top._3} at ${top._4}")
  }

  test("compactIvf over a streamed layout: search parity, batch_id= partitions kept, files bounded") {
    val dir = Files.createTempDirectory("veccompact").toString
    VectorIndex.trainQuantizer(embs, s"$dir/idx")
    VecStream.ingestBatch(embs.where($"vec_id".between(10, 59)), s"$dir/idx", 0L)
    VecStream.ingestBatch(embs.where($"vec_id".between(60, 99)), s"$dir/idx", 1L)
    val queries = embs.where($"vec_id" === 42)
      .select($"vec_id".as("query_id"), $"embedding")
    def hits() = VectorIndex.searchIvf(spark, s"$dir/idx", queries, 4, 5)
      .as[(Long, Int, Long, Long)].collect().toSeq
    val want = hits()

    VectorIndex.compactIvf(spark, s"$dir/idx", targetFiles = 4)

    assert(hits() == want, "search drifted under streamed-layout compaction")
    // the replay-overwrite partitions survive the rewrite, so a fold
    // resumed afterwards still overwrites its own partition on replay
    val batchDirs = graft.util.Fs.listFiles(spark, s"$dir/idx/lists")
      .filter(_.endsWith(".parquet"))
    assert(batchDirs.nonEmpty && batchDirs.forall(_.contains("batch_id=")),
      s"compaction lost the batch_id= layout: ${batchDirs.take(3)}")
    VecStream.ingestBatch(embs.where($"vec_id".between(60, 99)), s"$dir/idx", 1L)
    assert(spark.read.parquet(s"$dir/idx/lists")
      .select($"vec_id").as[Long].collect().sorted.toSeq == (10L to 99L).toSeq,
      "post-compact replay broke the fold")
  }

  test("an empty or fully-deduplicated batch writes nothing and never bricks the stream") {
    val dir = Files.createTempDirectory("vecstreamempty").toString
    val idx = s"$dir/idx"
    val corpus = embs.where($"vec_id" >= 10)
    VectorIndex.trainQuantizer(corpus, idx)
    // batch 0 is EMPTY: a partitionBy write of an empty frame would
    // leave lists/batch_id=0 holding only _SUCCESS — existing but
    // unreadable, a permanent crash loop for every later batch's
    // held-index read. The fold must skip the write entirely.
    VecStream.ingestBatch(corpus.where(lit(false)), idx, 0L,
      balanceAudit = true)
    assert(!graft.util.Fs.exists(spark, s"$idx/lists"),
      "empty batch materialized a fileless lists partition")
    // the next batch reads held = none and proceeds normally
    VecStream.ingestBatch(corpus, idx, 1L, balanceAudit = true)
    assert(spark.read.parquet(s"$idx/lists").count() == corpus.count())
    // a batch whose every row is already held (all deduplicated away)
    // also writes nothing — and its replay skips identically
    VecStream.ingestBatch(corpus.limit(5), idx, 2L)
    assert(graft.util.Fs.listDirNames(spark, s"$idx/lists")
      .filter(_.startsWith("batch_id=")).sorted == Seq("batch_id=1"),
      "fully-deduplicated batch materialized a fileless partition")
    assert(spark.read.parquet(s"$idx/lists").count() == corpus.count())
  }

  test("pqCodes ingest feeds the full IVFADC serving path; replay and align converge") {
    val dir = Files.createTempDirectory("vecstreampq").toString
    val idx = s"$dir/idx"
    val corpus = embs.where($"vec_id" >= 10)
    VectorIndex.trainQuantizer(corpus, idx)
    VectorIndex.trainPqCodebook(corpus, idx)
    val b0 = corpus.where($"vec_id" % 2 === 0)
    val b1 = corpus.where($"vec_id" % 2 === 1)
    VecStream.ingestBatch(b0, idx, 0L, pqCodes = true)
    VecStream.ingestBatch(b1, idx, 1L, pqCodes = true)

    // the streamed code table equals the batch assignment against the
    // same codebook, batch-partitioned
    val got = spark.read.parquet(s"$idx/pq_codes")
      .select($"vec_id", $"sub_id", $"code").collect().map(_.toSeq).toSet
    val want = VectorIndex.codesOf(corpus,
        spark.read.parquet(s"$idx/pq_codebook"))
      .collect().map(_.toSeq).toSet
    assert(got == want, "streamed codes diverge from the batch assignment")

    // the composed serving path works straight off the streamed layout
    // (no aligned artifact yet -> membership-join fallback)
    val queries = embs.where($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding")
    val fallback = VectorIndex.searchIvfPq(spark, idx, queries, 4, 5)
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(fallback.nonEmpty, "streamed IVFADC fallback returned nothing")

    // the fold recorded O(delta) provenance; align consumes it into
    // per-batch segments and the aligned plan serves the same answer
    assert(graft.util.Fs.exists(spark, s"$idx/_align_pending/lists/pid=batch_0"))
    assert(graft.util.Fs.exists(spark, s"$idx/_align_pending/codes/pid=batch_1"))
    // no _BASE yet: first align takes the full path, which also works
    VectorIndex.alignPqToLists(spark, idx)
    assert(graft.util.Fs.isFile(spark, s"$idx/pq_codes_by_list/_SUCCESS"))
    assert(VectorIndex.searchIvfPq(spark, idx, queries, 4, 5)
      .as[(Long, Int, Long, Long)].collect().toSeq == fallback,
      "aligned streamed search diverges from the fallback")

    // the replay window that used to be the one double-count path: a
    // crash-replayed batch re-creates its pending record AFTER an align
    // consumed it in a larger group; the per-pid segment overwrites
    // itself instead of duplicating rows into a new segment
    VecStream.ingestBatch(b1, idx, 1L, pqCodes = true)
    val nAligned = spark.read.parquet(s"$idx/pq_codes_by_list").count()
    VectorIndex.alignPqToLists(spark, idx)
    assert(spark.read.parquet(s"$idx/pq_codes_by_list").count() == nAligned,
      "replayed batch's re-align duplicated aligned rows")
    assert(VectorIndex.searchIvfPq(spark, idx, queries, 4, 5)
      .as[(Long, Int, Long, Long)].collect().toSeq == fallback,
      "post-replay aligned search diverges")

    // pqCodes without a codebook fails loudly, not silently
    val bare = Files.createTempDirectory("vecstreampq2").toString
    VectorIndex.trainQuantizer(corpus, s"$bare/idx")
    intercept[IllegalArgumentException] {
      VecStream.ingestBatch(b0, s"$bare/idx", 0L, pqCodes = true)
    }
  }

  test("streaming source end-to-end via foreachBatch") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("vecstream3").toString
    VectorIndex.trainQuantizer(embs, s"$dir/idx")
    val rows = embs.where($"vec_id".between(10, 29))
      .as[(Long, Array[Float])].collect().toSeq
    val input = MemoryStream[(Long, Array[Float])]
    val q = VecStream.ingest(
      input.toDF().toDF("vec_id", "embedding"),
      s"$dir/idx", s"$dir/ckpt", dupCosX1e6 = Some(999000L))
    try {
      input.addData(rows.take(10))
      q.processAllAvailable()
      // second micro-batch re-sends an already-held embedding under a
      // new id alongside genuinely new vectors
      input.addData(rows.drop(10) :+ (900001L, rows.head._2))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.read.parquet(s"$dir/idx/lists")
      .select($"vec_id").as[Long].collect().sorted.toSeq
    assert(ids == ((10L to 29L).toSeq), s"streamed corpus ids $ids")
  }

  test("streaming end-to-end with the drift gate: a flood batch is rejected mid-stream") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("vecstream4").toString
    VectorIndex.trainQuantizer(embs, s"$dir/idx")
    // the calibrated mod-3 split from the batch-level gate test (the
    // fixture lesson: contiguous id ranges are topic-correlated and
    // legitimately drift; and a halved reference doubles the noise)
    val b0rows = embs.where($"vec_id".between(10, 409) && $"vec_id" % 3 =!= 2)
      .as[(Long, Array[Float])].collect().toSeq
    val b2rows = embs.where($"vec_id".between(10, 409) && $"vec_id" % 3 === 2)
      .as[(Long, Array[Float])].collect().toSeq
    val flood = (500L to 549L).map(id => (id, Array.fill(64)(0.125f))).toSeq
    val input = MemoryStream[(Long, Array[Float])]
    val q = VecStream.ingest(
      input.toDF().toDF("vec_id", "embedding"),
      s"$dir/idx", s"$dir/ckpt", driftGate = true)
    try {
      input.addData(b0rows) // batch 0: ungated (no reference)
      q.processAllAvailable()
      input.addData(flood) // batch 1: constant-direction flood — rejected
      q.processAllAvailable()
      input.addData(b2rows) // batch 2: clean — held
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.read.parquet(s"$dir/idx/lists")
      .select($"vec_id").as[Long].collect().sorted.toSeq
    assert(ids == (b0rows ++ b2rows).map(_._1).sorted,
      s"gate verdicts wrong through the streaming path: ${ids.size} held")
    val log = VecStream.gateLog(spark, s"$dir/idx")
      .select($"batch_id".cast("long"), $"rejected")
      .as[(Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(log == Seq((1L, true), (2L, false)), s"gate log $log")
  }

  test("searchIvfAsOfBatch serves the index as of micro-batch n; takedowns filter; batch-less layouts refuse") {
    val dir = Files.createTempDirectory("vecasof").toString
    VectorIndex.trainQuantizer(embs, s"$dir/idx")
    VecStream.ingestBatch(embs.where($"vec_id".between(10, 29)), s"$dir/idx", 0L)
    VecStream.ingestBatch(embs.where($"vec_id".between(30, 49)), s"$dir/idx", 1L)
    val q = embs.where($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding")
    val atBatch0 = VectorIndex.searchIvfAsOfBatch(spark, s"$dir/idx", q, 4, 5, 0L)
      .as[(Long, Int, Long, Long)].collect().toSeq
    VecStream.ingestBatch(embs.where($"vec_id".between(50, 69)), s"$dir/idx", 2L)
    // the snapshot is the search a fold stopped at batch n would serve:
    // identical to the live search taken when batch n WAS the frontier,
    // and its candidates never name a later batch's vectors
    assert(VectorIndex.searchIvfAsOfBatch(spark, s"$dir/idx", q, 4, 5, 0L)
      .as[(Long, Int, Long, Long)].collect().toSeq == atBatch0,
      "asOfBatch(0) drifted after later batches folded")
    val atBatch1 = VectorIndex.searchIvfAsOfBatch(spark, s"$dir/idx", q, 4, 5, 1L)
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(!atBatch1.exists(_._3 >= 50), "asOfBatch(1) leaked batch 2")
    // live == asOfBatch(frontier)
    assert(VectorIndex.searchIvf(spark, s"$dir/idx", q, 4, 5)
      .as[(Long, Int, Long, Long)].collect().toSeq ==
      VectorIndex.searchIvfAsOfBatch(spark, s"$dir/idx", q, 4, 5, 2L)
        .as[(Long, Int, Long, Long)].collect().toSeq,
      "asOfBatch(frontier) != the live search")
    // a takedown beats time travel
    val victim = atBatch0.head._3
    VectorIndex.deleteIvf(spark, s"$dir/idx", Seq(victim).toDF("vec_id"))
    assert(!VectorIndex.searchIvfAsOfBatch(spark, s"$dir/idx", q, 4, 5, 0L)
      .as[(Long, Int, Long, Long)].collect().exists(_._3 == victim),
      "a deleted vector was served from a batch-axis snapshot")
    // a batch-less (buildIvf) layout has no batch axis: loud
    val flat = Files.createTempDirectory("vecflat").toString
    VectorIndex.buildIvf(embs, s"$flat/idx")
    val ex = intercept[IllegalArgumentException] {
      VectorIndex.searchIvfAsOfBatch(spark, s"$flat/idx", q, 4, 5, 0L).count()
    }
    assert(ex.getMessage.contains("batch_id"), ex.getMessage)
  }
}
