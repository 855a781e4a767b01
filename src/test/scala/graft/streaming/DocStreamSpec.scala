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
}
