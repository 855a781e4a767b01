package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.util.Fs

/** Direct semantics pins for the Hadoop-FileSystem plumbing every
  * index lifecycle rides (markers, swaps, aligned-layout detection).
  * The call sites exercise these transitively; this spec pins the
  * contract each of them assumes — touch creates parents and is
  * idempotent, delete of a missing path is a no-op, rename reports
  * a missing source instead of throwing, listFiles is recursive and
  * files-only — so a future store/port regression fails here with the
  * primitive named, not three layers up in a compaction test.
  */
class FsSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("fs-spec").toString

  test("touch creates parents, is idempotent, and isFile distinguishes dirs") {
    val d = tmp()
    val marker = s"$d/_merges/delta-1/pairs.done"
    assert(!Fs.exists(spark, marker))
    Fs.touch(spark, marker)
    assert(Fs.isFile(spark, marker), "marker not created")
    Fs.touch(spark, marker) // overwrite — presence bits are idempotent
    assert(Fs.isFile(spark, marker))
    assert(Fs.exists(spark, s"$d/_merges/delta-1"))
    assert(!Fs.isFile(spark, s"$d/_merges/delta-1"),
      "isFile must be false for a directory (the _SUCCESS gate check)")
  }

  test("delete is recursive and a missing path is a no-op") {
    val d = tmp()
    Fs.touch(spark, s"$d/idx/stage/a/_SUCCESS")
    Fs.touch(spark, s"$d/idx/stage/b/part-0.parquet")
    Fs.delete(spark, s"$d/idx/stage")
    assert(!Fs.exists(spark, s"$d/idx/stage"), "recursive delete failed")
    Fs.delete(spark, s"$d/idx/stage") // already gone — must not throw
    Fs.delete(spark, s"$d/never-existed")
  }

  test("rename moves directories atomically and reports a missing source") {
    val d = tmp()
    Fs.touch(spark, s"$d/live/_SUCCESS")
    Fs.touch(spark, s"$d/live/part-0.parquet")
    assert(Fs.rename(spark, s"$d/live", s"$d/_old"), "rename failed")
    assert(!Fs.exists(spark, s"$d/live") && Fs.isFile(spark, s"$d/_old/_SUCCESS"),
      "rename did not move the directory with its contents")
    assert(!Fs.rename(spark, s"$d/live", s"$d/elsewhere"),
      "rename of a missing source must return false, not throw " +
        "(the compact swap's require() owns the failure message)")
  }

  test("atomicRename admits HDFS-semantics stores and refuses object stores by scheme") {
    val d = tmp()
    assert(Fs.atomicRename(spark, d), "local paths must be admitted")
    assert(Fs.atomicRename(spark, s"file://$d"), "file:// must be admitted")
    assert(Fs.atomicRename(spark, "hdfs://nn:8020/warehouse/idx"),
      "hdfs:// must be admitted")
    assert(Fs.atomicRename(spark, "abfs://c@a.dfs.core.windows.net/idx"),
      "abfs (ADLS Gen2, atomic rename) must be admitted")
    for (p <- Seq("s3a://bucket/idx", "s3://bucket/idx", "gs://bucket/idx",
        "wasb://c@a.blob.core.windows.net/idx", "oss://bucket/idx"))
      assert(!Fs.atomicRename(spark, p),
        s"$p fakes rename with copy+delete and must be refused")
    // ... and the maintenance protocol selector actually consumes it:
    // an object-store path gets the pointer protocol (one-file publish,
    // the primitive those stores DO provide), an HDFS-semantics path
    // keeps the rename protocol, and the conf override wins either way
    assert(graft.llm.IndexMaintenance.pointerMode(spark, "s3a://bucket/idx"),
      "object-store maintenance must select the pointer protocol")
    assert(!graft.llm.IndexMaintenance.pointerMode(spark, d),
      "local maintenance must keep the rename protocol")
    spark.conf.set("spark.graft.index.swapMode", "pointer")
    try assert(graft.llm.IndexMaintenance.pointerMode(spark, d),
      "swapMode=pointer must force the pointer protocol anywhere")
    finally spark.conf.unset("spark.graft.index.swapMode")
  }

  test("stagePath resolves through a stage pointer; bare path without one") {
    val d = tmp()
    assert(Fs.stagePath(spark, s"$d/idx", "lists") == s"$d/idx/lists",
      "no pointer: the bare pre-pointer path is live")
    Fs.writeString(spark, s"$d/idx/_ptr/lists", "g3")
    assert(Fs.stagePath(spark, s"$d/idx", "lists") == s"$d/idx/_gen/lists/g3",
      "a pointer redirects to its generation directory")
    // control-file round-trip, including the overwrite a flip performs
    Fs.writeString(spark, s"$d/idx/_ptr/lists", "g4")
    assert(Fs.readString(spark, s"$d/idx/_ptr/lists") == "g4")
    assert(Fs.listDirNames(spark, s"$d/missing").isEmpty)
  }

  test("listFiles is recursive, files-only, and empty for a missing dir") {
    val d = tmp()
    Fs.touch(spark, s"$d/idx/pairs/part-0.parquet")
    Fs.touch(spark, s"$d/idx/pairs/bp=a/part-1.parquet")
    Fs.touch(spark, s"$d/idx/pairs/_SUCCESS")
    val files = Fs.listFiles(spark, s"$d/idx/pairs")
    assert(files.count(_.endsWith(".parquet")) == 2,
      s"expected 2 parquet files recursively, got $files")
    assert(!files.exists(_.endsWith("bp=a")), "listFiles returned a directory")
    assert(Fs.listFiles(spark, s"$d/missing").isEmpty)
  }
}
