package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem plumbing for every persisted-index lifecycle (merge
  * markers, compaction swaps, aligned-layout detection, resume checks)
  * — through the Hadoop `FileSystem` API, NOT `java.io.File`: the
  * lifecycle components explicitly claim a 100 TB posture, and that
  * runs on HDFS/S3-compatible stores where `java.io.File` silently sees
  * nothing (markers never found ⇒ a replayed mergeId re-appends,
  * recreating exactly the duplicates the marker exists to stop;
  * compaction swaps throw). Resolving the filesystem FROM the path via
  * the session's Hadoop configuration keeps local behavior identical
  * (`file:` URIs hit `RawLocalFileSystem`) while `hdfs://`/`s3a://`
  * index directories route to their real store. Routing is not the
  * same as equivalence: object stores fake rename with copy+delete, so
  * the rename-based maintenance swaps additionally gate on
  * [[atomicRename]] and refuse stores where the protocol's atomicity
  * premise is false.
  */
object Fs {

  private def fs(spark: SparkSession, p: String): (FileSystem, Path) = {
    val path = new Path(p)
    (path.getFileSystem(spark.sparkContext.hadoopConfiguration), path)
  }

  /** The path exists (file or directory). */
  def exists(spark: SparkSession, p: String): Boolean = {
    val (f, q) = fs(spark, p); f.exists(q)
  }

  /** The path exists and is a regular file (marker checks). */
  def isFile(spark: SparkSession, p: String): Boolean = {
    val (f, q) = fs(spark, p)
    f.exists(q) && f.getFileStatus(q).isFile
  }

  /** Create an empty marker file, with parents. Overwrites — markers
    * are idempotent presence bits, so a concurrent double-create is
    * harmless.
    */
  def touch(spark: SparkSession, p: String): Unit = {
    val (f, q) = fs(spark, p)
    f.mkdirs(q.getParent)
    f.create(q, true).close()
  }

  /** Recursive delete; a missing path is a no-op (maintenance passes
    * clear directories that may never have been created).
    */
  def delete(spark: SparkSession, p: String): Unit = {
    val (f, q) = fs(spark, p)
    f.delete(q, true): Unit
  }

  /** `FileSystem.rename` — a metadata move on HDFS and local disks,
    * but NOT universally atomic: S3-class object stores (s3a, gs, …)
    * implement it as an O(data) copy+delete, so a crash mid-rename can
    * leave BOTH a partial source and a partial destination. Callers
    * whose crash-safety argument rests on rename atomicity (the
    * [[graft.llm.IndexMaintenance]] swap protocol) must gate on
    * [[atomicRename]] rather than assume it. Returns false when the
    * source is missing or the destination blocks the move. The
    * missing-source case is guarded EXPLICITLY because stores disagree:
    * HDFS returns false, but the local `ChecksumFileSystem` falls back
    * to a copy attempt that throws `FileNotFoundException` (FsSpec pins
    * the uniform false).
    */
  def rename(spark: SparkSession, src: String, dst: String): Boolean = {
    val (f, s) = fs(spark, src)
    f.exists(s) && f.rename(s, new Path(dst))
  }

  /** Does this path's store implement directory rename as an ATOMIC
    * metadata move? True on HDFS-semantics filesystems (hdfs, local
    * file, viewfs, Azure abfs — ADLS Gen2 renames are atomic); FALSE on
    * the known copy+delete object stores, where a mid-rename crash
    * leaves partially-populated directories. A capability deny-list
    * keyed on the resolved filesystem's scheme — Hadoop exposes no
    * portable atomicity flag (`StreamCapabilities` covers streams, not
    * renames), so the honest contract is to name the stores the swap
    * protocol refuses rather than discover them at crash time.
    */
  def atomicRename(spark: SparkSession, p: String): Boolean = {
    // scheme from the URI, not from an instantiated FileSystem: the
    // refusal must work (and be testable) on hosts that don't even
    // carry the object-store connector jars
    val scheme = Option(new Path(p).toUri.getScheme).map(_.toLowerCase)
      .orElse(Option(FileSystem.getDefaultUri(
        spark.sparkContext.hadoopConfiguration).getScheme).map(_.toLowerCase))
      .getOrElse("file")
    !Set("s3", "s3a", "s3n", "gs", "oss", "cosn", "obs", "swift", "wasb", "wasbs")
      .contains(scheme)
  }

  /** Read a small control file (stage pointer, swap-intent journal) as
    * UTF-8. Control files are written whole by [[writeString]]; a read
    * therefore sees a complete previous or complete current value,
    * never a torn one, on any store where a single-object publish is
    * atomic (every object store's PUT; HDFS create+close under the
    * single-writer maintenance discipline the index lifecycle already
    * assumes).
    */
  def readString(spark: SparkSession, p: String): String = {
    val (f, q) = fs(spark, p)
    val in = f.open(q)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, "UTF-8")
    } finally in.close()
  }

  /** Publish a small control file whole (create-overwrite, write,
    * close), with parents. This is the ONE primitive the pointer-swap
    * maintenance protocol needs to be atomic, and it is exactly the
    * primitive object stores provide: a single-object PUT becomes
    * visible all-or-nothing at close, so a reader racing the publish
    * sees the old pointer or the new one, never a partial — the
    * property directory rename lacks there. (On HDFS/local,
    * create-overwrite truncates before writing; the pointer protocol
    * is selected on those stores only by explicit override, under the
    * single-writer maintenance window every marker here assumes.)
    */
  def writeString(spark: SparkSession, p: String, s: String): Unit = {
    val (f, q) = fs(spark, p)
    f.mkdirs(q.getParent)
    val out = f.create(q, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  /** Resolve the CURRENT directory of a maintenance-swapped index
    * stage. Stages live at `indexDir/<stage>` until the first
    * POINTER-mode swap ([[graft.llm.IndexMaintenance]]) moves the live
    * copy under a versioned generation directory
    * `indexDir/_gen/<stage>/<gen>` and publishes the generation name in
    * the one-file pointer `indexDir/_ptr/<stage>`. No pointer file ⇒
    * the bare path is live (the universal pre-pointer layout, and the
    * permanent layout on atomic-rename stores, where swaps move
    * directories instead) — so resolution costs one existence probe
    * and changes nothing for every index that never ran a pointer-mode
    * swap.
    */
  def stagePath(spark: SparkSession, indexDir: String, stage: String): String = {
    val ptr = s"$indexDir/_ptr/$stage"
    if (isFile(spark, ptr)) s"$indexDir/_gen/$stage/${readString(spark, ptr).trim}"
    else s"$indexDir/$stage"
  }

  /** Create a directory (and any missing parents). HDFS-semantics
    * stores reject a rename whose destination PARENT does not exist, so
    * a first-ever retention move must mkdirs its keep-root first —
    * local `RawLocalFileSystem` happens to create it implicitly, which
    * is exactly the kind of local-only behavior that hides portability
    * holes ([[graft.llm.VectorIndex]] retainAligned).
    */
  def mkdirs(spark: SparkSession, p: String): Boolean = {
    val (f, q) = fs(spark, p)
    f.mkdirs(q)
  }

  /** Modification time (epoch millis) of a path — `None` when absent.
    * Read-only operability reporting ([[graft.llm.IndexStatus]]'s
    * generation ages); never a correctness input (store clocks skew).
    */
  def modifiedAt(spark: SparkSession, p: String): Option[Long] = {
    val (f, q) = fs(spark, p)
    // exists->getFileStatus is a racy pair: a concurrent hygiene pass
    // can GC the path between the two, and the status probe must stay
    // safe beside running maintenance — absent either way is None
    try if (f.exists(q)) Some(f.getFileStatus(q).getModificationTime)
        else None
    catch { case _: java.io.FileNotFoundException => None }
  }

  /** Immediate child FILE names of a path (stage-pointer discovery —
    * `_ptr/<stage>` entries are files, not directories). Missing dir =
    * empty.
    */
  def listFileNames(spark: SparkSession, dir: String): Seq[String] = {
    val (f, q) = fs(spark, dir)
    if (!f.exists(q)) Seq.empty
    else f.listStatus(q).filter(_.isFile).map(_.getPath.getName).toSeq
  }

  /** Immediate child DIRECTORY names of a path (generation listing for
    * pointer-swap hygiene). Missing dir = empty.
    */
  def listDirNames(spark: SparkSession, dir: String): Seq[String] = {
    val (f, q) = fs(spark, dir)
    if (!f.exists(q)) Seq.empty
    else f.listStatus(q).filter(_.isDirectory).map(_.getPath.getName).toSeq
  }

  /** Recursively list the regular files under a directory (file-count
    * assertions after compaction; warehouse stats). Missing dir = empty.
    */
  def listFiles(spark: SparkSession, dir: String): Seq[String] = {
    val (f, q) = fs(spark, dir)
    if (!f.exists(q)) Seq.empty
    else {
      val it = f.listFiles(q, true)
      val buf = Seq.newBuilder[String]
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile) buf += st.getPath.toString
      }
      buf.result()
    }
  }
}
