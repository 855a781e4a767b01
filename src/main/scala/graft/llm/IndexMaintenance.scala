package graft.llm

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

import graft.util.Fs

/** The shared COMPACTION / STAGE-SWAP engine behind
  * [[DedupIndex.compact]], [[VectorIndex.compactIvf]]/
  * [[VectorIndex.compactPq]], and [[VectorIndex.retrainIvf]] — one
  * maintenance discipline for every persisted-index lifecycle in the
  * library. See [[DedupIndex.compact]] for the full posture rationale
  * (staged-then-swap, content-preserving crash safety, marker
  * clearing); this object holds only the mechanics so the text and
  * vector indexes cannot drift apart.
  *
  * Store requirements — TWO swap protocols, selected per store. The
  * RENAME protocol (three `FileSystem.rename` calls per stage) rests
  * its crash-safety on "each rename is an atomic metadata move" — TRUE
  * on HDFS-semantics stores (hdfs, local, viewfs, abfs), FALSE on
  * S3-class object stores, where rename is a non-atomic copy+delete
  * and a mid-rename crash leaves partially-populated directories. On
  * stores [[graft.util.Fs.atomicRename]] denies, maintenance therefore
  * switches to the POINTER protocol: the rewrite is staged into a
  * fresh versioned generation directory (`_gen/<stage>/gN` —
  * unreferenced until published, so even a torn write there is inert
  * garbage), and the swap is ONE single-file pointer publish
  * (`_ptr/<stage>`), which is exactly the atomic primitive object
  * stores do provide (a PUT is visible all-or-nothing). Multi-stage
  * swaps (retrain's centroids+lists) are bracketed by a one-file
  * intent JOURNAL written before the first flip; recovery replays the
  * journal, so a crash between flips converges instead of serving a
  * mixed index. Readers resolve every stage through
  * [[graft.util.Fs.stagePath]], which follows the pointer when one
  * exists and the bare `indexDir/<stage>` path otherwise — indexes
  * that never ran a pointer-mode swap keep their layout unchanged.
  * Flips are READER-SAFE: the superseded copy is retained until later
  * maintenance entries GC it beyond the `spark.graft.index.retainGens`
  * window (default 1 — see [[retainGens]]), so a query that resolved
  * its stage paths just before a flip finishes its scan against the
  * old generation instead of losing files mid-job; a reader must only
  * not SPAN more than `retainGens` whole maintenance cycles.
  * `spark.graft.index.swapMode` (`auto`/`rename`/`pointer`) overrides
  * the per-store choice — `rename` for an HCFS connector the deny-list
  * wrongly flags, `pointer` to force the object-store protocol
  * anywhere (how the specs exercise it on local disk). The RENAME
  * protocol, by contrast, swaps the live path IN PLACE, so its reader
  * contract is strictly weaker and stated honestly: an in-flight
  * reader must not span a rename-mode maintenance swap at all (the
  * file paths it planned are moved out from under it) — reader-safe
  * maintenance (retention + [[snapshotStages]]) is what the pointer
  * protocol provides, and `swapMode = pointer` opts any store into it.
  *
  * On rename-protocol stores, recovery additionally tolerates a
  * partial rename planted by an ungated writer: a swap-intent marker
  * brackets each swap, and while it is up the `_SUCCESS`-gated staged
  * rewrite — not bare existence of the live path — is what recovery
  * trusts.
  */
private[graft] object IndexMaintenance {

  /** The cross-process MAINTENANCE LEASE — the single-writer assumption
    * every marker protocol here makes, enforced instead of assumed. Two
    * schedulers running `maintainIfDue` (or any compact/retrain/reband
    * pair) against the same index from different drivers would
    * interleave staged rewrites and flip journals — each protocol is
    * crash-SAFE but not concurrent-writer-safe, and the failure mode is
    * silent (a half-superseded staged generation swapped by the other
    * writer). Every maintenance entry therefore brackets its work in
    * [[withLease]]: a one-file lease (`_maintenance/_lease`, owner +
    * expiry wall-clock) is acquired before anything is staged or
    * swapped and released after; a LIVE conflicting lease fails the
    * entry LOUDLY (naming the holder and its expiry), and a CRASHED
    * holder's lease expires by TTL (`spark.graft.index.leaseMs`,
    * default 15 min — size it above the longest maintenance pass), so
    * a crash never wedges maintenance forever. Re-entrant within the
    * owning thread (compact acquires, its swap re-enters); a SECOND
    * thread in the same JVM is refused like a second process — two
    * threads are two writers.
    *
    * Scope: every BATCH writer takes the lease — the compaction
    * entries whole (including their [[Tombstones.beginFold]] cohort
    * aging and [[Tombstones.endFold]] retirement, which are marker
    * writers too), retrain, reband, align, and the O(delta) merges
    * (a merge landing mid-rewrite would be silently dropped when the
    * staged copy swaps in). Two writers stay outside it by design:
    * [[Tombstones.add]] (the takedown verb — append-only, inert under
    * replay, and explicitly safe against a concurrent fold via the
    * observed-files discipline; serializing takedowns behind a long
    * compaction would trade a non-bug for latency) and the streaming
    * ingest folds (their exclusivity comes from the streaming
    * checkpoint — one query owns the sink — and their documented
    * contract already requires maintenance to run with the stream
    * STOPPED).
    *
    * Best-effort by design, stated honestly: without an atomic
    * create-if-absent primitive (HDFS has one; S3 PUTs do not) two
    * writers racing the same few-millisecond acquire window can both
    * proceed — the lease turns the silent-corruption ASSUMPTION into an
    * enforced contract for the realistic conflict (overlapping
    * schedules, a human and a cron), not into a distributed lock
    * service. Readers never touch it. The expired-lease takeover
    * double-read separates a crashed holder from a live holder's
    * mid-write renewal only when the renewal completes within one
    * probe beat (`spark.graft.index.leaseProbeMs`, default 100 ms) —
    * on a store whose small-file writes can stall longer, raise the
    * beat or the false-takeover window widens.
    *
    * TTL overrun is handled by [[fence]]: every swap/publish point
    * inside a lease body re-checks ownership first — a holder still
    * inside its TTL heartbeat-renews (so a pass longer than the TTL
    * keeps its lease), and a holder whose expired lease was taken over
    * aborts LOUDLY before publishing anything over the successor's
    * work (the unfenced-zombie hazard, closed at every write that
    * could corrupt: swap/publish points, staged stage rewrites, and
    * the per-stage merge appends).
    */
  private final class LeaseState(val threadId: Long, val owner: String) {
    // the expiry WE last wrote — [[fence]] compares against it to decide
    // whether a successor could legitimately have taken over, and the
    // heartbeat renewal advances it
    @volatile var expiresAt: Long = Long.MaxValue
  }
  private val heldLeases =
    new java.util.concurrent.ConcurrentHashMap[String, LeaseState]()

  /** The in-JVM lease-map key: the FileSystem-qualified URI of
    * `indexDir`, so two threads addressing the same index via aliased
    * path spellings (trailing slash, `file://` scheme prefix vs bare
    * path, redundant slashes) collide on ONE map entry instead of both
    * winning `putIfAbsent` and racing the non-atomic file protocol —
    * the same-JVM second-writer refusal the map exists for.
    */
  private val leaseKeys =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def leaseKey(spark: SparkSession, indexDir: String): String = {
    // cached per raw spelling: [[fence]] runs on swap/publish hot paths
    // and must really pay only a map read — a fresh Hadoop conf +
    // FileSystem resolution per call would not be "the hot path pays
    // nothing"; bounded by distinct index dirs per JVM
    val cached = leaseKeys.get(indexDir)
    if (cached != null) cached
    else {
      val p = new org.apache.hadoop.fs.Path(indexDir)
      try {
        val k = p.getFileSystem(spark.sessionState.newHadoopConf())
          .makeQualified(p).toString
        leaseKeys.put(indexDir, k)
        k
      } catch {
        // an unresolvable scheme falls back to Path's own normalization
        // (still collapses slashes) rather than failing the acquire —
        // but the fallback is NOT cached: pinning an alias-divergent
        // key for the JVM's lifetime after one transient failure would
        // permanently split one index across two heldLeases entries,
        // silently bypassing the same-JVM second-writer refusal.
        // What CAN be normalized without the FileSystem still is: a
        // local `file:` scheme spelling collapses to its bare path
        // component, so "file:///x" and "/x" land on ONE fallback key
        // while the resolution is down instead of both spellings
        // reaching the non-atomic file protocol (a scheme-bearing
        // remote URI keeps scheme+authority — two clusters' /x must
        // not collide).
        case _: java.io.IOException =>
          val u = p.toUri
          if ((u.getScheme == null || u.getScheme == "file") &&
              (u.getAuthority == null || u.getAuthority.isEmpty) &&
              u.getPath != null && u.getPath.nonEmpty) u.getPath
          else p.toString
      }
    }
  }

  private[graft] def leasePath(indexDir: String) = s"$indexDir/_maintenance/_lease"

  /** The lease file's (owner, expires) as written — `None` when absent;
    * a torn/corrupt/unreadable file reads as owner `<unreadable>` expiring
    * at 0 (i.e. as a crashed holder, subject to the takeover double-read
    * in [[withLease]]).
    */
  private[graft] def readLease(spark: SparkSession, path: String): Option[(String, Long)] =
    if (!Fs.isFile(spark, path)) None
    else try {
      val lines = Fs.readString(spark, path).split("\n").toSeq.map(_.trim)
      Some((
        lines.collectFirst {
          case l if l.startsWith("owner=") => l.drop(6)
        }.getOrElse("<unknown>"),
        // toLongOption: a torn/corrupt lease (crash mid-writeString,
        // external edit) must read as EXPIRED — a crashed holder to
        // take over — not throw NumberFormatException on every future
        // acquire forever (takeover is the only path that overwrites
        // the file, so a throwing parse would wedge maintenance until
        // manual deletion)
        lines.collectFirst {
          case l if l.startsWith("expires=") =>
            l.drop(8).toLongOption.getOrElse(0L)
        }.getOrElse(0L)))
    } catch { case _: java.io.IOException => Some(("<unreadable>", 0L)) }

  private def leaseOwnerOf(spark: SparkSession, path: String): Option[String] =
    if (!Fs.isFile(spark, path)) None
    else try Fs.readString(spark, path).split("\n").toSeq.map(_.trim)
      .collectFirst { case l if l.startsWith("owner=") => l.drop(6) }
    // an unreadable (torn, externally replaced) lease reads as
    // not-ours: release then conservatively leaves it, and the TTL is
    // what eventually clears a genuinely dead one
    catch { case _: java.io.IOException => None }

  private[graft] def withLease[T](spark: SparkSession, indexDir: String)
      (body: => T): T = {
    val tid = Thread.currentThread().getId
    // one unique owner token per ACQUISITION (not per process): release
    // must delete only its own lease, never a successor's (a holder
    // that overran its TTL and was legitimately taken over would
    // otherwise unlock the takeover's live lease on exit)
    val mine = new LeaseState(tid,
      s"${java.lang.management.ManagementFactory.getRuntimeMXBean.getName}" +
        s"/thread-$tid/${java.util.UUID.randomUUID()}")
    // in-JVM claim FIRST and atomically (putIfAbsent — a get-then-put
    // would let two racing threads both reach the file protocol):
    // whoever wins the map entry runs the file protocol; a loser with
    // the same thread id is a legitimate re-entrant frame (compact →
    // its own swap), any other thread is a second writer. Keyed by the
    // qualified URI ([[leaseKey]]) so aliased spellings of one index
    // collide here instead of both reaching the file protocol.
    val key = leaseKey(spark, indexDir)
    val prev = heldLeases.putIfAbsent(key, mine)
    if (prev != null) {
      require(prev.threadId == tid,
        s"maintenance lease at $indexDir is held by thread " +
          s"${prev.threadId} of THIS process — a second concurrent " +
          "maintenance entry is a second writer; serialize maintenance " +
          "per index")
      body
    } else {
      val path = leasePath(indexDir)
      var acquired = false
      try {
        val now = System.currentTimeMillis()
        readLease(spark, path).foreach { case (owner, expires) =>
          // an expired lease is a crashed holder: take over (the marker
          // protocols converge whatever it left; recovery runs first in
          // every entry). A live one is a concurrent writer: refuse.
          require(expires <= now,
            s"maintenance lease at $indexDir is held by $owner until " +
              s"$expires (now $now) — a concurrent maintenance writer is " +
              "active; wait for it (or for the lease TTL, " +
              "spark.graft.index.leaseMs, if it crashed) before retrying")
          // Expired-or-torn DOUBLE-READ before taking over: a torn read
          // can also be a LIVE holder's heartbeat renewal ([[fence]])
          // caught mid-rewrite — a single-read takeover there would put
          // two live writers on the index. A heartbeat completes in
          // microseconds while a genuinely crashed lease stays
          // expired/torn forever, so one beat and a re-read separates
          // the two: take over only if the lease STILL reads expired.
          // The beat is `spark.graft.index.leaseProbeMs` (default 100):
          // on a store whose small-file writes can stall past the beat
          // a live holder's renewal can still read expired twice and be
          // falsely taken over — size the beat above the store's
          // worst-case small-write latency (see the class docstring's
          // best-effort contract; there is no compare-and-swap here).
          Thread.sleep(spark.conf
            .get("spark.graft.index.leaseProbeMs", "100").trim.toLong)
          val now2 = System.currentTimeMillis()
          readLease(spark, path).foreach { case (owner2, expires2) =>
            // an UNREADABLE re-read (IOException, not an unparsable
            // line) is a sustained store-side failure, not a crashed
            // holder: taking over on it could clobber a LIVE lease the
            // store just cannot serve right now — fail loudly and let
            // the caller retry instead (a vanished file reads None and
            // proceeds; a crashed holder's torn CONTENT parses to
            // expires=0 with its real owner and is taken over)
            if (owner2 == "<unreadable>")
              throw new IllegalStateException(
                s"maintenance lease at $indexDir is unreadable (store " +
                  "read failure on both acquisition reads) — refusing to " +
                  "take over what may be a live holder's lease; retry " +
                  "when the store serves reads again")
            require(expires2 <= now2,
              s"maintenance lease at $indexDir is held by $owner2 until " +
                s"$expires2 (now $now2; the first read caught a renewal " +
                "mid-write) — a concurrent maintenance writer is active; " +
                "wait for it before retrying")
          }
        }
        val ttl = spark.conf.get("spark.graft.index.leaseMs", "900000")
          .trim.toLong
        mine.expiresAt = now + ttl
        Fs.writeString(spark, path,
          s"owner=${mine.owner}\nexpires=${mine.expiresAt}")
        acquired = true
        body
      } finally if (acquired) {
        heldLeases.remove(key, mine)
        // Release. While OUR lease is still live no successor can have
        // legitimately taken over (takeover requires expiry), so the
        // file is ours by contract and is deleted without reading it —
        // the common case pays no read and cannot be wedged by a
        // transient read failure. A holder that OVERRAN its TTL may
        // have been taken over; the overrun release must then never
        // delete a successor's LIVE lease ([[releaseOverrun]]).
        if (System.currentTimeMillis() < mine.expiresAt)
          Fs.delete(spark, path)
        else releaseOverrun(spark, indexDir, path, mine.owner)
      } else heldLeases.remove(key, mine)
    }
  }

  /** Release a lease whose holder OVERRAN its TTL — a successor may
    * legitimately hold the file now ([[withLease]] takeover), and the
    * release must not delete that live lease. On rename-capable stores
    * this CLAIMS by rename first: the lease file is atomically moved
    * to a release-unique name, read there (its content can no longer
    * change under us — the claim IS the missing compare primitive),
    * and either deleted (still ours: nobody took over) or renamed
    * straight back (a successor's live lease, restored intact, with an
    * unreadable claim treated as not-ours — conservative). A takeover
    * racing this release can thus never LOSE its lease: the only
    * exposure left is the one rename round-trip in which the file sits
    * under the claim name, where a fresh acquire would see no lease —
    * the same no-create-if-absent caveat the acquire path already
    * documents, shrunk from the whole read-delete gap. Should the
    * restore rename itself fail (the path re-occupied by an even newer
    * lease inside that round-trip — already a double-writer state),
    * the claim file is left as inert garbage (acquires never read
    * `*.releasing.*` names) and the successor's own heartbeat
    * ([[fence]]) re-materializes its lease file.
    *
    * On the [[graft.util.Fs.atomicRename]] deny-list (object stores,
    * where rename is a non-atomic copy+delete that could itself tear
    * the live lease) the claim is unavailable, and the release falls
    * back to best-effort read-then-delete: delete only if the file
    * still carries our owner token. A takeover landing inside THAT
    * read-delete gap can still lose its lease — the documented
    * residual, now confined to stores without an atomic rename.
    */
  private def releaseOverrun(spark: SparkSession, indexDir: String,
      path: String, owner: String): Unit =
    if (Fs.atomicRename(spark, indexDir)) {
      val claim = s"$path.releasing.${java.util.UUID.randomUUID()}"
      if (Fs.rename(spark, path, claim)) {
        val claimedOwner = leaseOwnerOf(spark, claim)
        if (claimedOwner.contains(owner)) Fs.delete(spark, claim)
        // Claimed a lease that is NOT ours: a successor took over and
        // we just renamed its live lease away. Restore it — UNLESS the
        // successor's own fence heartbeat already re-materialized the
        // file at the lease path (the heartbeat writes blind while
        // live): an occupied path means the newer write is
        // authoritative, and the stale claim copy is deleted instead.
        // The restore itself REWRITES the claimed content with the
        // expiry bumped a full TTL rather than renaming the stale copy
        // back: a heartbeat landing inside the check-to-restore window
        // would otherwise be overwritten with an OLDER expiry (POSIX
        // rename replaces an existing destination), re-opening the
        // false third-party takeover this guard closes — with the
        // bump, the worst cross-write leaves the successor MORE lease,
        // never less, and the residual failure mode is a phantom lease
        // blocking maintenance loudly for at most one TTL instead of
        // two writers corrupting silently.
        else if (Fs.isFile(spark, path)) Fs.delete(spark, claim)
        else {
          val ttl = spark.conf.get("spark.graft.index.leaseMs", "900000")
            .trim.toLong
          // never SHORTEN what the successor wrote: the bump is
          // max(claimed expiry, now + TTL) — monotone in the
          // successor's favor whatever the TTL conf says
          val restored = try Fs.readString(spark, claim).split("\n").toSeq
              .map(l => if (l.startsWith("expires="))
                s"expires=${math.max(
                  l.drop(8).trim.toLongOption.getOrElse(0L),
                  System.currentTimeMillis() + ttl)}" else l)
              .mkString("\n")
            catch { case _: java.io.IOException => "" }
          if (restored.nonEmpty) Fs.writeString(spark, path, restored)
          Fs.delete(spark, claim)
        }
      }
    } else if (leaseOwnerOf(spark, path).contains(owner))
      Fs.delete(spark, path)

  /** FENCE a maintenance write against a TTL-overrun takeover — the
    * zombie-writer hole [[withLease]] alone leaves open: a holder that
    * overran its TTL may have been legitimately taken over (takeover
    * requires only expiry), and nothing would stop its still-running
    * jobs from publishing a pointer or swap AFTER the successor's own —
    * the classic unfenced-zombie corruption. Every swap/publish point
    * ([[swapByPointer]]'s journal write, [[flipPointers]],
    * [[swapByRename]]'s set journal, each [[swapOneByRename]]), each
    * [[compactStages]] stage rewrite, and each per-stage merge append
    * ([[DedupIndex.merge]], [[VectorIndex.mergeIvf]]/
    * [[VectorIndex.mergePq]] — appends a successor's staged rewrite
    * would otherwise silently drop) therefore calls this first:
    *
    *  - lease still LIVE and not near expiry: no successor can exist
    *    (takeover requires expiry) — return at the cost of one map read
    *    and a clock compare, no file I/O. The hot path pays nothing.
    *  - live but inside the renewal window (past half the TTL): the
    *    HEARTBEAT — rewrite `expires=` from the holder, so a pass
    *    longer than the TTL keeps its lease instead of silently
    *    expiring mid-run (the ADVICE hole: compact is O(corpus) at
    *    100 TB while the TTL is a fixed conf). The file is ours by
    *    contract while live, so the renewal needs no read.
    *  - EXPIRED: re-read the file and verify the owner token. Ours —
    *    we overran but nobody took over; renew and continue (the
    *    acquire-window caveat applies, documented best-effort). Not
    *    ours, or unreadable/missing — a successor holds the index now;
    *    abort LOUDLY before publishing anything, leaving the
    *    successor's artifacts intact.
    *
    * No active lease frame for `indexDir` (spec-level direct calls to
    * the swap mechanics) fences nothing — the contract is scoped to
    * [[withLease]] bodies. A frame held by a DIFFERENT thread is
    * treated the same way: the caller owns nothing, so renewing (or
    * aborting against) the holder's lease on its behalf would extend
    * a TTL from a thread outside the lease contract — only the owning
    * thread's re-entrant frames fence.
    */
  private[graft] def fence(spark: SparkSession, indexDir: String): Unit = {
    val st = heldLeases.get(leaseKey(spark, indexDir))
    if (st == null || st.threadId != Thread.currentThread().getId) return
    val now = System.currentTimeMillis()
    val ttl = spark.conf.get("spark.graft.index.leaseMs", "900000")
      .trim.toLong
    if (now < st.expiresAt - ttl / 2) return
    val path = leasePath(indexDir)
    // one renew body for both arms: LIVE (the file is ours by contract —
    // no legitimate takeover before expiry, so the || short-circuit
    // keeps the no-read fast path) or overrun-but-unclaimed (the
    // re-read finds our own token). Anything else means a successor
    // holds the index now.
    if (now < st.expiresAt || leaseOwnerOf(spark, path).contains(st.owner)) {
      st.expiresAt = now + ttl
      Fs.writeString(spark, path, s"owner=${st.owner}\nexpires=${st.expiresAt}")
    } else throw new IllegalStateException(
      s"maintenance lease at $indexDir was lost: this holder overran its " +
        "TTL (spark.graft.index.leaseMs) and a successor took over — " +
        "aborting before publishing anything over the successor's work. " +
        "Size the TTL above the longest maintenance pass; this entry's " +
        "staged work is unreferenced garbage the next entry's hygiene " +
        "pass clears")
  }

  /** Directory-partition columns an index layout may carry, in their
    * nesting order: the streamed folds put `batch_id=` outermost
    * (DocStream: `bands/batch_id=N/bp=X`; VecStream:
    * `lists/batch_id=N/c_id=M`; MediaStream: `bands/batch_id=N/bv=X`),
    * batch layouts use `bp=` (dedup bands) or `c_id=` (IVF lists)
    * alone. The inner columns never co-occur, so one ordered list
    * covers every layout.
    */
  private val PartitionCols = Seq("batch_id", "bp", "bv", "c_id")

  /** Which swap protocol maintenance at `indexDir` runs: POINTER on
    * stores whose rename is a non-atomic copy+delete (the
    * [[graft.util.Fs.atomicRename]] deny-list), RENAME otherwise.
    * `spark.graft.index.swapMode` overrides (`rename` / `pointer`);
    * the default `auto` trusts the deny-list — and is STICKY on layout:
    * an index that has ever pointer-swapped (its `_ptr/` directory
    * exists) stays pointer-governed under `auto` even on an
    * atomic-rename store, because its live stages now sit under `_gen/`
    * generations where the rename protocol's bare-path moves would not
    * find them. Only the explicit `rename` override bypasses the
    * stickiness (an operator migrating a layout back takes
    * responsibility for first moving the pointed generations to the
    * bare paths). Callers that want one maintenance call under a
    * specific protocol pass `swapMode` explicitly (every entry point
    * threads it here) instead of mutating the session conf — a
    * session-global toggle would silently force every concurrent
    * query in the same session into the chosen protocol.
    */
  private[graft] def pointerMode(spark: SparkSession, indexDir: String,
      swapMode: Option[String] = None): Boolean =
    swapMode.getOrElse(
        spark.conf.get("spark.graft.index.swapMode", "auto")) match {
      case "pointer" => true
      case "rename"  => false
      case _ => !Fs.atomicRename(spark, indexDir) ||
        Fs.exists(spark, s"$indexDir/_ptr")
    }

  /** Where a replacement for `stage` is STAGED before its swap:
    * `_compact/<stage>` under the rename protocol, the NEXT generation
    * directory `_gen/<stage>/gN` under the pointer protocol.
    * Deterministic while the stage's pointer is unflipped, so staging
    * writes and the subsequent [[swapStages]] derive the same target —
    * and so a crashed rewrite's retry overwrites the same (still
    * unreferenced) directory instead of leaking one per attempt.
    */
  private[graft] def stagedDir(spark: SparkSession, indexDir: String,
      stage: String, swapMode: Option[String] = None): String =
    if (pointerMode(spark, indexDir, swapMode))
      s"$indexDir/_gen/$stage/${nextGen(spark, indexDir, stage)}"
    else s"$indexDir/_compact/$stage"

  /** The generation name a pointer-mode swap of `stage` will publish:
    * the successor of the currently-pointed generation (`g1` for a
    * stage still living at its bare pre-pointer path).
    */
  private def nextGen(spark: SparkSession, indexDir: String,
      stage: String): String =
    "g" + (currentGen(spark, indexDir, stage).map(_.drop(1).toLong + 1L)
      .getOrElse(1L))

  private def currentGen(spark: SparkSession, indexDir: String,
      stage: String): Option[String] = {
    val ptr = s"$indexDir/_ptr/$stage"
    if (Fs.isFile(spark, ptr)) Some(Fs.readString(spark, ptr).trim) else None
  }

  /** The stage's CURRENT generation number — 0 for a stage that never
    * pointer-swapped (the bare pre-pointer layout counts as generation
    * zero, exactly as [[stagePathAsOf]] resolves it). What a flip's
    * caller uses to key artifacts it retains alongside the superseded
    * generation ([[VectorIndex.retrainIvf]]'s aligned-code retention).
    */
  private[graft] def liveGenNumber(spark: SparkSession, indexDir: String,
      stage: String): Long =
    currentGen(spark, indexDir, stage).map(_.drop(1).toLong).getOrElse(0L)

  /** SNAPSHOT-consistent resolution of a SET of stages — the reader-side
    * companion to the pointer protocol's flip journal. A multi-stage
    * reader ([[VectorIndex.searchIvfPq]] composes centroids + lists +
    * codes; [[DedupIndex.probe]] reads the bands scheme and then the
    * bands data) that resolves each stage pointer at a slightly
    * different instant can straddle a concurrent multi-stage flip and
    * compose NEW centroids with OLD lists — exactly the mixed-index
    * state the `_ptr/_intent` journal prevents for crash RECOVERY but
    * which per-stage [[graft.util.Fs.stagePath]] calls cannot prevent
    * for concurrent READERS. This resolver closes that window with a
    * seqlock read: (1) the intent journal must be ABSENT, (2) all
    * pointers are resolved, (3) journal absence and pointer values are
    * re-checked — any change retries. Because [[swapByPointer]] brackets
    * every multi-stage flip with the journal, a clean double-read proves
    * the set is from one side of any flip; and because flips RETAIN what
    * they supersede ([[retainGens]]), the returned paths stay readable
    * even if a flip lands right after the snapshot.
    *
    * A journal that stays up (a writer crashed mid-flip) fails the read
    * LOUDLY after ~5 s of retries — the retrain docstring's "do not
    * serve between a crash and its recovery" contract, enforced
    * mechanically instead of documented: any maintenance entry
    * ([[recoverStages]]) converges the flip and unblocks readers.
    *
    * Cost: indexes that never pointer-swapped take the one-existence-
    * probe fast path (`_ptr/` absent ⇒ bare paths, no flip possible);
    * pointer-governed indexes pay a second round of pointer reads per
    * query build — control-plane metadata, not data I/O.
    */
  private[graft] def snapshotStages(spark: SparkSession, indexDir: String,
      stages: Seq[String]): Map[String, String] = {
    def resolveAll(): Map[String, String] =
      stages.map(s => s -> Fs.stagePath(spark, indexDir, s)).toMap
    val intent = s"$indexDir/_ptr/_intent"
    var attempt = 0
    while (attempt < 100) {
      if (!Fs.exists(spark, s"$indexDir/_ptr")) {
        // never pointer-swapped: bare paths — but the absence check is
        // itself part of the seqlock (an index's FIRST pointer flip can
        // land mid-resolve, and an unvalidated fast path would compose
        // new-pointed with old-bare stages), so re-check after resolving
        val resolved = resolveAll()
        if (!Fs.exists(spark, s"$indexDir/_ptr")) return resolved
      } else if (!Fs.isFile(spark, intent)) {
        val resolved = resolveAll()
        if (!Fs.isFile(spark, intent) && resolveAll() == resolved)
          return resolved
      }
      attempt += 1
      Thread.sleep(50L)
    }
    throw new IllegalStateException(
      s"snapshot read at $indexDir: a multi-stage pointer flip has been " +
        "in flight for >5s — a maintenance writer crashed mid-swap; run " +
        "any maintenance entry (compact/recover) to converge the flip " +
        "before serving")
  }

  /** [[snapshotStages]] for a HISTORICAL read: resolve a SET of stages
    * as they were `back` pointer flips ago ([[stagePathAsOf]]), under
    * the same seqlock — a concurrent flip shifts every stage's
    * generation number, so two [[stagePathAsOf]] calls straddling it
    * would compose "back 1 from the NEW current" with "back 1 from the
    * OLD current": a mixed snapshot one flip apart. Meaningful only for
    * stages that flip TOGETHER (retrain's centroids+lists, reband's
    * bands+pairs — lockstep generations by construction); `back = 0`
    * is exactly [[snapshotStages]]. The depth bounds ([[stagePathAsOf]]
    * — no pointer, pre-history, GC'd past retention) fail loudly
    * through the lock.
    */
  private[graft] def snapshotStagesAsOf(spark: SparkSession, indexDir: String,
      stages: Seq[String], back: Int): Map[String, String] =
    snapshotStagesMixed(spark, indexDir, stages, back, Seq.empty)

  /** MIXED-DEPTH snapshot: `asOfStages` resolved `back` flips ago,
    * `liveStages` at their current paths, all under ONE seqlock pass —
    * the resolution an IVFADC historical read needs
    * ([[VectorIndex.searchIvfPqAsOf]]): the coarse pair
    * (centroids+lists) flips in lockstep and time-travels by
    * generation, while the PQ halves (codebook, codes) did NOT
    * participate in those flips — a retrain leaves them untouched (the
    * codebook is the shipped model; codes are per-vector and
    * quantizer-independent), so "the index as of the coarse flip" is
    * the old coarse pair composed with the LIVE PQ artifacts. Resolving
    * the two sets in separate seqlock rounds could straddle a flip and
    * compose a mixed snapshot; one double-checked pass cannot. The
    * historical-depth bounds fail loudly through the lock, exactly as
    * in [[snapshotStagesAsOf]].
    */
  private[graft] def snapshotStagesMixed(spark: SparkSession, indexDir: String,
      asOfStages: Seq[String], back: Int,
      liveStages: Seq[String]): Map[String, String] = {
    if (back == 0)
      return snapshotStages(spark, indexDir, asOfStages ++ liveStages)
    def resolveAll(): Map[String, String] =
      (asOfStages.map(s => s -> stagePathAsOf(spark, indexDir, s, back)) ++
        liveStages.map(s => s -> Fs.stagePath(spark, indexDir, s))).toMap
    val intent = s"$indexDir/_ptr/_intent"
    var attempt = 0
    while (attempt < 100) {
      if (!Fs.isFile(spark, intent)) {
        val resolved = resolveAll()
        if (!Fs.isFile(spark, intent) && resolveAll() == resolved)
          return resolved
      }
      attempt += 1
      Thread.sleep(50L)
    }
    throw new IllegalStateException(
      s"historical snapshot read at $indexDir: a multi-stage pointer flip " +
        "has been in flight for >5s — a maintenance writer crashed " +
        "mid-swap; run any maintenance entry (compact/recover) to " +
        "converge the flip before serving")
  }

  /** TIME-TRAVEL resolution of a single stage: the path serving the
    * stage as it was `back` pointer flips ago — what the retention
    * window ([[retainGens]]) already keeps on disk, exposed as a read.
    * `back = 0` is the live stage; `back = 1` the generation the last
    * maintenance flip superseded (the bare pre-pointer directory when
    * the index has flipped only once). Reproducibility is the use case:
    * "training run X read index snapshot Y" stays answerable, and a
    * regression introduced by a maintenance pass (a reband that shed
    * recall, a retrain over a drifted corpus) can be diffed against
    * the exact artifact it replaced — the Iceberg/Delta snapshot-read
    * idea on this layout's generation mechanics.
    *
    * Bounded by what retention kept: asking past the window (or on an
    * index that never pointer-swapped, where in-place swaps retain
    * nothing) fails LOUDLY with the knob that widens it
    * (`spark.graft.index.retainGens`). Snapshot consistency: this
    * resolves ONE stage; the journal seqlock ([[snapshotStages]])
    * covers the live set, and multi-stage historical reads are only
    * meaningful for stages flipped TOGETHER (reband's bands+pairs,
    * retrain's centroids+lists), whose generation numbers move in
    * lockstep by construction.
    */
  private[graft] def stagePathAsOf(spark: SparkSession, indexDir: String,
      stage: String, back: Int): String = {
    require(back >= 0, s"asOf($back): negative history depth")
    if (back == 0) return Fs.stagePath(spark, indexDir, stage)
    val cur = currentGen(spark, indexDir, stage).getOrElse(
      throw new IllegalArgumentException(
        s"asOf($back) for $stage at $indexDir: the stage has never " +
          "pointer-swapped, so no superseded copy exists (rename-protocol " +
          "swaps retain nothing); run maintenance under " +
          "swapMode=pointer to get retained history"))
    val n = cur.drop(1).toLong - back
    // the bare pre-pointer directory is the OLDEST possible snapshot
    // (generation zero); history does not reach before the index existed
    require(n >= 0L,
      s"asOf($back) for $stage at $indexDir: only ${cur.drop(1)} flip(s) " +
        "have ever happened — no such snapshot existed. The deepest " +
        "retained history is bounded by the retention window " +
        "(spark.graft.index.retainGens, or the layout-recorded " +
        "_maintenance/retain_gens)")
    val p = if (n == 0L) s"$indexDir/$stage" else s"$indexDir/_gen/$stage/g$n"
    require(Fs.exists(spark, p),
      s"asOf($back) for $stage at $indexDir: generation " +
        s"${if (n == 0L) "g0 (bare)" else s"g$n"} is outside the retention " +
        "window (GC'd by a later maintenance entry) — widen it via " +
        "IndexMaintenance.setRetention (layout-recorded) or " +
        "spark.graft.index.retainGens to keep deeper history")
    p
  }

  /** Rewrite each stage directory DISTINCT into O(targetFiles) files
    * (one file per partition directory when the stage is
    * directory-partitioned), staging everything under
    * `_compact/<stage>` before any swap, then swapping one stage at a
    * time and clearing `_merges/`.
    *
    * `rowFilter` (stage name, stage frame) → frame lets the caller fold
    * row REMOVALS into the rewrite — the [[Tombstones]] deletion fold
    * rides here so deletes cost no job of their own. The identity
    * default keeps plain compaction content-preserving.
    *
    * Crash safety. The rewrite is content-preserving (tombstone-folding
    * callers retire their tombstone set only AFTER this returns, so
    * "live content" means the tombstone-FILTERED view throughout — see
    * [[Tombstones]]), so correctness needs only that a READABLE copy of
    * each stage exists at every instant. The swap therefore never
    * deletes the live stage before its replacement is in place
    * ([[swapStages]]), and [[recoverStages]] (run on entry before
    * anything is read) finishes an interrupted swap from the
    * `_SUCCESS`-gated staged copy — so "a re-run simply finishes the
    * job" holds at every kill point, including mid-swap.
    *
    * Returns whether EVERY stage is fully folded afterwards. A
    * directory-partitioned stage that was EMPTY BEFORE filtering is
    * skipped (nothing to compact, nothing tombstoned — a partitionBy
    * write of zero rows would leave an unreadable `_SUCCESS`-only
    * directory, the trap every ingest fold guards) and still counts as
    * folded. A partitioned stage the FILTER empties — a takedown of
    * everything it indexed — fails LOUDLY instead: an empty partitioned
    * layout is unrepresentable, a silent skip would leave the fold
    * never able to complete (the tombstones could never retire, every
    * deleted id stuck "taken" forever), and the honest remedy for a
    * fully-deleted index is decommissioning it, not compacting it.
    */
  def compactStages(spark: SparkSession, indexDir: String,
      stages: Seq[String], targetFiles: Int,
      swapMode: Option[String] = None,
      rowFilter: (String, DataFrame) => DataFrame = (_, df) => df): Boolean =
      withLease(spark, indexDir) {
    recoverStages(spark, indexDir, stages, swapMode)
    // per stage: (swap this staged rewrite?, is the stage fully folded?)
    val results = stages.map { stage =>
      // heartbeat/fence per stage: each rewrite is a corpus-scale Spark
      // job, the part of a maintenance pass that can outlive the TTL
      fence(spark, indexDir)
      // mergeSchema: a stage whose generations straddle a schema
      // addition (e.g. the media index's plen column) must compact
      // under the UNION schema — the default single-footer sampling
      // could silently drop the newer column from the whole rewrite
      val df = spark.read.option("mergeSchema", "true")
        .parquet(Fs.stagePath(spark, indexDir, stage))
      val parts = PartitionCols.filter(df.columns.contains)
      val filtered = rowFilter(stage, df)
      // emptiness probed on the FILTERED frame (no distinct — the
      // answer is the same and the probe short-circuits at row one)
      if (parts.nonEmpty && filtered.isEmpty) {
        require(df.isEmpty,
          s"compact at $indexDir: the tombstone fold empties the " +
            s"directory-partitioned stage '$stage' — a takedown of " +
            "everything it indexed. An empty partitioned layout is " +
            "unrepresentable (a partitionBy write of zero rows is " +
            "unreadable); decommission the index (remove its " +
            "directory) instead of compacting it")
        // empty before filtering too: nothing to compact, nothing
        // tombstoned in it — skip the rewrite, counts as folded
        (stage, false, true)
      } else {
        val refiled =
          if (parts.nonEmpty)
            // Hash-cluster on the partition keys: each output directory
            // is then written by exactly one task → one file per dir.
            filtered.distinct().repartition(parts.map(col): _*)
              .write.mode(SaveMode.Overwrite).partitionBy(parts: _*)
          else
            filtered.distinct().repartition(targetFiles)
              .write.mode(SaveMode.Overwrite)
        refiled.parquet(stagedDir(spark, indexDir, stage, swapMode))
        (stage, true, true)
      }
    }
    swapStages(spark, indexDir,
      results.collect { case (s, true, _) => s }, swapMode)
    Fs.delete(spark, s"$indexDir/_compact")
    Fs.delete(spark, s"$indexDir/_merges")
    results.forall(_._3)
  }

  /** Swap each staged rewrite (`_compact/<stage>`, `_SUCCESS`-complete)
    * into place: live renamed ASIDE (`_compact/_old_<stage>`), staged
    * renamed in, aside dropped — three metadata moves, atomic on the
    * stores [[compactStages]]/[[VectorIndex.retrainIvf]] admit. Each
    * stage's swap is bracketed by an INTENT marker
    * (`_compact/_swapping_<stage>`): while it is up, [[recoverStages]]
    * treats the live path as suspect and restores from the staged copy
    * rather than trusting bare existence — which both closes the
    * partial-rename hole (an ungated object-store writer, or a test
    * simulating one) and lets a multi-stage replacement (retrain's
    * centroids + lists) converge to the staged generation at every
    * kill point instead of serving a mixed index.
    *
    * Callers whose staged content is NOT equal to the live content
    * (retrain) inherit the corresponding contract: after a mid-swap
    * crash the index must not be SERVED until a recovery pass
    * (any maintenance entry) has run — single-writer maintenance
    * windows, the assumption every marker file here already makes.
    */
  def swapStages(spark: SparkSession, indexDir: String,
      stages: Seq[String], swapMode: Option[String] = None): Unit =
    // an empty swap set (every stage skipped as empty) must be a
    // NO-OP: journaling a zero-stage flip would create `_ptr/` on an
    // index that never pointer-swapped (flipping pointerMode's sticky
    // detection) and a crash between journal write and delete would
    // block every snapshot reader behind a content-free intent
    if (stages.nonEmpty) withLease(spark, indexDir) {
      if (pointerMode(spark, indexDir, swapMode))
        swapByPointer(spark, indexDir, stages)
      else swapByRename(spark, indexDir, stages)
    }

  private def swapByRename(spark: SparkSession, indexDir: String,
      stages: Seq[String]): Unit = {
    // An explicit `rename` override on a pointer-governed layout must
    // fail LOUDLY, not silently swap the retained (stale) bare
    // directory while every reader keeps resolving through the
    // pointer: the documented migration contract is that the operator
    // first moves the pointed generations back to the bare paths AND
    // removes the pointers. Before flips retained their superseded
    // copies this misuse failed on the missing bare path; the guard
    // restores that loudness.
    stages.foreach { stage =>
      require(!Fs.isFile(spark, s"$indexDir/_ptr/$stage"),
        s"rename-protocol swap for $stage at $indexDir: the stage is " +
          "pointer-governed (_ptr/" + stage + " exists) — a rename swap " +
          "would replace the retained stale bare copy while readers keep " +
          "serving the pointed generation; migrate the layout back (move " +
          "the pointed generation to the bare path, remove the pointer) " +
          "before forcing swapMode=rename")
    }
    stages.foreach { stage =>
      require(Fs.isFile(spark, s"$indexDir/_compact/$stage/_SUCCESS"),
        s"stage swap for $stage: staged rewrite at " +
          s"$indexDir/_compact/$stage is not _SUCCESS-complete")
    }
    // SET journal, written before the first swap: a multi-stage
    // replacement whose stages are not content-equal to the live ones
    // (retrain's centroids+lists, reband's bands+pairs) must not be
    // served half-swapped, and the per-stage intent markers cannot see
    // the BETWEEN-stages crash window (stage 1 swapped and its marker
    // cleared, stage 2 untouched — every path then looks quiescent to
    // a marker-only recovery while the live set is mixed). The journal
    // names the whole set; recovery finishes any member whose staged
    // copy is still present. This is the rename-protocol analog of the
    // pointer protocol's one-file `_ptr/_intent` flip journal.
    // Fenced: the set journal is this swap's first publish — a
    // TTL-overrun holder taken over by a successor must abort here
    // rather than swap over the successor's work ([[fence]])
    fence(spark, indexDir)
    val journal = s"$indexDir/_compact/_swap_set"
    // writer-unique first line (recovery skips '#' lines): swap-set
    // journals for the SAME stage set are otherwise byte-identical
    // across maintenance entries, and [[disarmOwnJournal]]'s content
    // check could then delete a successor's live journal after a
    // fence-abort + long unwind pause. (Pointer intents are naturally
    // unique — generation numbers advance — so they need no token.)
    val journalText = s"#writer=${java.util.UUID.randomUUID()}\n" +
      stages.mkString("\n")
    Fs.writeString(spark, journal, journalText)
    var consumed = 0
    try stages.foreach { stage =>
      swapOneByRename(spark, indexDir, stage); consumed += 1
    } catch {
      case e: IllegalStateException if consumed == 0 =>
        // the per-stage fence aborted before ANY stage was touched: the
        // journal we just wrote must not stay armed — a later entry's
        // recovery would otherwise replay the zombie's staged rewrites
        // over work the successor (and any merges) did in between.
        // Disarmed only if the file is still OURS (a successor running
        // its own swap in the abort gap keeps its journal); with stages
        // already swapped the journal must STAY — recovery is then the
        // only path back to a coherent set, exactly as after a crash
        // mid-swap.
        disarmOwnJournal(spark, journal, journalText)
        throw e
    }
    Fs.delete(spark, journal)
  }

  /** Delete an intent journal this aborted swap just wrote — but only
    * if its content is still byte-equal to what we wrote: in the abort
    * gap a successor may have recovered (consuming ours) and journaled
    * its OWN swap, which must not be disarmed. An unreadable journal is
    * left in place (conservative — recovery converges it).
    */
  private[graft] def disarmOwnJournal(spark: SparkSession, journal: String,
      ourText: String): Unit = {
    val cur = try Some(Fs.readString(spark, journal))
      catch { case _: java.io.IOException => None }
    if (cur.exists(_.trim == ourText.trim)) Fs.delete(spark, journal)
  }

  private def swapOneByRename(spark: SparkSession, indexDir: String,
      stage: String): Unit = {
    val live = s"$indexDir/$stage"
    val staged = s"$indexDir/_compact/$stage"
    val aside = s"$indexDir/_compact/_old_$stage"
    val intent = s"$indexDir/_compact/_swapping_$stage"
    // fenced per stage: the rename pair mutates the LIVE path — the
    // one write a zombie absolutely must not make over a successor's
    fence(spark, indexDir)
    Fs.touch(spark, intent)
    Fs.delete(spark, aside) // a stale aside from a recovered crash
    require(Fs.rename(spark, live, aside),
      s"compact swap failed renaming $stage aside")
    require(Fs.rename(spark, staged, live),
      s"compact swap failed for $stage")
    Fs.delete(spark, aside)
    Fs.delete(spark, intent)
  }

  /** The pointer-protocol swap: each stage's staged generation (already
    * written by the caller at [[stagedDir]], `_SUCCESS`-complete) is
    * published by overwriting the stage's one-file pointer — the single
    * atomic primitive object stores provide. Before the first flip the
    * full flip set is journaled in ONE intent file (`_ptr/_intent`), so
    * a crash between a multi-stage swap's flips is converged by
    * [[recoverStages]] replaying the journal rather than serving a
    * mixed index (the rename protocol's intent-marker role, one file
    * for the whole set instead of one bracket per stage). The
    * superseded copy — the previous generation, or the bare
    * pre-pointer directory on a stage's first pointer swap — is NOT
    * dropped by the flip: it stays on disk for in-flight readers that
    * resolved the stage pre-flip ([[retainGens]]), and the next
    * maintenance entry's hygiene pass is the garbage collector.
    */
  private def swapByPointer(spark: SparkSession, indexDir: String,
      stages: Seq[String]): Unit = {
    // re-derives what stagedDir gave the caller: pointers are unflipped
    // until the loop below, so the successor generation is the same
    val plan = stages.map(s => s -> nextGen(spark, indexDir, s))
    plan.foreach { case (stage, gen) =>
      require(Fs.isFile(spark, s"$indexDir/_gen/$stage/$gen/_SUCCESS"),
        s"pointer swap for $stage: staged generation $gen is not " +
          "_SUCCESS-complete")
    }
    // Fenced: the intent journal is this flip's first publish — a
    // TTL-overrun holder taken over by a successor must abort here
    // rather than flip pointers over the successor's work ([[fence]])
    fence(spark, indexDir)
    val intent = s"$indexDir/_ptr/_intent"
    val intentText = plan.map { case (s, g) => s"$s $g" }.mkString("\n")
    Fs.writeString(spark, intent, intentText)
    try flipPointers(spark, indexDir, plan)
    catch {
      case e: IllegalStateException =>
        // the fence inside flipPointers aborted BEFORE any flip: the
        // journal we just wrote must not stay armed — a later entry's
        // recovery would otherwise replay the zombie's flips over the
        // successor's work. Disarmed only if still ours
        // ([[disarmOwnJournal]]).
        disarmOwnJournal(spark, intent, intentText)
        throw e
    }
    Fs.delete(spark, intent)
  }

  /** How many SUPERSEDED generations a stage retains after a pointer
    * flip (`spark.graft.index.retainGens`, default 1). The flip never
    * deletes what it supersedes — an in-flight reader that resolved
    * [[graft.util.Fs.stagePath]] a moment before the flip holds
    * concrete file paths into the previous copy, and at 100 TB a scan
    * spans many minutes of maintenance opportunity (the same reason
    * Iceberg/Delta keep superseded snapshots). Garbage collection is
    * deferred to the NEXT maintenance entry's hygiene pass
    * ([[recoverByPointer]]), which keeps the `retainGens` most recent
    * superseded copies per stage (the bare pre-pointer directory
    * counts as the oldest). The reader contract this buys: a read that
    * resolved its stage paths while generation N was current stays
    * readable until `retainGens` FURTHER maintenance passes have
    * entered — with the default 1, a reader is safe unless it spans
    * two whole maintenance cycles.
    */
  private[graft] def retainGens(spark: SparkSession, indexDir: String): Int =
    recordedRetention(spark, indexDir).getOrElse(
      spark.conf.get("spark.graft.index.retainGens", "1").trim.toInt).max(0)

  /** The retention window RECORDED IN THE LAYOUT, when one is — set by
    * [[setRetention]], resolved ahead of the session conf by every GC
    * decision ([[retainGens]]) so the window is a property of the
    * INDEX, not of whichever writer's session happens to run the next
    * maintenance entry: a reader planning a `back = N` historical read
    * can know what history exists without reconstructing the writer's
    * conf, and two writers with different session confs cannot GC each
    * other's promised history. A torn/corrupt file reads as unset
    * (conf fallback) — retention is a budget, not a correctness gate,
    * and the deepest-read `require` in [[stagePathAsOf]] still bounds
    * loudly.
    */
  private[graft] def recordedRetention(spark: SparkSession,
      indexDir: String): Option[Int] = {
    val rec = s"$indexDir/_maintenance/retain_gens"
    if (!Fs.isFile(spark, rec)) None
    else try Fs.readString(spark, rec).trim.toIntOption.map(_.max(0))
    catch { case _: java.io.IOException => None }
  }

  /** RECORD the index's retention window in its layout (see
    * [[recordedRetention]]). Takes effect at the NEXT maintenance
    * entry's hygiene pass — widening keeps more of the generations
    * that still exist from then on (it cannot resurrect what an
    * earlier pass already GC'd); narrowing lets the next pass GC down
    * to the new window, with the tombstone-cohort clocks following in
    * lockstep ([[Tombstones.beginFold]] re-derives its lifetime from
    * the same resolution at every GC decision). `gens = None` clears
    * the record (session conf governs again).
    */
  def setRetention(spark: SparkSession, indexDir: String,
      gens: Option[Int]): Unit = {
    val rec = s"$indexDir/_maintenance/retain_gens"
    gens match {
      case Some(g) =>
        require(g >= 0, s"setRetention($g): negative retention window")
        Fs.writeString(spark, rec, g.toString)
      case None => Fs.delete(spark, rec)
    }
  }

  /** Publish each (stage → generation) flip. The superseded copy is
    * NOT deleted here — it stays readable for in-flight readers that
    * resolved the stage pre-flip, and the next maintenance entry's
    * hygiene pass GCs beyond the [[retainGens]] retention window.
    * Idempotent — re-publishing an already-current pointer is a no-op
    * rewrite of the same content, which is what lets recovery replay a
    * journal without knowing how far the crashed swap got.
    */
  private def flipPointers(spark: SparkSession, indexDir: String,
      plan: Seq[(String, String)]): Unit = {
    // fenced again at the publish itself: covers the recovery replay
    // path too, and the gap between a swap's journal write and its
    // flips (the require loop above it can take real time at scale)
    fence(spark, indexDir)
    plan.foreach { case (stage, gen) =>
      Fs.writeString(spark, s"$indexDir/_ptr/$stage", gen)
    }
  }

  /** Restore a consistent live stage after a mid-swap kill, for each
    * stage in order. Two triggers:
    *
    *  - the stage's swap-intent marker is UP: the crash happened inside
    *    [[swapStages]]'s bracket, so bare existence of the live path
    *    proves nothing (it may be the pre-swap original, the completed
    *    swap, or — on a store that faked a rename — a partial copy).
    *    If the `_SUCCESS`-gated staged rewrite is still in `_compact/`,
    *    it is authoritative: whatever sits at the live path is dropped
    *    and staged renamed in. If staged is consumed and live exists,
    *    the staged→live move completed (renames here are atomic by the
    *    entry gate) and live IS the finished swap. If both are gone,
    *    the aside copy restores the pre-swap original. The marker and
    *    aside are then cleared.
    *  - no marker but the live path is MISSING (a crash between the two
    *    renames under the pre-marker protocol, or external damage):
    *    restore from the `_SUCCESS`-gated staged copy, else the aside.
    *
    * A live directory that exists with no marker is left untouched — a
    * half-written `_compact/<stage>` (no `_SUCCESS`) is simply
    * overwritten by the next rewrite.
    */
  def recoverStages(spark: SparkSession, indexDir: String,
      stages: Seq[String], swapMode: Option[String] = None): Unit =
    if (pointerMode(spark, indexDir, swapMode)) {
      recoverByPointer(spark, indexDir, stages)
      // BOTH protocols' journals can coexist on one layout: a pointer-
      // governed index (say, lists flipped by a pointer retrain) still
      // admits an explicit swapMode=rename compact of a stage that
      // never flipped (the rename guard is per-STAGE), and that
      // compact's crash leaves a rename set journal a pointer-mode
      // dispatch would never replay — the stale-staged-copy discard
      // hazard the merge-path convergence exists to close. One
      // existence probe converges the other journal's members too.
      if (Fs.isFile(spark, s"$indexDir/_compact/_swap_set"))
        recoverByRename(spark, indexDir, Seq.empty)
    } else {
      recoverByRename(spark, indexDir, stages)
      // symmetric (free in practice: an intent journal implies _ptr/
      // exists, which makes pointerMode sticky-true — but an explicit
      // swapMode=rename caller can still reach here with one up)
      if (Fs.isFile(spark, s"$indexDir/_ptr/_intent"))
        recoverByPointer(spark, indexDir, Seq.empty)
    }

  /** Pointer-protocol recovery: (1) an intent journal left by a crashed
    * [[swapByPointer]] is REPLAYED — every journaled generation was
    * `_SUCCESS`-verified before the journal was written, so each flip
    * is re-published idempotently and the swap completes exactly as the
    * crashed run would have; a journaled generation found missing means
    * external damage and fails loudly rather than guessing. (2) a
    * hygiene pass — the protocol's garbage collector — then drops, per
    * stage: every ABORTED rewrite (a generation staged beyond the
    * current pointer that never published — no reader ever resolved
    * it), and every SUPERSEDED copy beyond the [[retainGens]] retention
    * window (superseded generations newest-first, with the bare
    * pre-pointer directory as the oldest). Retained superseded copies
    * are what keep in-flight readers safe across the flip that
    * replaced them; the budget bounds the garbage a long maintenance
    * history can accumulate to `retainGens` copies + one aborted
    * rewrite per stage between maintenance entries.
    */
  private def recoverByPointer(spark: SparkSession, indexDir: String,
      stages: Seq[String]): Unit = {
    val intent = s"$indexDir/_ptr/_intent"
    if (Fs.isFile(spark, intent)) {
      val plan = Fs.readString(spark, intent).split("\n").toSeq
        .map(_.trim).filter(_.nonEmpty)
        .map { line =>
          val Array(s, g) = line.split(" "): @unchecked
          (s, g)
        }
      plan.foreach { case (stage, gen) =>
        require(Fs.isFile(spark, s"$indexDir/_gen/$stage/$gen/_SUCCESS"),
          s"pointer-swap recovery: journaled generation $gen for $stage is " +
            "missing or incomplete — the journal is only written after the " +
            "generation committed, so the layout has been externally damaged")
      }
      flipPointers(spark, indexDir, plan)
      Fs.delete(spark, intent)
    }
    val retain = retainGens(spark, indexDir)
    stages.foreach { stage =>
      currentGen(spark, indexDir, stage).foreach { cur =>
        val curN = cur.drop(1).toLong
        val (older, aborted) =
          Fs.listDirNames(spark, s"$indexDir/_gen/$stage")
            .filter(_ != cur)
            .partition(_.drop(1).toLong < curN)
        aborted.foreach(g => Fs.delete(spark, s"$indexDir/_gen/$stage/$g"))
        val superseded = older.sortBy(g => -g.drop(1).toLong)
        superseded.drop(retain)
          .foreach(g => Fs.delete(spark, s"$indexDir/_gen/$stage/$g"))
        // the bare pre-pointer directory is the oldest superseded copy:
        // it survives only while the newer superseded generations have
        // not yet filled the retention budget
        if (superseded.length >= retain)
          Fs.delete(spark, s"$indexDir/$stage")
        // RETAINED ALIGNED CODE copies ([[VectorIndex]] retainAligned,
        // keyed in lockstep with the lists generations) are trimmed in
        // THIS pass — the same one that GCs the lists they serve next
        // to — never at flip time, which would delete a copy one whole
        // cycle before its lists and break the in-flight-reader
        // contract. A copy whose lists are gone is never consulted
        // (the lists resolution gates first), so the windows coinciding
        // here is hygiene, not correctness.
        if (stage == "lists")
          Fs.listDirNames(spark, s"$indexDir/_gen/pq_codes_by_list")
            .filter(_.drop(1).toLong < curN - retain)
            .foreach(g =>
              Fs.delete(spark, s"$indexDir/_gen/pq_codes_by_list/$g"))
      }
    }
  }

  private def recoverByRename(spark: SparkSession, indexDir: String,
      stages: Seq[String]): Unit = {
    // a SET journal left by a crashed multi-stage [[swapByRename]]
    // names members that may not have been reached at all — recover
    // those too, even when the caller's own stage list is narrower
    // (e.g. a compactIvf running after a crashed retrain)
    val setJournal = s"$indexDir/_compact/_swap_set"
    val journaled: Seq[String] =
      if (Fs.isFile(spark, setJournal))
        Fs.readString(spark, setJournal).split("\n").toSeq
          .map(_.trim).filter(_.nonEmpty)
          // '#' lines are writer metadata (the disarm-ownership token),
          // not stage names; journals written before the token are all
          // bare stage lines and parse unchanged
          .filterNot(_.startsWith("#"))
      else Seq.empty
    (stages ++ journaled).distinct
      .foreach(stage => recoverOneByRename(spark, indexDir, stage))
    if (journaled.nonEmpty) {
      // finish any journal member whose swap never ran: its staged
      // copy is still _SUCCESS-complete in place (a member whose swap
      // completed, or that per-stage recovery just completed, has
      // consumed it) — without this pass a crash BETWEEN two stage
      // swaps would leave the set half-swapped and every marker
      // quiescent, silently serving e.g. new centroids over old lists
      journaled.foreach { stage =>
        if (Fs.isFile(spark, s"$indexDir/_compact/$stage/_SUCCESS"))
          swapOneByRename(spark, indexDir, stage)
      }
      Fs.delete(spark, setJournal)
    }
  }

  private def recoverOneByRename(spark: SparkSession, indexDir: String,
      stage: String): Unit = {
    val live = s"$indexDir/$stage"
    val staged = s"$indexDir/_compact/$stage"
    val aside = s"$indexDir/_compact/_old_$stage"
    val intent = s"$indexDir/_compact/_swapping_$stage"
    if (Fs.isFile(spark, intent)) {
      if (Fs.isFile(spark, s"$staged/_SUCCESS")) {
        Fs.delete(spark, live)
        require(Fs.rename(spark, staged, live),
          s"swap recovery failed renaming staged $stage into place")
      } else if (!Fs.exists(spark, live)) {
        require(Fs.exists(spark, aside),
          s"swap recovery for $stage: no staged, live, or aside copy — " +
            "the stage is unrecoverable from this layout")
        require(Fs.rename(spark, aside, live),
          s"swap recovery failed restoring $stage from its aside copy")
      }
      // else: staged consumed and live present — the swap completed
      Fs.delete(spark, aside)
      Fs.delete(spark, intent)
    } else if (!Fs.exists(spark, live)) {
      if (Fs.isFile(spark, s"$staged/_SUCCESS"))
        require(Fs.rename(spark, staged, live),
          s"compact recovery failed renaming staged $stage into place")
      else if (Fs.exists(spark, aside))
        require(Fs.rename(spark, aside, live),
          s"compact recovery failed restoring $stage from its aside copy")
      // else: the stage never existed — let the read fail loudly below
    }
  }
}
