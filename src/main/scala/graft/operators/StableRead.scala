package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-consistent reads over a mutable index estate — what lets a
  * PROBE run concurrently with the maintenance ops (compact / vacuum /
  * delete / merge-swap / ingest apply) and still return a CONSISTENT
  * state, never a blend and never a mid-swap IO error. Since round 18
  * the COMMIT side is multi-writer too: concurrent ops on one root
  * serialize their generation bumps through a create-exclusive claim
  * CAS and check each other for overlapping table mutations
  * (first-committer-wins optimistic concurrency — disjoint commits
  * rebase automatically, overlapping ones abort loudly; see
  * [[commitManifest]]), replacing the earlier documented single-writer
  * contract under which two racing writers silently lost a generation.
  *
  * The problem: a probe reads several table directories (postings,
  * terms, doclen, stats, tombstones) at different instants, and the
  * maintenance ops rewrite them one swap at a time
  * ([[graft.sinks.Sinks.swapByRename]] leaves each TABLE complete —
  * old or new — but the set of tables is not swapped atomically). A
  * reader overlapping a vacuum can therefore read post-delete terms
  * against pre-delete postings: each table is sound, the COMBINATION
  * is a state that never existed (the scores double-subtract the
  * doomed docs' df). The reader validates instead of locking — the
  * commit-manifest protocol (the public Delta/Iceberg commit-log
  * pattern in miniature, one generation file per index root):
  *
  *   - every mutating op brackets itself with [[withMaintenanceMarker]],
  *     which (1) drops a `_maintenance` marker before the first byte
  *     moves, (2) runs the op, (3) writes a NEW `_commit_manifest`
  *     generation, (4) removes the marker — in that order, so the
  *     manifest is always bumped before readers can re-validate;
  *   - a probe checks marker-absent, snapshots each root's ONE-FILE
  *     manifest token, runs + MATERIALIZES the probe (localCheckpoint —
  *     every table read happens inside this step), then re-checks
  *     marker-absent and re-reads the tokens. Equal tokens + no marker
  *     at either check prove no commit overlapped the reads. Unequal —
  *     or a FileNotFound/FAILED_READ_FILE from a swap window mid-read —
  *     discards the result (releasing its checkpoint blocks) and
  *     retries with exponential backoff.
  *
  * Validation therefore costs O(roots) metadata reads per probe —
  * INDEPENDENT of the estate's file count. (Rounds ≤15 fingerprinted
  * the full recursive listing instead: sound, but a per-probe double
  * O(files) walk — a driver-side bottleneck and a metadata-service
  * hammer at a 100-TB estate's millions of part files. The listing
  * [[signature]] survives only as the fallback for LEGACY roots that
  * predate the manifest; any root touched by any bracketed op carries
  * one from then on.)
  *
  * The result is always a state the estate actually passed through
  * (pre- or post-op, never a blend). [[stable]]'s optimistic reads are
  * safe, not wait-free: a writer churning maintenance continuously can
  * starve the reader past `maxAttempts` (the loop then fails loudly
  * rather than returning a torn read).
  *
  * [[pinned]] is the terminal form (round 17): every commit also
  * writes an immutable per-generation SNAPSHOT (exact per-table file
  * lists, incrementally maintained — untouched tables reuse their
  * previous entries, so commit cost is O(changed files)), and every
  * removal of committed files RETIRES them under `_retired/` instead
  * of deleting (whole-dir swaps, partition rewrites, emptied overlays;
  * [[expireRetired]] is the GC). A pinned probe resolves ONE committed
  * generation per root and reads exactly its files wherever they live
  * (live dir, retired dir, or a mid-ingest swap backup) — MVCC
  * snapshot isolation: zero validation retries, no starvation under
  * continuous churn, serving continues under a standing crashed-op
  * marker, and [[pinnedAt]] time-travels to any retained generation.
  *
  * ReaderMaintenanceRaceSpec races federated probes against live
  * compact/vacuum churn (including a zero-gap churn loop under
  * [[pinned]]) and pins every returned relation to the survivors-only
  * oracle; StableReadManifestSpec pins the commit protocol (generation
  * bumps, reentrancy, O(1) validation, snapshot exactness, retire +
  * time travel, GC horizon, checkpoint release); SnapshotParitySpec
  * drills every op family's committed snapshot against an independent
  * full re-listing.
  */
object StableRead {

  /** Name of the estate-level maintenance marker. Manifest validation
    * alone cannot catch a probe that runs ENTIRELY inside a
    * multi-table op's mutation window (e.g. after bm25Delete's terms
    * swap, before its postings rewrite: the manifest is the OLD
    * generation throughout, the COMBINATION is a blend) — so every
    * mutating op brackets itself with this marker and [[stable]]
    * refuses to validate while it exists. Removed only on SUCCESS: an
    * op that crashed or threw leaves the marker standing, which keeps
    * readers away from the partial state until the op re-runs and
    * converges (the estate's crash-window contract already requires
    * exactly that re-run).
    */
  val MarkerName = "_maintenance"

  /** Directory (under an index root) holding RETIRED table versions:
    * every physical removal of committed files — a whole-table swap, a
    * partition-level rewrite, an emptied-partition cleanup — MOVES the
    * files here (preserving their table-relative paths) instead of
    * deleting them, under `<table>__g<lastRewriteGen>`. That is what
    * makes a [[pinned]] read MVCC: a reader pinned at generation G can
    * always find every file of G's snapshot either live or retired,
    * no matter how many commits landed since. Reclaimed by
    * [[expireRetired]] (the Iceberg `expire_snapshots` role).
    */
  val RetiredDirName = "_retired"

  /** Directory holding the immutable snapshot metadata: one INDEX file
    * per committed generation (`g<N>`: per table, its `lastRewriteGen`
    * — the retired-dir name key — and which generation's SHARD carries
    * its file list) plus per-table shard files (`g<M>.<table>`: the
    * exact data-file list, written only when the table changed; later
    * generations reference it until the table changes again — the
    * Iceberg manifest-list/manifest split, so commits serialize
    * O(changed files), never the estate). Written BEFORE the manifest
    * that names the generation, so a manifest generation always has
    * its snapshot.
    */
  val SnapshotsDirName = "_snapshots"

  /** One table's pinned state inside a [[RootSnapshot]]: `files` are
    * table-relative data-file paths (partition dirs included); the
    * retired location for any of them is
    * `_retired/<table>__g<lastRewriteGen>/<relpath>`.
    */
  final case class TableSnap(lastRewriteGen: Long, files: Vector[String])

  /** A root's committed generation, resolvable to exact files. */
  final case class RootSnapshot(
      root: String, gen: Long, tables: Map[String, TableSnap])

  /** Name of the per-root commit manifest: ONE small file whose
    * content (generation counter + a random nonce) changes on every
    * committed mutation. Readers validate a probe by comparing this
    * file's content before/after — O(1) per root, never a listing.
    * Underscore-prefixed so parquet scans of sibling tables ignore it
    * (the `_maintenance` precedent).
    */
  val ManifestName = "_commit_manifest"

  /** One WRITER's per-root bracket state (round 18 — the multi-writer
    * commit protocol): nesting depth (only the outermost exit commits,
    * e.g. a vacuum's delete calling Tombstones.clear on the same root),
    * the writer token (note attribution — each concurrent writer's
    * touched-table notes drain into ITS OWN commit), and the manifest
    * generation at bracket entry (the optimistic-concurrency conflict
    * base: generations committed after it are checked for overlapping
    * table mutations at commit time).
    */
  private[graft] final class WriterState(
      val token: String, @volatile var startGen: Long) {
    val depth = new java.util.concurrent.atomic.AtomicInteger(0)
  }

  private type WriterCtx =
    java.util.concurrent.ConcurrentHashMap[String, WriterState]

  /** The calling thread's writer identities, root -> state. Op-spawned
    * worker threads inherit it via [[inheritWriterCtx]] (the
    * [[graft.operators.Retrieval.concurrently]] propagation), so notes
    * made on workers attribute to the spawning writer, not to every
    * active writer on the root.
    */
  private val bracketCtx = new ThreadLocal[WriterCtx]()

  /** Opaque capture of the current thread's writer context — pass to
    * [[inheritWriterCtx]] inside a worker thread's body. Null-safe.
    */
  private[graft] def currentWriterCtx(): AnyRef = bracketCtx.get()

  private[graft] def inheritWriterCtx[T](ctx: AnyRef)(body: => T): T = {
    val prev = bracketCtx.get()
    if (ctx == null) bracketCtx.remove()
    else bracketCtx.set(ctx.asInstanceOf[WriterCtx])
    try body
    finally {
      if (prev == null) bracketCtx.remove() else bracketCtx.set(prev)
    }
  }

  /** In-JVM refcount of ACTIVE writers per root — governs the shared
    * `_maintenance` marker file's lifecycle: created by the first
    * writer in, removed by the last writer out IF every writer
    * succeeded (a crashed writer leaves it standing — the crash-window
    * contract — and any LATER successful bracket on the root clears
    * it, exactly the pre-multi-writer convergence semantics). The
    * refcount (like the foreign-note visibility in [[writeSnapshot]])
    * is in-process state: cross-PROCESS writers each see a marker and
    * the commit CAS still serializes their generations, but a foreign
    * process's marker lifetime is not refcounted — deployments mixing
    * writer processes should route reads through [[pinned]], which
    * never consults the marker.
    */
  private val markerRefs =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Tokens of all in-JVM active writers per root. Notes from threads
    * with no inherited writer context attribute to EVERY active writer
    * (over-noting costs one extra table listing at commit; under-noting
    * would freeze a stale file list into a snapshot) — and, because an
    * unattributable mutation on a shared table is a real race, the
    * resulting conflict abort is correct conservatism.
    */
  private val activeTokens =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.Set[String]]()

  private def depthKey(path: String): String = path.stripSuffix("/")

  /** The note-map keys a mutation on `root` files under: the calling
    * thread's writer token when a bracket context is present, every
    * active writer's token otherwise, the orphan root key when no
    * writer is active at all (pre-bracket landings — drained by the
    * next committer, the legacy behavior).
    */
  private def noteKeys(root: String): Seq[String] = {
    val key = depthKey(root)
    val ctx = bracketCtx.get()
    val own =
      if (ctx == null) None else Option(ctx.get(key)).map(_.token)
    own match {
      case Some(t) => Seq(s"$key@$t")
      case None =>
        val all = Option(activeTokens.get(key))
          .map(s => scala.jdk.CollectionConverters
            .SetHasAsScala(s).asScala.toSeq)
          .getOrElse(Seq.empty)
        if (all.isEmpty) Seq(key) else all.map(t => s"$key@$t")
    }
  }

  /** The keys THIS writer's commit drains: its own token key plus the
    * orphan key. */
  private def drainKeys(root: String): Seq[String] = {
    val key = depthKey(root)
    val ctx = bracketCtx.get()
    val own =
      if (ctx == null) None else Option(ctx.get(key)).map(_.token)
    own.map(t => Seq(s"$key@$t", key)).getOrElse(Seq(key))
  }

  /** Tables whose DIRECTORY VERSION was replaced inside the current
    * bracket (a [[swapRetire]] or an ingest's stats/terms swap) — the
    * commit reads and clears this to bump those tables'
    * `lastRewriteGen` in the new snapshot. In-place mutations
    * (partition rewrites, appends) deliberately do NOT note here: their
    * retired files keep landing in the CURRENT version's retired dir,
    * which is exactly where readers pinned at any generation of that
    * version look. Crash before commit loses the note with the commit
    * itself — the re-run re-swaps and re-notes (convergence contract).
    */
  private val swappedTables =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.Set[String]]()

  private[graft] def noteSwapped(root: String, table: String): Unit = {
    noteKeys(root).foreach(k =>
      swappedTables
        .computeIfAbsent(k,
          _ => java.util.concurrent.ConcurrentHashMap.newKeySet[String]())
        .add(table))
    noteTouched(root, table)
  }

  /** Tables whose FILE SET changed inside the current bracket without a
    * dir-version swap (appends, partition rewrites, retires, overlay
    * creates) — the commit re-lists ONLY these (plus swapped and new
    * tables) and reuses the previous snapshot's entries verbatim for
    * the rest, making the snapshot write O(changed files), not O(root
    * files) — the Iceberg incremental-manifest economics. INVARIANT
    * (SnapshotParitySpec drills every op family against a full
    * re-listing): every primitive that lands or removes a file under a
    * live estate table must note here — a missed note would freeze a
    * stale file list into the next snapshot. All landings are
    * centralized (swapByRename/swapRetire, copyParquetParts(move),
    * retirePartitions/retireTree, the ingest stats/terms swap-in and
    * restore, the tombstone overlay create, bm25Append's doclen
    * append), so new operators built from those primitives inherit the
    * note for free.
    */
  private val touchedTables =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.Set[String]]()

  private[graft] def noteTouched(root: String, table: String): Unit =
    noteKeys(root).foreach(k =>
      touchedTables
        .computeIfAbsent(k,
          _ => java.util.concurrent.ConcurrentHashMap.newKeySet[String]())
        .add(table))

  /** Tables that only GAINED files this bracket, with the exact
    * table-relative paths landed (the ingest/append fast path): the
    * commit writes an APPEND-DELTA shard referencing the table's
    * standing shard instead of re-LISTING the table — O(batch) commit
    * metadata instead of O(table files), which is what keeps a
    * streaming apply FLAT against a 100x standing estate
    * (MediaScaleBench's mmapply row measured the re-listing at 2.7x
    * before this). A table noted BOTH appended and touched re-lists
    * fully (safety wins).
    */
  private val appendedFiles =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.ConcurrentHashMap[String,
        java.util.Set[String]]]()

  private[graft] def noteAppended(
      root: String, table: String, relPaths: Seq[String]): Unit =
    noteKeys(root).foreach { k =>
      val perTable = appendedFiles.computeIfAbsent(k,
        _ => new java.util.concurrent.ConcurrentHashMap[String,
          java.util.Set[String]]())
      val set = perTable.computeIfAbsent(table,
        _ => java.util.concurrent.ConcurrentHashMap.newKeySet[String]())
      relPaths.foreach(set.add)
    }

  /** Bracket a mutating estate op with the reader-isolation marker and
    * commit a new manifest generation on success. Ordering is the
    * protocol: marker up BEFORE the first mutation; manifest bumped
    * BEFORE the marker comes down — so a reader that finds the marker
    * absent at both of its checks either saw no overlapping op at all
    * or sees the new generation in its second token read. The body
    * must not use non-local `return` (it would skip the success-path
    * commit). Reentrant per root and per WRITER (thread + inherited
    * worker context, see [[WriterState]]): each concurrent writer
    * commits its OWN generation at its outermost exit, serialized by
    * the claim CAS in [[commitManifest]] and checked for overlapping
    * table mutations against every generation committed since its
    * bracket opened (first committer wins; the loser gets a loud
    * [[java.util.ConcurrentModificationException]] and must re-run
    * against the new head). On failure the marker stands (crash-window
    * contract) but the writer's depth unwinds, so an in-process re-run
    * can converge and clear it.
    */
  private[graft] def withMaintenanceMarker[T](
      spark: SparkSession, path: String)(body: => T): T = {
    val key = depthKey(path)
    val marker = new org.apache.hadoop.fs.Path(s"$path/$MarkerName")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    var ctx = bracketCtx.get()
    if (ctx == null) {
      ctx = new java.util.concurrent.ConcurrentHashMap[String, WriterState]()
      bracketCtx.set(ctx)
    }
    val st = ctx.computeIfAbsent(key,
      _ => new WriterState(java.util.UUID.randomUUID().toString, 0L))
    def teardown(success: Boolean): Unit =
      if (st.depth.decrementAndGet() == 0) {
        ctx.remove(key)
        Option(activeTokens.get(key)).foreach(_.remove(st.token))
        if (!success) {
          // a failed bracket never commits, so its token-keyed notes
          // would leak forever; the contract-mandated re-run re-does
          // the mutations and re-notes from scratch
          swappedTables.remove(s"$key@${st.token}")
          touchedTables.remove(s"$key@${st.token}")
          appendedFiles.remove(s"$key@${st.token}")
        }
        val refs = markerRefs.merge(key, -1, (a, b) => a + b)
        if (refs <= 0) markerRefs.remove(key)
        // the marker FILE comes down only when the last in-JVM writer
        // exits AND this exit is a success — a crashed writer leaves it
        // standing even at refcount 0 (crash-window contract; the next
        // successful bracket on the root clears it, as before)
        if (success && refs <= 0) fs.delete(marker, false)
      }
    if (st.depth.incrementAndGet() == 1) {
      st.startGen = readManifestGen(fs, path).getOrElse(0L)
      activeTokens
        .computeIfAbsent(key,
          _ => java.util.concurrent.ConcurrentHashMap.newKeySet[String]())
        .add(st.token)
      if (markerRefs.merge(key, 1, (a, b) => a + b) == 1)
        fs.create(marker, true).close()
    }
    val out =
      try body
      catch { case t: Throwable => teardown(success = false); throw t }
    if (st.depth.get() == 1) {
      // outermost exit: commit BEFORE the marker can come down. A
      // commit failure (a conflict abort included) tears down as a
      // crash — the marker stands and the re-run converges.
      try commitManifest(spark, path)
      catch { case t: Throwable => teardown(success = false); throw t }
    }
    teardown(success = true)
    out
  }

  /** [[withMaintenanceMarker]] over several roots at once — for ops
    * whose mutation footprint spans estates (a move-merge consumes its
    * source shards while writing the destination). Markers go up on
    * every root before the body runs; each root commits its own
    * manifest generation on success.
    */
  private[graft] def withMaintenanceMarkers[T](
      spark: SparkSession, paths: Seq[String])(body: => T): T =
    paths.distinct.foldRight(() => body) { (p, inner) =>
      () => withMaintenanceMarker(spark, p)(inner())
    }()

  /** The committed manifest generation of `path` (None = legacy root),
    * read through `fs` — the head the commit CAS race is decided on. */
  private def readManifestGen(
      fs: org.apache.hadoop.fs.FileSystem, path: String): Option[Long] =
    readManifest(fs,
      new org.apache.hadoop.fs.Path(s"$path/$ManifestName")) match {
      case Some(c) if c.endsWith("#") =>
        scala.util.Try(c.split('|')(0).toLong).toOption
      case _ => None
    }

  /** Lease (ms) on a generation claim: a `_snapshots/g<N>.claim` older
    * than this whose generation never committed is treated as a crashed
    * writer's debris and STOLEN. Round 19: the lease is no longer a
    * bound on the holder's COMMIT DURATION — a live holder HEARTBEATS
    * its claim ([[heartbeatRegister]] refreshes the mtime on a cadence
    * far inside the lease), so a commit legitimately exceeding the
    * lease (a full-relist snapshot write on a large/slow estate) keeps
    * its claim, and the lease only expires on real process death (the
    * heartbeat dies with the process). The round-18 fixed lease let a
    * stalled-but-live claimant be stolen mid-[[writeSnapshot]], after
    * which two writers wrote the same generation's snapshot and
    * manifest — a silently lost commit. Specs shorten it to drive the
    * steal path with planted (never-heartbeated) debris.
    */
  @volatile private[graft] var claimLeaseMs: Long = 10000L

  /** Cadence of the lease heartbeat — must sit well inside the
    * SHORTEST spec-shortened lease (250 ms), so a live holder's
    * claim/lock is always fresher than any lease check.
    */
  private val HeartbeatMs = 75L

  /** Claim/lock files currently held by LIVE writers in this JVM,
    * refreshed by the single daemon heartbeat thread. A file that
    * vanishes mid-touch (released concurrently, or stolen despite the
    * heartbeat) is dropped silently — the holder detects loss at its
    * own fence check, not here.
    */
  private val heartbeatFiles =
    new java.util.concurrent.ConcurrentHashMap[String,
      (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path)]()

  private lazy val heartbeatExec = {
    val ex = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => {
        val t = new Thread(r, "graft-lease-heartbeat")
        t.setDaemon(true)
        t
      })
    ex.scheduleWithFixedDelay(
      () => heartbeatFiles.forEach { (_, v) =>
        try v._1.setTimes(v._2, System.currentTimeMillis(), -1)
        catch { case _: Throwable => () }
      },
      HeartbeatMs, HeartbeatMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    ex
  }

  private[graft] def heartbeatRegister(
      fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Unit = {
    heartbeatExec // force the daemon up
    heartbeatFiles.put(p.toString, (fs, p))
  }

  private[graft] def heartbeatUnregister(p: org.apache.hadoop.fs.Path): Unit =
    heartbeatFiles.remove(p.toString)

  /** TOCTOU-safe lease steal: delete `p` only if it is still the exact
    * incarnation observed expired (same mtime) — a heartbeat (live
    * holder) or a fresh re-create (new claimant after the old one
    * released) between the expiry judgment and the delete changes the
    * mtime, and deleting THAT file would steal a LIVE claim/lock.
    * Returns true when the steal landed.
    */
  private[graft] def stealIfUnchanged(
      fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path,
      observedMtime: Long): Boolean =
    claimLock.synchronized {
      scala.util.Try(fs.getFileStatus(p)).toOption
        .exists(_.getModificationTime == observedMtime) &&
        fs.delete(p, false)
    }

  /** In-JVM guard making the claim's create-exclusive atomic between
    * threads (RawLocalFileSystem's exists+create window); cross-process
    * atomicity is the filesystem's create-no-overwrite contract. */
  private val claimLock = new Object

  private def claimPath(path: String, gen: Long): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s"$path/$SnapshotsDirName/g$gen.claim")

  private def tryClaim(
      fs: org.apache.hadoop.fs.FileSystem,
      path: String, gen: Long, token: String): Boolean =
    claimLock.synchronized {
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/$SnapshotsDirName"))
      val p = claimPath(path, gen)
      try {
        val out = fs.create(p, false) // create-exclusive: the CAS
        out.write(token.getBytes("UTF-8"))
        out.close()
        true
      } catch { case _: java.io.IOException => false }
    }

  /** Block until generation `gen`'s claim resolves: its commit lands
    * (manifest reaches `gen`), its holder releases it (abort), or its
    * lease expires and we steal it. Returns to the caller's CAS loop,
    * which re-reads the head either way.
    */
  private def awaitClaimRelease(
      fs: org.apache.hadoop.fs.FileSystem, path: String, gen: Long): Unit = {
    val p = claimPath(path, gen)
    while (readManifestGen(fs, path).getOrElse(0L) < gen) {
      val st = scala.util.Try(fs.getFileStatus(p)).toOption
      if (st.isEmpty) return // released or committed-and-cleaned
      if (System.currentTimeMillis() - st.get.getModificationTime >=
        claimLeaseMs) {
        // lease expired with no heartbeat: a DEAD claimant's debris.
        // TOCTOU-safe ([[stealIfUnchanged]]): only the observed
        // incarnation is deleted — a freshly re-created claim at the
        // same path belongs to a live writer and stays
        stealIfUnchanged(fs, p, st.get.getModificationTime)
        return
      }
      Thread.sleep(20L)
    }
  }

  /** Lease (ms) on a per-table writer lock — see [[withTableLocks]].
    * Longer than [[claimLeaseMs]] because it brackets a DATA rewrite
    * (a compact's full table pass), not a metadata-only commit; an
    * in-JVM holder always releases in `finally`, so the lease only
    * gates stealing a KILLED process's debris. Round 19: holders
    * HEARTBEAT their lock files ([[heartbeatRegister]]) — a
    * cross-process compaction legitimately spending longer than the
    * lease in its full-table rewrite (normal at the 100x tier) keeps
    * its lock; the lease expires only when the holding process dies
    * and its heartbeat stops.
    */
  @volatile private[graft] var tableLockLeaseMs: Long = 60000L

  /** Lock-file paths currently held by live writers in THIS JVM — an
    * existing lock file absent from here is a killed process's debris
    * (in-JVM failures release in `finally`), stealable after the lease.
    */
  private val jvmHeldLocks =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Per-thread reentrancy set for [[withTableLocks]]. */
  private val heldLocksCtx =
    new ThreadLocal[scala.collection.mutable.Set[String]] {
      override def initialValue(): scala.collection.mutable.Set[String] =
        scala.collection.mutable.Set.empty
    }

  /** Per-TABLE advisory writer lease — DATA-level mutual exclusion for
    * ops that land into or rewrite the SAME growing table (the
    * ingest-batch-racing-a-compaction class). The commit CAS serializes
    * metadata and the conflict check detects overlap AFTER the fact,
    * but two ops interleaving file moves on one table can still strand
    * an in-flight landing inside the other's retired version; the lock
    * closes that window while leaving disjoint-TABLE and disjoint-ROOT
    * writers fully concurrent (the rebase path stays lock-free).
    * Acquisition is in sorted table order (deadlock-free by global
    * order), reentrant per thread, released in `finally` even on
    * failure (convergence after a crash is the op's own re-run
    * contract; the lock is pure liveness). A KILLED process's lock file
    * is stolen after [[tableLockLeaseMs]].
    */
  private[graft] def withTableLocks[T](
      spark: SparkSession, root: String, tables: Seq[String])
      (body: => T): T = {
    val dir = new org.apache.hadoop.fs.Path(s"$root/_locks")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val held = heldLocksCtx.get()
    val toAcquire = tables.distinct.sorted
      .map(t => new org.apache.hadoop.fs.Path(dir, s"$t.lock"))
      .filterNot(p => held.contains(p.toString))
    val acquired = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.hadoop.fs.Path]
    try {
      toAcquire.foreach { p =>
        val key = p.toString
        var ok = false
        while (!ok) {
          ok = claimLock.synchronized {
            fs.mkdirs(dir)
            try { fs.create(p, false).close(); true }
            catch { case _: java.io.IOException => false }
          }
          if (ok) {
            jvmHeldLocks.add(key); held += key; acquired += p
            // live holders heartbeat: the lease only expires on real
            // process death, never on a long table rewrite
            heartbeatRegister(fs, p)
          }
          else if (!jvmHeldLocks.contains(key)) {
            // no live in-JVM holder: a killed process's debris (its
            // heartbeat died with it) — steal only past the lease; a
            // foreign LIVE process's lock stays fresh via its own
            // heartbeat and is never stolen
            scala.util.Try(fs.getFileStatus(p)).toOption match {
              case Some(st) if System.currentTimeMillis() -
                st.getModificationTime >= tableLockLeaseMs =>
                // TOCTOU-safe: only the observed incarnation is
                // deleted ([[stealIfUnchanged]]) — a heartbeat or a
                // fresh re-create between stat and delete means the
                // holder is live (or a new holder claimed)
                stealIfUnchanged(fs, p, st.getModificationTime)
              case Some(_) => Thread.sleep(20L)
              case None => () // vanished: retry the create immediately
            }
          } else Thread.sleep(20L)
        }
      }
      body
    } finally acquired.foreach { p =>
      heartbeatUnregister(p)
      fs.delete(p, false)
      jvmHeldLocks.remove(p.toString)
      held -= p.toString
    }
  }

  /** This writer's noted mutation set for `path` — peeked, not drained
    * (the drain belongs to the snapshot write on the success path). */
  private def peekNotes(path: String): Set[String] =
    drainKeys(path).flatMap { k =>
      Option(touchedTables.get(k)).map(s =>
        scala.jdk.CollectionConverters.SetHasAsScala(s).asScala.toSet)
        .getOrElse(Set.empty[String]) ++
        Option(appendedFiles.get(k)).map(m =>
          scala.jdk.CollectionConverters.MapHasAsScala(m)
            .asScala.keySet.toSet)
          .getOrElse(Set.empty[String])
    }.toSet

  /** The tables generation `gen`'s commit mutated — its `W|` records.
    * Pre-round-18 generations carry none and read as Some(empty)
    * (within a session that simply means no concurrent-writer history
    * to check). None = the index file is GONE or torn — which for a
    * generation at or below the committed head means the GC expired it
    * while a writer's bracket was still open: the overlap history is
    * unrecoverable, and the conflict check must FAIL the commit rather
    * than silently rebase over a possibly-overlapping commit (the
    * round-18 empty-read did exactly that).
    */
  private def readTouchedOfGen(
      fs: org.apache.hadoop.fs.FileSystem,
      path: String, gen: Long): Option[Set[String]] =
    readManifest(fs, new org.apache.hadoop.fs.Path(
      s"$path/$SnapshotsDirName/g$gen")) match {
      case Some(c) if c.split('\n').lastOption.contains("#END") =>
        Some(c.split('\n').iterator.filter(_.startsWith("W|"))
          .map(_.substring(2)).toSet)
      case _ => None
    }

  /** Commit the next manifest generation for `path` — the multi-writer
    * OPTIMISTIC CONCURRENCY protocol (round 18; the pre-CAS
    * tmp+delete+rename let two racing writers silently lose a
    * generation). Per attempt:
    *
    *   1. read the head generation G;
    *   2. CONFLICT CHECK: for every generation committed since this
    *      writer's bracket opened, intersect its `W|` mutation records
    *      with this writer's noted tables — overlap aborts loudly
    *      (first committer wins; two writers rewrote the same table, so
    *      the loser's data work is potentially torn and must re-run
    *      against the new head). Disjoint histories REBASE for free:
    *      the snapshot write reuses the head's entries for everything
    *      this writer didn't touch, which already carries the other
    *      writers' commits;
    *   3. CAS: claim `g<G+1>` by create-exclusive file, re-verify the
    *      head is still G under the claim (a claim acquired after the
    *      generation committed and cleaned up is stale), then write
    *      snapshot + manifest and release the claim. Claim held by a
    *      crashed writer? [[awaitClaimRelease]] steals it after
    *      [[claimLeaseMs]].
    *
    * The nonce makes every committed content unique even across
    * generation-counter resets (e.g. an estate restored from a copy),
    * so token equality is equivalence of commit identity, not of a
    * counter. The manifest write itself stays tmp + delete + rename —
    * safe now because only the claim holder for that generation ever
    * writes it; the brief absence window is covered by the marker the
    * caller holds, and the trailing terminator lets a reader reject a
    * torn content read outright.
    */
  private[graft] def commitManifest(
      spark: SparkSession, path: String): Unit = {
    val cur = new org.apache.hadoop.fs.Path(s"$path/$ManifestName")
    val fs = cur.getFileSystem(spark.sessionState.newHadoopConf())
    val key = depthKey(path)
    val st = Option(bracketCtx.get()).flatMap(m => Option(m.get(key)))
    val startGen = st.map(_.startGen)
      .getOrElse(readManifestGen(fs, path).getOrElse(0L))
    val token = st.map(_.token).getOrElse("unbracketed")
    val myTouched = peekNotes(path)
    while (true) {
      val head = readManifestGen(fs, path).getOrElse(0L)
      // a writer that mutated no table (a pure GC commit, a no-op
      // bracket) cannot overlap anything — skip the history walk, which
      // also keeps it immune to the GC'd-history abort below
      var g = if (myTouched.isEmpty) head + 1 else startGen + 1
      while (g <= head) {
        readTouchedOfGen(fs, path, g) match {
          case None =>
            // the generation's snapshot index is gone: GC outran this
            // open bracket and expired part of the overlap history —
            // rebasing blindly could silently override an overlapping
            // commit, so fail loudly (the op's contract-mandated re-run
            // opens a fresh bracket at the current head)
            throw new java.util.ConcurrentModificationException(
              s"estate commit conflict check at $path: generation $g " +
                s"(committed after this writer's bracket opened at " +
                s"g$startGen) has no readable snapshot index — the GC " +
                "expired it under this open bracket, so the overlap " +
                "history is unrecoverable; re-run this op against the " +
                "new head")
          case Some(touchedOfG) =>
            val overlap = myTouched.intersect(touchedOfG)
            if (overlap.nonEmpty)
              throw new java.util.ConcurrentModificationException(
                s"estate commit conflict at $path: generation $g (committed " +
                  s"after this writer's bracket opened at g$startGen) already " +
                  s"mutated table(s) ${overlap.toSeq.sorted.mkString(", ")} " +
                  "that this writer also mutated — first committer wins; " +
                  "re-run this op against the new head")
        }
        g += 1
      }
      val gen = head + 1
      if (tryClaim(fs, path, gen, token)) {
        // the holder heartbeats its claim for as long as it works under
        // it — the lease only expires on real process death, never on a
        // long snapshot write (the round-18 fixed lease stole LIVE
        // claimants mid-[[writeSnapshot]] and lost a commit)
        val cp = claimPath(path, gen)
        heartbeatRegister(fs, cp)
        var stolen = false
        try {
          // re-verify under the claim: a claim acquired for an
          // already-committed generation (its winner committed and
          // released between our head read and our claim) is stale
          if (readManifestGen(fs, path).getOrElse(0L) == head) {
            // snapshot FIRST, manifest second: a manifest generation
            // always has its snapshot (a crash between the two leaves
            // an orphan snapshot the re-run overwrites — never a
            // dangling manifest)
            writeSnapshot(fs, path, gen)
            // FENCE before the commit point: if the claim was stolen
            // despite the heartbeat (heartbeat thread death, extreme
            // clock skew), another writer may be writing this very
            // generation — back off to the CAS loop instead of racing
            // the manifest rename. The stolen claim (or its successor)
            // is not ours to release.
            if (readManifest(fs, cp).contains(token)) {
              val tmp =
                new org.apache.hadoop.fs.Path(s"$path/$ManifestName.tmp")
              val out = fs.create(tmp, true)
              out.write(
                s"$gen|${java.util.UUID.randomUUID()}|#".getBytes("UTF-8"))
              out.close()
              if (fs.exists(cur)) fs.delete(cur, false)
              require(fs.rename(tmp, cur),
                s"commitManifest: rename $tmp -> $cur failed")
              return
            } else stolen = true
          }
        } finally {
          heartbeatUnregister(cp)
          if (!stolen) fs.delete(cp, false)
        }
      } else awaitClaimRelease(fs, path, gen)
    }
  }

  /** True when `root` carries a commit manifest — the switch that turns
    * every physical-removal primitive from delete-mode to retire-mode
    * (manifest-less roots keep the legacy backup-and-delete protocol).
    */
  private[graft] def manifestManaged(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Boolean =
    root != null && fs.exists(
      new org.apache.hadoop.fs.Path(root, ManifestName))

  /** Transient sibling dirs that are NOT pinnable tables: swap backups,
    * staging/tmp trees, every `_`-prefixed house dir, and the ingest
    * batch-commit log (protocol metadata read live by recovery/fsck,
    * never by a pinned probe — every committed batch would otherwise
    * have to note its marker file).
    */
  private[graft] def isTransientName(n: String): Boolean =
    n.startsWith("_") || n.startsWith(".") || n == "ingestlog" ||
      n.endsWith("_bak") || n.endsWith("_tmp") || n.endsWith("_new")

  /** Recursive table-relative data-file listing (skips `_`/`.` files —
    * _SUCCESS and friends). */
  private[graft] def listFilesRel(
      fs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path): Vector[String] = {
    val out = Vector.newBuilder[String]
    def walk(p: org.apache.hadoop.fs.Path, prefix: String): Unit =
      fs.listStatus(p).foreach { st =>
        val n = st.getPath.getName
        if (!(n.startsWith("_") || n.startsWith("."))) {
          if (st.isDirectory) walk(st.getPath, s"$prefix$n/")
          else out += s"$prefix$n"
        }
      }
    if (fs.exists(base)) walk(base, "")
    out.result()
  }

  /** One snapshot-index entry: which generation's SHARD file carries
    * `table`'s inline file list (`srcGen` == the index's own gen for a
    * freshly-listed table). The manifest-list/manifest split: the
    * per-generation INDEX is O(tables) lines, file lists live in
    * per-table shard files (`g<srcGen>.<table>`) that untouched tables
    * SHARE across generations by reference — so a commit both LISTS
    * and WRITES only the changed tables' files.
    */
  private final case class SnapEntry(
      table: String, lrg: Long, srcGen: Long)

  /** Cap on an append-delta shard chain: past it the commit resolves
    * the full list once and writes a fresh full shard (a read resolves
    * a chain with one small file read per link, so the cap bounds both
    * read fan-out and the GC's reference walk; any rewrite — compact,
    * swap, delete — resets the chain anyway).
    */
  private val MaxShardChain = 64

  /** First line of a snapshot/shard file — header-only read, so a
    * commit deciding chain-vs-full never pays the standing shard's full
    * bytes. None when absent. */
  private def readShardHead(
      fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](512)
        val n = in.read(buf)
        if (n <= 0) None
        else {
          val s = new String(buf, 0, n, "UTF-8")
          val nl = s.indexOf('\n')
          Some(if (nl >= 0) s.substring(0, nl) else s)
        }
      } finally in.close()
    }

  /** Chain length of `table`'s shard at `srcGen`: 1 for a full shard,
    * the recorded length for an append-delta, [[MaxShardChain]] when
    * unreadable (legacy inline snapshots — forces a full re-list). */
  private def shardChainLen(
      fs: org.apache.hadoop.fs.FileSystem,
      path: String, srcGen: Long, table: String): Int =
    readShardHead(fs, new org.apache.hadoop.fs.Path(
      s"$path/$SnapshotsDirName/g$srcGen.$table")) match {
      case Some(h) if h.startsWith("3|") =>
        scala.util.Try(h.split('|')(4).toInt).getOrElse(MaxShardChain)
      case Some(h) if h.startsWith("1|") => 1
      case _ => MaxShardChain
    }

  private[graft] def atomicWrite(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path,
      name: String, content: String): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(dir, s"$name.tmp")
    val out = fs.create(tmp, true)
    out.write(content.getBytes("UTF-8"))
    out.close()
    val fin = new org.apache.hadoop.fs.Path(dir, name)
    if (fs.exists(fin)) fs.delete(fin, false) // crashed prior attempt
    require(fs.rename(tmp, fin),
      s"writeSnapshot: rename $tmp -> $fin failed")
  }

  /** Write generation `gen`'s snapshot: per table, the exact data-file
    * list and its `lastRewriteGen` ([[swappedTables]] notes bump it to
    * `gen`; new tables start at `gen`; everything else inherits).
    * Sharded + incremental: touched tables are re-listed into a fresh
    * `g<gen>.<table>` shard; untouched tables REFERENCE their standing
    * shard — the commit's metadata cost is O(tables) + O(changed
    * files), independent of the estate's total file count on both the
    * listing AND the write side. Shards first, index second, manifest
    * (the caller) last; every file is tmp-write + rename and immutable
    * once the manifest names its generation.
    */
  private def writeSnapshot(
      fs: org.apache.hadoop.fs.FileSystem,
      path: String, gen: Long): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val key = depthKey(path)
    val prev: Map[String, SnapEntry] = (readManifest(fs,
      new org.apache.hadoop.fs.Path(s"$path/$ManifestName")) match {
      case Some(c) if c.endsWith("#") =>
        scala.util.Try(c.split('|')(0).toLong).toOption
          .map(g => readSnapIndex(fs, path, g)).getOrElse(Seq.empty)
      case _ => Seq.empty
    }).map(e => e.table -> e).toMap
    def drain(m: java.util.concurrent.ConcurrentHashMap[String,
        java.util.Set[String]]): Set[String] =
      drainKeys(path).flatMap(k =>
        Option(m.remove(k)).map(s => scala.jdk.CollectionConverters
          .SetHasAsScala(s).asScala.toSet)
          .getOrElse(Set.empty[String])).toSet
    val swapped = drain(swappedTables)
    // append-only notes (exact new file paths) drain separately: their
    // tables take the delta-shard fast path below UNLESS a full-touch
    // note also exists (safety: the re-list wins)
    val appended: Map[String, Set[String]] = drainKeys(path)
      .flatMap(k => Option(appendedFiles.remove(k)).toSeq
        .flatMap(m => scala.jdk.CollectionConverters
          .MapHasAsScala(m).asScala.toSeq
          .map { case (t, s) => t -> scala.jdk.CollectionConverters
            .SetHasAsScala(s).asScala.toSet }))
      .groupMapReduce(_._1)(_._2)(_ ++ _)
    val touched = drain(touchedTables) ++ swapped
    // tables another ACTIVE writer is mutating right now: its notes are
    // visible (in-JVM), its commit has not landed. A table it CREATED
    // mid-flight must not leak into this commit's snapshot (we'd
    // publish a torn in-flight listing); a standing table it is
    // rewriting keeps its prev entry here (untouched by us), which is
    // exactly the last committed state — MVCC holds.
    val ownTokens = drainKeys(path).toSet
    val foreignTouched: Set[String] = Option(activeTokens.get(key))
      .map(s => scala.jdk.CollectionConverters.SetHasAsScala(s).asScala
        .map(t => s"$key@$t").filterNot(ownTokens.contains)
        .flatMap(k => Option(touchedTables.get(k))
          .map(v => scala.jdk.CollectionConverters
            .SetHasAsScala(v).asScala.toSet)
          .getOrElse(Set.empty[String]) ++
          Option(appendedFiles.get(k)).map(m =>
            scala.jdk.CollectionConverters.MapHasAsScala(m)
              .asScala.keySet.toSet)
            .getOrElse(Set.empty[String]))
        .toSet)
      .getOrElse(Set.empty)
    val dir = new org.apache.hadoop.fs.Path(root, SnapshotsDirName)
    fs.mkdirs(dir)
    val entries = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && !isTransientName(st.getPath.getName))
      .flatMap { st =>
        val t = st.getPath.getName
        prev.get(t) match {
          // untouched standing table: reference its standing shard —
          // no listing, no shard write (the incremental-manifest
          // economics; a no-op commit on a million-file root neither
          // lists nor serializes a single data file)
          case Some(p) if !touched.contains(t) && !appended.contains(t) =>
            Some(p)
          case None if !touched.contains(t) && !appended.contains(t) &&
              (foreignTouched.contains(t) || {
                // cross-PROCESS in-flight creation: the in-JVM note
                // visibility above cannot see it, but every ingest-class
                // writer holds the table's lease lock while landing —
                // a lock this JVM does not hold on a table we have no
                // prior entry for is a foreign writer mid-creation, and
                // publishing its half-landed listing in OUR snapshot
                // would hand pinned readers a torn relation. (A foreign
                // creator NOT using table locks remains unprotected —
                // cross-process concurrent writers outside the lock
                // discipline require disjoint roots.)
                val lock = new org.apache.hadoop.fs.Path(
                  s"$path/_locks/$t.lock")
                fs.exists(lock) && !jvmHeldLocks.contains(lock.toString)
              }) =>
            None // a concurrent writer's in-flight creation: not ours
          case Some(p) if !touched.contains(t) && appended.contains(t) &&
              shardChainLen(fs, path, p.srcGen, t) < MaxShardChain =>
            // append-only fast path: the op landed EXACTLY these files
            // and removed none, so the commit writes an O(batch)
            // APPEND-DELTA shard referencing the standing chain —
            // never listing or re-serializing the table. This is what
            // keeps a streaming apply's commit flat against a 100x
            // standing estate (MediaScaleBench mmapply; the chain
            // resets to a full shard at MaxShardChain or on any
            // rewrite).
            val files = appended(t).toSeq.sorted
            val sb = new StringBuilder(
              s"3|$gen|$t|${p.srcGen}|${shardChainLen(fs, path, p.srcGen, t) + 1}\n")
            files.foreach(f => sb.append(s"F|$f\n"))
            sb.append("#END\n")
            atomicWrite(fs, dir, s"g$gen.$t", sb.toString)
            Some(SnapEntry(t, p.lrg, gen))
          case p =>
            val lrg =
              if (swapped.contains(t)) gen
              else p.map(_.lrg).getOrElse(gen)
            val files = listFilesRel(fs, st.getPath)
            val sb = new StringBuilder(s"1|$gen|$t\n")
            files.foreach(f => sb.append(s"F|$f\n"))
            sb.append("#END\n")
            atomicWrite(fs, dir, s"g$gen.$t", sb.toString)
            Some(SnapEntry(t, lrg, gen))
        }
      }
    // header carries the commit wall-clock epoch-ms: what
    // [[readSnapshotAsOf]] resolves timestamp-addressed time travel
    // against (the Iceberg/Delta `AS OF <timestamp>` surface); parsers
    // read fields positionally, so pre-round-18 two-field headers
    // stay readable (their ts reads as absent)
    val sb = new StringBuilder(s"2|$gen|${System.currentTimeMillis()}\n")
    entries.foreach(e => sb.append(s"S|${e.table}|${e.lrg}|${e.srcGen}\n"))
    // the commit's mutation record — what a LATER concurrent committer
    // intersects its own touched set against ([[commitManifest]] step
    // 2). Includes tables that no longer exist (a retireTree'd table's
    // disappearance is a mutation a racing writer must conflict with)
    // and append-only tables (an append racing a rewrite is a real
    // overlap).
    (touched ++ appended.keySet).toSeq.sorted
      .foreach(t => sb.append(s"W|$t\n"))
    sb.append("#END\n")
    atomicWrite(fs, dir, s"g$gen", sb.toString)
  }

  /** Parse a generation's snapshot INDEX (v2 sharded `S|` lines; the
    * round-17 pre-shard inline `T|`/`F|` format reads back as
    * self-referencing entries for compatibility within a session).
    */
  private def readSnapIndex(
      fs: org.apache.hadoop.fs.FileSystem,
      path: String, gen: Long): Seq[SnapEntry] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/$SnapshotsDirName/g$gen")
    readManifest(fs, p) match {
      case Some(content) =>
        val lines = content.split('\n')
        if (lines.isEmpty || lines.last != "#END") Seq.empty
        else if (lines.head.startsWith("2|"))
          lines.iterator.drop(1).takeWhile(_ != "#END")
            .filter(_.startsWith("S|"))
            .map { l =>
              val parts = l.split('|')
              SnapEntry(parts(1), parts(2).toLong, parts(3).toLong)
            }.toSeq
        else if (lines.head.startsWith("1|"))
          lines.iterator.drop(1).takeWhile(_ != "#END")
            .filter(_.startsWith("T|"))
            .map { l =>
              val parts = l.split('|')
              SnapEntry(parts(1), parts(2).toLong, gen)
            }.toSeq
        else Seq.empty
      case None => Seq.empty
    }
  }

  /** Resolve one table's inline file list from the shard (or legacy
    * inline snapshot file) at `srcGen`. None on torn/missing content —
    * the whole snapshot then reads as absent and pinned readers fall
    * back rather than trusting a partial list.
    */
  private def readShardFiles(
      fs: org.apache.hadoop.fs.FileSystem,
      path: String, e: SnapEntry): Option[Vector[String]] = {
    val shard = new org.apache.hadoop.fs.Path(
      s"$path/$SnapshotsDirName/g${e.srcGen}.${e.table}")
    readManifest(fs, shard) match {
      case Some(content) =>
        val lines = content.split('\n')
        if (lines.isEmpty || lines.last != "#END") None
        else if (lines.head.startsWith("3|")) {
          // append-delta shard: base chain + this commit's new files
          val baseGen = scala.util.Try(
            lines.head.split('|')(3).toLong).toOption
          val own = lines.iterator.drop(1).takeWhile(_ != "#END")
            .filter(_.startsWith("F|")).map(_.substring(2)).toVector
          baseGen.flatMap(g =>
            readShardFiles(fs, path, SnapEntry(e.table, e.lrg, g))
              .map(base => (base ++ own).distinct))
        }
        else if (!lines.head.startsWith("1|")) None
        else Some(lines.iterator.drop(1).takeWhile(_ != "#END")
          .filter(_.startsWith("F|")).map(_.substring(2)).toVector)
      case None =>
        // legacy inline format: the table's files live in the g<srcGen>
        // snapshot file itself
        val inline = new org.apache.hadoop.fs.Path(
          s"$path/$SnapshotsDirName/g${e.srcGen}")
        readManifest(fs, inline).flatMap { content =>
          val lines = content.split('\n')
          if (lines.isEmpty || lines.last != "#END" ||
            !lines.head.startsWith("1|")) None
          else {
            var in = false
            val out = Vector.newBuilder[String]
            lines.iterator.drop(1).takeWhile(_ != "#END").foreach { l =>
              if (l.startsWith("T|")) in = l.split('|')(1) == e.table
              else if (in && l.startsWith("F|")) out += l.substring(2)
            }
            Some(out.result())
          }
        }
    }
  }

  /** The root's CURRENT committed snapshot (manifest generation ->
    * `_snapshots/g<N>`), None for legacy roots or a torn/missing file.
    */
  private[graft] def readSnapshotFs(
      fs: org.apache.hadoop.fs.FileSystem,
      path: String): Option[RootSnapshot] = {
    val m = new org.apache.hadoop.fs.Path(s"$path/$ManifestName")
    readManifest(fs, m) match {
      case Some(c) if c.endsWith("#") =>
        scala.util.Try(c.split('|')(0).toLong).toOption
          .flatMap(g => readSnapshotGen(fs, path, g))
      case _ => None
    }
  }

  private def readSnapshotGen(
      fs: org.apache.hadoop.fs.FileSystem,
      path: String, gen: Long): Option[RootSnapshot] = {
    val idx = readSnapIndex(fs, path, gen)
    if (idx.isEmpty) {
      // distinguish "empty estate, valid index" from "missing/torn":
      // a valid v2 index with zero tables still parses to a snapshot
      val p = new org.apache.hadoop.fs.Path(
        s"$path/$SnapshotsDirName/g$gen")
      readManifest(fs, p) match {
        case Some(c) if c.split('\n').lastOption.contains("#END") &&
          (c.startsWith("1|") || c.startsWith("2|")) =>
          Some(RootSnapshot(path, gen, Map.empty))
        case _ => None
      }
    } else {
      val resolved = idx.map(e =>
        readShardFiles(fs, path, e).map(f => e.table -> TableSnap(e.lrg, f)))
      if (resolved.exists(_.isEmpty)) None // torn shard: whole snapshot absent
      else Some(RootSnapshot(path, gen, resolved.flatten.toMap))
    }
  }

  def readSnapshot(
      spark: SparkSession, path: String): Option[RootSnapshot] = {
    val p = new org.apache.hadoop.fs.Path(path)
    readSnapshotFs(
      p.getFileSystem(spark.sessionState.newHadoopConf()), path)
  }

  /** A PAST generation's snapshot (time travel via [[pinnedAt]]) —
    * None once [[expireRetired]] reclaimed it. */
  def readSnapshotAt(
      spark: SparkSession, path: String, gen: Long): Option[RootSnapshot] = {
    val p = new org.apache.hadoop.fs.Path(path)
    readSnapshotGen(
      p.getFileSystem(spark.sessionState.newHadoopConf()), path, gen)
  }

  /** Commit wall-clock (epoch ms) of generation `gen` — from its
    * snapshot index header. None for expired generations or indexes
    * written before the timestamp field existed. */
  def snapshotCommitTime(
      spark: SparkSession, path: String, gen: Long): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(
      s"$path/$SnapshotsDirName/g$gen")
    readShardHead(
      p.getFileSystem(spark.sessionState.newHadoopConf()), p) match {
      case Some(h) if h.startsWith("2|") =>
        val parts = h.split('|')
        if (parts.length >= 3) scala.util.Try(parts(2).toLong).toOption
        else None
      case _ => None
    }
  }

  /** Timestamp-addressed time travel — the `AS OF <timestamp>` user
    * surface over [[pinnedAt]]: the newest RETAINED generation whose
    * commit landed at or before `tsMs` (commit times come from the
    * snapshot index headers, so resolution never lists data files).
    * None when no retained generation is old enough — a horizon the
    * caller must treat as GC'd history, exactly like an expired
    * [[readSnapshotAt]] pin. Orphan indexes beyond the committed head
    * (a crashed commit's debris) never resolve.
    */
  def readSnapshotAsOf(
      spark: SparkSession, path: String, tsMs: Long): Option[RootSnapshot] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val head = readManifestGen(fs, path).getOrElse(return None)
    val snapDir = new org.apache.hadoop.fs.Path(s"$path/$SnapshotsDirName")
    if (!fs.exists(snapDir)) return None
    val candidate = fs.listStatus(snapDir).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("g") && !n.contains('.'))
      .flatMap(n => scala.util.Try(n.stripPrefix("g").toLong).toOption)
      .filter(_ <= head)
      .flatMap(g => snapshotCommitTime(spark, path, g).map(g -> _))
      .filter(_._2 <= tsMs)
      .sortBy(_._1)
      .lastOption
    candidate.flatMap { case (g, _) => readSnapshotGen(fs, path, g) }
  }

  /** The generation `table`'s current directory version was created —
    * the retired-dir name key ([[TableSnap.lastRewriteGen]] of the
    * CURRENT snapshot). Tables absent from the snapshot (created inside
    * the open bracket, never committed) default to the current
    * generation: their retire target is never referenced by any
    * snapshot, so the name only needs uniqueness.
    */
  private[graft] def currentTableVersion(
      fs: org.apache.hadoop.fs.FileSystem,
      root: String, table: String): Long = currentLrgFs(fs, root, table)

  private def currentLrgFs(
      fs: org.apache.hadoop.fs.FileSystem,
      root: String, table: String): Long = {
    val m = new org.apache.hadoop.fs.Path(s"$root/$ManifestName")
    readManifest(fs, m) match {
      case Some(c) if c.endsWith("#") =>
        scala.util.Try(c.split('|')(0).toLong).toOption match {
          case Some(g) =>
            // index-only read: one small file, no shard resolution
            readSnapIndex(fs, root, g).find(_.table == table)
              .map(_.lrg).getOrElse(g)
          case None => 0L
        }
      case _ => 0L
    }
  }

  private[graft] def retiredDirOf(
      root: String, table: String, lrg: Long): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      s"$root/$RetiredDirName/${table}__g$lrg")

  /** Move `src`'s contents into `dst` preserving relative paths, then
    * drop the emptied husk. Fast path: a plain rename when `dst` does
    * not exist. Merge path (partial retires already present): per-entry
    * renames; a FILE collision keeps the existing dst file and drops
    * the src one — committed files can never collide (part-file names
    * are write-unique), so a collision is a crashed run's uncommitted
    * duplicate, and wedging recovery over junk would be worse than
    * dropping it.
    */
  private[graft] def mergeMove(
      fs: org.apache.hadoop.fs.FileSystem,
      src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Unit = {
    if (!fs.exists(src)) return
    if (!fs.exists(dst)) {
      fs.mkdirs(dst.getParent)
      if (fs.rename(src, dst)) return
    }
    fs.mkdirs(dst)
    fs.listStatus(src).foreach { st =>
      val target = new org.apache.hadoop.fs.Path(dst, st.getPath.getName)
      if (st.isDirectory) mergeMove(fs, st.getPath, target)
      else if (fs.exists(target))
        require(fs.delete(st.getPath, false),
          s"mergeMove: cannot drop duplicate ${st.getPath}")
      else require(fs.rename(st.getPath, target),
        s"mergeMove: rename ${st.getPath} -> $target failed")
    }
    fs.delete(src, true) // emptied husk (tolerates stray _SUCCESS)
  }

  /** Retire-mode table swap (manifest-managed roots): (1) MERGE the old
    * live dir into `_retired/<table>__g<lrg>` — its final immutable
    * location, where every reader pinned at a generation of that
    * version looks; (2) rename `tmp` in. The old version is at its
    * retired path BEFORE the new data becomes live, so a pinned reader
    * can never silently read the wrong version — at worst it races a
    * rename into a FileNotFound and re-resolves (bounded: a pinned
    * version moves live->retired at most once). Crash between the two
    * steps: live absent, retired complete; the re-run finds nothing to
    * merge and just swaps its rebuilt tmp in (tolerated dst-absent,
    * unlike the legacy protocol's loud refusal — absence here is a
    * recoverable crash window, not debris).
    */
  private[graft] def swapRetire(
      fs: org.apache.hadoop.fs.FileSystem,
      tmp: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Unit = {
    val root = dst.getParent.toString
    val table = dst.getName
    if (fs.exists(dst))
      mergeMove(fs, dst, retiredDirOf(root, table, currentLrgFs(fs, root, table)))
    require(fs.rename(tmp, dst),
      s"swapRetire: rename $tmp -> $dst failed")
    noteSwapped(root, table)
  }

  /** Sidecar file inside an ingest swap's `_bak` dir recording the
    * table version (lastRewriteGen) whose retired dir the bak must
    * merge into once the batch's estate COMMIT lands. Written at swap
    * time — while the pre-swap version is still the committed one —
    * because by the time the bak retires (strictly AFTER the commit,
    * round 19) the live lrg has already bumped to the new generation,
    * and merging into THAT retired dir would hide the files from every
    * reader pinned at the pre-swap generations. Underscore-prefixed so
    * data listings ([[listFilesRel]], parquet scans) ignore it.
    */
  private val RetireToName = "_retire_to"

  /** Stamp the retire destination into a just-created ingest swap
    * backup — call immediately after the `cur -> bak` rename, before
    * the new table renames in (so the lrg read here is still the
    * committed pre-swap version's).
    */
  private[graft] def stampRetireTo(
      fs: org.apache.hadoop.fs.FileSystem,
      root: String, table: String, tag: String): Unit = {
    if (!manifestManaged(fs, new org.apache.hadoop.fs.Path(root))) return
    val bak = new org.apache.hadoop.fs.Path(s"$root/${table}_${tag}_bak")
    atomicWrite(fs, bak, RetireToName,
      s"${currentLrgFs(fs, root, table)}\n")
  }

  /** Retire a COMMITTED ingest swap's backup dir — the round-19
    * DEFERRED form of the ingest protocol's backup cleanup. The bak now
    * stays in place (still restorable verbatim) until the batch's
    * estate commit lands; retiring it BEFORE the commit (round 18) made
    * the commit-conflict compensation non-convergent — by the time
    * [[commitManifest]] threw, the pre-batch tables were gone, so the
    * mandated re-delivery re-applied the batch against the
    * already-swapped tables and double-counted stats/df. Until the bak
    * retires, snapshot-pinned readers resolve its files through
    * [[readTable]]'s `<table>_*_bak` sibling scan, so serving is
    * unaffected by the deferral.
    *
    * Also the recovery form: a re-delivery (or a maintenance guard)
    * finding a bak beside a standing batch marker finishes exactly this
    * step. Destination comes from the [[stampRetireTo]] sidecar; a
    * recorded version still EQUAL to the live lrg means the swap's
    * estate commit never landed (crash between the batch marker and the
    * manifest commit), so the caller's open bracket must re-record the
    * swap — this notes it. A bumped lrg means the commit landed, and
    * noting again would wrongly re-bump (shifting where FUTURE retires
    * of the live version go — stranding pinned readers), so it stays
    * silent. Legacy baks without a sidecar fall back to the live lrg
    * (the pre-round-19 behavior, correct exactly in the not-committed
    * case that was then the only reachable one).
    */
  private[graft] def retireIngestBak(
      fs: org.apache.hadoop.fs.FileSystem,
      root: String, table: String, tag: String): Unit = {
    val bak = new org.apache.hadoop.fs.Path(s"$root/${table}_${tag}_bak")
    if (!fs.exists(bak)) return
    if (!manifestManaged(fs, new org.apache.hadoop.fs.Path(root))) {
      require(fs.delete(bak, true), s"retireIngestBak: cannot drop $bak")
      return
    }
    val sidecar = new org.apache.hadoop.fs.Path(bak, RetireToName)
    val recorded = readManifest(fs, sidecar)
      .flatMap(c => scala.util.Try(c.trim.toLong).toOption)
    val curLrg = currentLrgFs(fs, root, table)
    if (recorded.forall(_ == curLrg)) noteSwapped(root, table)
    fs.delete(sidecar, false)
    mergeMove(fs, bak, retiredDirOf(root, table, recorded.getOrElse(curLrg)))
  }

  /** Restore a NOT-yet-committed ingest swap from its backup — the
    * crash-recovery / commit-conflict-compensation inverse of the swap:
    * the live table (the batch's uncommitted new version, referenced by
    * no snapshot) drops, the bak (the pre-batch COMMITTED version)
    * renames back in. Returns true when a bak existed.
    */
  private[graft] def restoreIngestBak(
      fs: org.apache.hadoop.fs.FileSystem,
      root: String, table: String, tag: String): Boolean = {
    val bak = new org.apache.hadoop.fs.Path(s"$root/${table}_${tag}_bak")
    if (!fs.exists(bak)) return false
    fs.delete(new org.apache.hadoop.fs.Path(bak, RetireToName), false)
    val cur = new org.apache.hadoop.fs.Path(s"$root/$table")
    if (fs.exists(cur))
      require(fs.delete(cur, true), s"restoreIngestBak: cannot drop $cur")
    require(fs.rename(bak, cur), s"restoreIngestBak: restore $bak failed")
    noteTouched(root, table)
    true
  }

  /** Retire selected PARTITION directories of a live table (the
    * partition-level rewrite path: deleteRows / bm25Delete's terms
    * rewrite / ivfSplitCells' parent retirement) into the current
    * version's retired dir. In-place mutation: does NOT bump
    * lastRewriteGen — readers pinned at any generation of this version
    * keep resolving against the same retired dir, which accumulates
    * every file the version ever shed.
    */
  private[graft] def retirePartitions(
      fs: org.apache.hadoop.fs.FileSystem,
      root: String, table: String, partDirNames: Seq[String]): Unit = {
    val retired = retiredDirOf(root, table, currentLrgFs(fs, root, table))
    partDirNames.foreach { d =>
      val src = new org.apache.hadoop.fs.Path(s"$root/$table/$d")
      if (fs.exists(src))
        mergeMove(fs, src, new org.apache.hadoop.fs.Path(retired, d))
    }
    noteTouched(root, table)
  }

  /** Retire a WHOLE live table dir without replacement (the emptied
    * tombstone overlay). The table drops out of the next snapshot;
    * readers pinned before it keep finding the files retired.
    */
  private[graft] def retireTree(
      fs: org.apache.hadoop.fs.FileSystem,
      root: String, table: String): Unit = {
    val src = new org.apache.hadoop.fs.Path(s"$root/$table")
    if (fs.exists(src))
      mergeMove(fs, src, retiredDirOf(root, table, currentLrgFs(fs, root, table)))
    noteTouched(root, table)
  }

  private def readManifest(
      fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](4096)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        Some(buf.toString("UTF-8"))
      } finally in.close()
    }

  /** Current manifest generation of `path` (None = legacy root, no
    * bracketed op has committed yet). Spec/ops observability hook.
    */
  def manifestGeneration(spark: SparkSession, path: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/$ManifestName")
    readManifest(p.getFileSystem(spark.sessionState.newHadoopConf()), p)
      .filter(_.endsWith("#"))
      .flatMap(c => scala.util.Try(c.split('|')(0).toLong).toOption)
  }

  private[graft] def markerPresent(
      spark: SparkSession, roots: Seq[String]): Boolean = {
    val hconf = spark.sessionState.newHadoopConf()
    roots.exists { r =>
      val p = new org.apache.hadoop.fs.Path(s"$r/$MarkerName")
      p.getFileSystem(hconf).exists(p)
    }
  }

  /** One root's validation token: the manifest content when the root
    * has one (O(1) — one small file read), the legacy listing
    * [[signature]] otherwise. A torn manifest read (no terminator —
    * only possible mid-commit, under the writer's marker) yields a
    * never-matching token so the probe retries rather than trusting
    * partial content.
    */
  private[graft] def validationToken(
      spark: SparkSession, root: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$root/$ManifestName")
    readManifest(
      p.getFileSystem(spark.sessionState.newHadoopConf()), p) match {
      case Some(c) if c.endsWith("#") => s"M:$c"
      case Some(_) => s"TORN:${java.util.UUID.randomUUID()}"
      case None => s"S:${signature(spark, Seq(root))}"
    }
  }

  /** Filesystem-metadata fingerprint of `roots` (recursive; md5 of the
    * sorted (path, length, mtime) listing). Metadata-only — never opens
    * a file. LEGACY validation path: O(estate files) per call, kept
    * only for roots no bracketed op has committed a manifest to. A
    * root that vanishes mid-listing surfaces as the exception the
    * retry loop treats as "changed".
    */
  def signature(spark: SparkSession, roots: Seq[String]): String = {
    val hconf = spark.sessionState.newHadoopConf()
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(fs: org.apache.hadoop.fs.FileSystem,
        p: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(p).foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory) {
          // ingest STAGING trees are private to the writer — probes
          // never read them, so their churn must not invalidate (and
          // their mid-delete listing races must not abort) a read; the
          // probe-visible effects all land via renames into live tables.
          // _retired/_snapshots hold PAST generations only — live reads
          // never touch them, so their growth must not churn the token
          if (!(n.startsWith("_ingest_") && n.endsWith("_tmp")) &&
            n != RetiredDirName && n != SnapshotsDirName)
            walk(fs, st.getPath)
        } else
          entries += s"${st.getPath}|${st.getLen}|${st.getModificationTime}"
      }
    roots.sorted.foreach { r =>
      val root = new org.apache.hadoop.fs.Path(r)
      val fs = root.getFileSystem(hconf)
      if (fs.exists(root)) walk(fs, root)
      else entries += s"$r|ABSENT"
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    entries.sorted.foreach(e => md.update(e.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  private def isSwapWindowError(
      e: Throwable, pinnedScope: Boolean = false): Boolean = {
    var cur = e
    var depth = 0
    while (cur != null && depth < 16) {
      cur match {
        case _: java.io.FileNotFoundException => return true
        // the basePath clause, pinned reads ONLY and only the exact
        // exception class: a pinned read resolved files under an
        // ingest-swap bak dir that dropBak merged into _retired before
        // Spark's file index initialized — the base dir vanished
        // wholesale, surfacing as DataSource's IllegalArgumentException
        // ("Option 'basePath' must be a directory") instead of a
        // FileNotFound (observed once in ~600 raced q187 probes at
        // sf0.1); re-resolution finds the files retired. Gated on the
        // scope + type so a caller's genuine basePath-mismatch error
        // outside a pinned probe fails fast instead of being silently
        // retried and misreported as swap-window starvation.
        case iae: java.lang.IllegalArgumentException
            if pinnedScope && iae.getMessage != null &&
              iae.getMessage.contains("basePath") => return true
        case _ =>
          val m = cur.getMessage
          // the third clause: RawLocalFileSystem shells out `ls` for
          // permissions and wraps a vanished file in a bare
          // RuntimeException rather than FileNotFoundException
          if (m != null && (m.contains("FAILED_READ_FILE") ||
            m.contains("PATH_NOT_FOUND") ||
            m.contains("No such file or directory"))) return true
      }
      cur = if (cur.getCause eq cur) null else cur.getCause
      depth += 1
    }
    false
  }

  /** Release a [[stable]] result's localCheckpoint blocks immediately
    * instead of waiting for ContextCleaner GC. The retry loop calls
    * this on every DISCARDED attempt — a long-lived serving process
    * retrying under churn (the exact scenario this operator exists
    * for) must not accumulate dead cached partitions. Callers that
    * consume many probes in one session should call it on each result
    * once done (`Dataset.unpersist` is a no-op on a checkpointed frame:
    * its blocks belong to the underlying RDD, not the cache manager).
    */
  def release(df: DataFrame): Unit =
    try df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    } catch { case _: Throwable => () }

  // ---------------------------------------------------------------------
  // Snapshot-PINNED reads (MVCC): resolve a committed generation ONCE,
  // read exactly its files, never retry on churn.
  // ---------------------------------------------------------------------

  /** The calling thread's active pin set ([[pinned]] scope). Estate
    * table reads routed through [[readTable]] resolve against it;
    * maintenance ops on other threads are untouched (thread-local).
    */
  private val pinContext =
    new ThreadLocal[Map[String, RootSnapshot]]()

  private[graft] def pinnedSnapshotFor(root: String): Option[RootSnapshot] =
    Option(pinContext.get).flatMap(_.get(depthKey(root)))

  /** Pin-aware "does this estate table hold parquet data" — the
    * listing-based existence checks probes run before pruned reads.
    */
  def tableHasParquet(
      spark: SparkSession, root: String, table: String): Boolean =
    pinnedSnapshotFor(root) match {
      case Some(snap) =>
        snap.tables.get(table).exists(_.files.exists(_.endsWith(".parquet")))
      case None =>
        val p = new org.apache.hadoop.fs.Path(s"$root/$table")
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        fs.exists(p)
    }

  /** Read an estate table: the live directory when unpinned (exactly
    * today's `spark.read.parquet(root/table)`), the pinned generation's
    * EXACT file list inside a [[pinned]] scope. Pinned resolution per
    * table: files still live read from the live dir, files the estate
    * has since shed read from the version's retired dir (and, for the
    * ingest protocol's swap window, its `<table>_*_bak` siblings) — one
    * existence check plus a shed-files-bounded listing, never an
    * estate-wide walk. The two reads union under the same basePath
    * semantics, so partition columns resolve identically to a live read.
    */
  def readTable(
      spark: SparkSession, root: String, table: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame =
    pinnedSnapshotFor(root) match {
      case None => plainRead(spark, schema, s"$root/$table")
      case Some(snap) => readTableAt(spark, snap, table, schema)
    }

  private def plainRead(
      spark: SparkSession,
      schema: Option[org.apache.spark.sql.types.StructType],
      path: String, paths: Seq[String] = Seq.empty,
      basePath: Option[String] = None): DataFrame = {
    var r = spark.read
    schema.foreach(s => r = r.schema(s))
    basePath.foreach(b => r = r.option("basePath", b))
    if (paths.isEmpty) r.parquet(path) else r.parquet(paths: _*)
  }

  /** Read `table` as of an EXPLICIT snapshot — [[readTable]]'s pinned
    * branch with the snapshot passed by value: the entry the SQL
    * `VERSION AS OF` / `TIMESTAMP AS OF` rule
    * ([[graft.sql.EstateSql]]) resolves through, and the body every
    * thread-local pin delegates to.
    */
  def readTableAt(
      spark: SparkSession, snap: RootSnapshot, table: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    val root = snap.root
    val ts = snap.tables.getOrElse(table, TableSnap(0L, Vector.empty))
    if (ts.files.isEmpty) schema match {
      case Some(s) =>
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), s)
      case None =>
        // the pinned generation holds ZERO files for this table:
        // reading the live directory here would leak post-pin rows
        // (a snapshot-isolation breach on exactly the path pinned()
        // exists to close). Infer the schema from the live dir's
        // parquet footers — METADATA only, no row can leak — and
        // return an empty relation; a table absent live too
        // surfaces the natural path-not-found / unable-to-infer
        // error, unchanged from a live read.
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          plainRead(spark, None, s"$root/$table").schema)
    } else {
      val rootP = new org.apache.hadoop.fs.Path(root)
      val fs = rootP.getFileSystem(spark.sessionState.newHadoopConf())
      val live = s"$root/$table"
      // shed-file locations, priority order: the immutable retired
      // dir, then any in-flight ingest-swap backup siblings
      val shed = scala.collection.mutable.Map.empty[String, String]
      val retired = retiredDirOf(root, table, ts.lastRewriteGen)
      if (fs.exists(retired))
        listFilesRel(fs, retired)
          .foreach(f => shed.getOrElseUpdate(f, retired.toString))
      fs.listStatus(rootP).foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory && n.startsWith(s"${table}_") &&
          n.endsWith("_bak"))
          listFilesRel(fs, st.getPath)
            .foreach(f => shed.getOrElseUpdate(f, st.getPath.toString))
      }
      val byBase = ts.files.groupBy(f => shed.getOrElse(f, live))
      byBase.toSeq.sortBy(_._1).map { case (base, files) =>
        plainRead(spark, schema, "", files.map(f => s"$base/$f"),
          basePath = Some(base))
      }.reduce(_.unionByName(_))
    }
  }

  /** [[Tombstones.read]]-shaped variant: None when the table is absent
    * or holds no parquet data under the active resolution.
    */
  def readTableOpt(
      spark: SparkSession, root: String, table: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : Option[DataFrame] =
    if (tableHasParquet(spark, root, table))
      Some(readTable(spark, root, table, schema))
    else None

  /** Run `probe` against ONE pinned committed generation per root —
    * MVCC snapshot isolation, the terminal form of [[stable]]: the
    * generation is resolved ONCE (manifest -> snapshot, O(roots) small
    * reads), every estate table read inside the probe resolves to that
    * generation's exact files ([[readTable]]), and the result holds no
    * matter how many commits land concurrently — ZERO validation
    * retries, no starvation under continuous churn, and no marker
    * sensitivity (a standing `_maintenance` marker — even a crashed
    * op's — does not block serving the last COMMITTED generation; the
    * partial state is unreachable by construction). The bounded retry
    * loop exists only for the live->retired rename race: a file can
    * move at most twice per pinned version (live -> swap-bak ->
    * retired), so re-resolution converges in a handful of attempts
    * regardless of writer cadence — unlike [[stable]]'s unbounded
    * optimistic conflict. Falls back to [[stable]] for legacy roots
    * without a committed snapshot. Caller owns [[release]] of the
    * returned checkpoint, as with [[stable]].
    */
  def pinned(
      spark: SparkSession,
      roots: Seq[String],
      maxAttempts: Int = 8)(probe: => DataFrame): DataFrame = {
    require(roots.nonEmpty, "StableRead.pinned: need >= 1 root")
    val snaps = roots.distinct.map(r => r -> readSnapshot(spark, r))
    if (snaps.exists(_._2.isEmpty))
      return stable(spark, roots)(probe) // legacy root(s): validate-retry
    pinnedAt(spark, snaps.map(_._2.get), maxAttempts)(probe)
  }

  /** [[pinned]] against EXPLICIT snapshots — time travel: any
    * generation still inside the [[expireRetired]] retention horizon is
    * readable (resolve it once via [[readSnapshot]] — or keep an old
    * [[RootSnapshot]] around — and probe it later, across any number of
    * commits). Also the MVCC long-reader primitive: a consumer holding
    * a snapshot sees one frozen estate across many probes.
    */
  def pinnedAt(
      spark: SparkSession,
      snaps: Seq[RootSnapshot],
      maxAttempts: Int = 8)(probe: => DataFrame): DataFrame = {
    require(snaps.nonEmpty, "StableRead.pinnedAt: need >= 1 snapshot")
    val ctx = snaps.map(s => depthKey(s.root) -> s).toMap
    var attempt = 0
    var sleepMs = 25L
    var lastErr: Throwable = null
    while (attempt < maxAttempts) {
      attempt += 1
      val prev = pinContext.get
      pinContext.set(ctx)
      try {
        return probe.localCheckpoint(true)
      } catch {
        case e: Throwable if isSwapWindowError(e, pinnedScope = true) =>
          lastErr = e
          Thread.sleep(sleepMs)
          sleepMs = math.min(sleepMs * 2, 500L)
      } finally {
        if (prev == null) pinContext.remove() else pinContext.set(prev)
      }
    }
    throw new IllegalStateException(
      s"StableRead.pinnedAt: pinned read failed $maxAttempts times at " +
        s"${snaps.map(s => s"${s.root}@g${s.gen}").mkString(", ")} — a " +
        "pinned file vanished beyond the rename races (was the retention " +
        "horizon GC'd under a live reader? see expireRetired)", lastErr)
  }

  /** Reclaim retired table versions and snapshot files no retained
    * generation references — the estate's `expire_snapshots`. Keeps the
    * newest `keepGenerations` snapshots (and everything they pin);
    * deletes retired dirs `<table>__g<X>` only when NO kept snapshot
    * has that (table, lastRewriteGen) pair. Contract: readers must not
    * pin longer than the retention horizon — a probe overlapping the GC
    * of its own generation fails loudly ([[pinned]]'s terminal error),
    * never silently. Single-writer op: run it in the maintenance
    * window, bracketed like any mutation.
    */
  /** Bracketed retention GC — [[expireRetired]] run as the mutation it
    * is (marker up, generation committed): the maintenance-window
    * entry point. The compacts and vacuums call it when given a
    * `gcKeepGenerations` horizon, so a long-lived estate's `_retired/`
    * and `_snapshots/` stay bounded by the horizon instead of growing
    * with every mutation forever (the Iceberg
    * `expire_snapshots`-in-maintenance cadence). In-horizon pinned
    * readers are untouched (their generations' files stay live or
    * kept-retired — GcRetentionSpec pins a reader surviving a
    * concurrent GC); past-horizon pins fail LOUDLY at read
    * ([[pinnedAt]]'s terminal error, gated by q202).
    */
  def gc(spark: SparkSession, root: String, keepGenerations: Int): Long =
    withMaintenanceMarker(spark, root) {
      expireRetired(spark, root, keepGenerations)
    }

  def expireRetired(
      spark: SparkSession, root: String,
      keepGenerations: Int = 2): Long = {
    require(keepGenerations >= 1,
      s"expireRetired: keepGenerations must be >= 1, got $keepGenerations")
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sessionState.newHadoopConf())
    val curGen = manifestGeneration(spark, root).getOrElse(return 0L)
    val minKept = math.max(1L, curGen - keepGenerations + 1)
    val kept = (minKept to curGen)
      .flatMap(g => readSnapshotGen(fs, root, g))
    val referenced: Set[String] = kept
      .flatMap(_.tables.map { case (t, ts) => s"${t}__g${ts.lastRewriteGen}" })
      .toSet
    var removed = 0L
    val retiredRoot = new org.apache.hadoop.fs.Path(
      s"$root/$RetiredDirName")
    if (fs.exists(retiredRoot))
      fs.listStatus(retiredRoot).foreach { st =>
        if (!referenced.contains(st.getPath.getName)) {
          require(fs.delete(st.getPath, true),
            s"expireRetired: cannot drop ${st.getPath}")
          removed += 1
        }
      }
    val snapRoot = new org.apache.hadoop.fs.Path(
      s"$root/$SnapshotsDirName")
    if (fs.exists(snapRoot)) {
      // shards are SHARED across generations by reference — and an
      // append-DELTA shard references its whole base chain: keep the
      // transitive closure, drop expired indexes and orphaned shards
      val referencedShards: Set[String] = (minKept to curGen)
        .flatMap(g => readSnapIndex(fs, root, g))
        .flatMap { e =>
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var g = e.srcGen
          var guard = 0
          while (g >= 0 && guard <= MaxShardChain) {
            out += s"g$g.${e.table}"
            g = readShardHead(fs, new org.apache.hadoop.fs.Path(
              s"$root/$SnapshotsDirName/g$g.${e.table}")) match {
              case Some(h) if h.startsWith("3|") =>
                scala.util.Try(h.split('|')(3).toLong).getOrElse(-1L)
              case _ => -1L
            }
            guard += 1
          }
          out
        }
        .toSet
      fs.listStatus(snapRoot).foreach { st =>
        val n = st.getPath.getName
        val genOf = scala.util.Try(
          n.stripPrefix("g").takeWhile(_ != '.').toLong).toOption
        val isIndex = n.startsWith("g") && !n.contains('.')
        val isShard = n.startsWith("g") && n.contains('.') &&
          !n.endsWith(".tmp")
        if (isIndex && genOf.exists(_ < minKept))
          fs.delete(st.getPath, false)
        else if (isShard && genOf.exists(_ < minKept) &&
          !referencedShards.contains(n))
          fs.delete(st.getPath, false)
      }
    }
    removed
  }

  // ---------------------------------------------------------------------
  // Maintenance POLICY (round 19): threshold-triggered compact + GC, so
  // retention cadence is a property of the estate, not caller
  // discipline.
  // ---------------------------------------------------------------------

  /** Longest append-delta shard chain among the head snapshot's tables
    * — the cheap policy signal: chains grow one link per append-only
    * commit and reset on any rewrite, so length is a direct proxy for
    * "appends since the last compact" and bounds both the probe-side
    * shard fan-in and the small-file count. Header-only reads (one per
    * chain link of the longest table), never a data listing. 0 for an
    * uncommitted root; [[MaxShardChain]] for unreadable/legacy shards.
    */
  def maxShardChainLen(spark: SparkSession, root: String): Int = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    readManifestGen(fs, root) match {
      case None => 0
      case Some(g) =>
        val lens = readSnapIndex(fs, root, g)
          .map(e => shardChainLen(fs, root, e.srcGen, e.table))
        if (lens.isEmpty) 0 else lens.max
    }
  }

  /** Total bytes parked under `_retired/` — the other policy signal
    * (the MVCC retire-not-delete discipline grows it until a GC). */
  def retiredBytes(spark: SparkSession, root: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$root/$RetiredDirName")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0L else fs.getContentSummary(p).getLength
  }

  /** Threshold-triggered maintenance — retention cadence as an estate
    * PROPERTY instead of caller discipline (round 19; round 18 added
    * `gcKeepGenerations` to the compacts/vacuums but left WHEN to the
    * caller). Checks two cheap signals — the longest append-delta
    * chain (>= `chainThreshold`, default half [[MaxShardChain]]) and
    * the retired-bytes footprint (> `retiredBytesBudget`) — and when
    * either trips runs the caller's `compact` (the family-specific
    * consolidation, e.g. `() => Retrieval.bm25Compact(spark, root)`;
    * compacts reset every chain and take their own table locks, so a
    * policy firing concurrently with a live writer WAITS on the locks
    * exactly like any maintenance op — EstatePolicySpec races it) and
    * then [[gc]] at `keepGenerations`. Wire it after a stream sink's
    * batch or on any idle tick; below thresholds it is two metadata
    * reads and a None. Returns the firing reason, None when idle.
    */
  def autoMaintain(
      spark: SparkSession,
      root: String,
      compact: () => Unit,
      keepGenerations: Int = 2,
      chainThreshold: Int = MaxShardChain / 2,
      retiredBytesBudget: Long = 256L << 20): Option[String] = {
    require(chainThreshold >= 1 && keepGenerations >= 1,
      s"autoMaintain: bad thresholds (chain=$chainThreshold, " +
        s"keep=$keepGenerations)")
    val chain = maxShardChainLen(spark, root)
    val bytes = retiredBytes(spark, root)
    val reason =
      if (chain >= chainThreshold)
        Some(s"chain=$chain >= $chainThreshold")
      else if (bytes > retiredBytesBudget)
        Some(s"retired=${bytes}B > ${retiredBytesBudget}B")
      else None
    reason.foreach { _ =>
      compact()
      gc(spark, root, keepGenerations)
    }
    reason
  }

  // ---------------------------------------------------------------------
  // Composite (cross-artifact) commits: one PARENT root records, per
  // generation, a consistent (child root -> child generation) CUT.
  // ---------------------------------------------------------------------

  /** Commit a composite generation at `parent` recording each child
    * estate's CURRENT committed generation — the cross-artifact
    * atomic-visibility seam for COMPOSED pipelines (round 19; the
    * round-18 verdict's #2): a curate-then-index sink commits the
    * registry and the index exactly-once EACH, but no single snapshot
    * spanned the two roots, so a pinned reader could observe the
    * registry at generation N with the index still at N-1. The parent
    * commit, written strictly AFTER both children's commits land (the
    * composed sink's tail), names one (root -> generation) pair per
    * child — a cut that simultaneously existed — and
    * [[pinnedComposite]] serves it no matter how many batches churn
    * the children afterwards.
    *
    * Same claim-CAS + heartbeat + fence protocol as [[commitManifest]];
    * no conflict check — a composite commit mutates no table, it only
    * RECORDS the children's heads, so racing recorders serialize into
    * distinct generations and each cut is individually consistent
    * (consistency comes from the caller's contract: commit while no
    * child mutation can land between the head reads — e.g. from the
    * one foreachBatch thread that just committed both children).
    * Parent snapshot format: header `4|gen|epochMs`, one
    * `R|<childRoot>|<childGen>` line per child, `#END`. Returns the
    * committed parent generation.
    */
  def commitComposite(
      spark: SparkSession, parent: String, children: Seq[String]): Long = {
    require(children.nonEmpty, "commitComposite: need >= 1 child root")
    val parentP = new org.apache.hadoop.fs.Path(parent)
    val fs = parentP.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(parentP)
    val cut = children.distinct.sorted.map { c =>
      val g = manifestGeneration(spark, c).getOrElse(
        throw new IllegalStateException(
          s"commitComposite: child $c carries no committed generation — " +
            "composite cuts record committed estates only"))
      c -> g
    }
    val token = java.util.UUID.randomUUID().toString
    val cur = new org.apache.hadoop.fs.Path(s"$parent/$ManifestName")
    while (true) {
      val head = readManifestGen(fs, parent).getOrElse(0L)
      val gen = head + 1
      if (tryClaim(fs, parent, gen, token)) {
        val cp = claimPath(parent, gen)
        heartbeatRegister(fs, cp)
        var stolen = false
        try {
          if (readManifestGen(fs, parent).getOrElse(0L) == head) {
            val sb = new StringBuilder(
              s"4|$gen|${System.currentTimeMillis()}\n")
            cut.foreach { case (c, g) => sb.append(s"R|$c|$g\n") }
            sb.append("#END\n")
            atomicWrite(fs,
              new org.apache.hadoop.fs.Path(s"$parent/$SnapshotsDirName"),
              s"g$gen", sb.toString)
            if (readManifest(fs, cp).contains(token)) {
              val tmp =
                new org.apache.hadoop.fs.Path(s"$parent/$ManifestName.tmp")
              val out = fs.create(tmp, true)
              out.write(
                s"$gen|${java.util.UUID.randomUUID()}|#".getBytes("UTF-8"))
              out.close()
              if (fs.exists(cur)) fs.delete(cur, false)
              require(fs.rename(tmp, cur),
                s"commitComposite: rename $tmp -> $cur failed")
              return gen
            } else stolen = true
          }
        } finally {
          heartbeatUnregister(cp)
          if (!stolen) fs.delete(cp, false)
        }
      } else awaitClaimRelease(fs, parent, gen)
    }
    0L // unreachable
  }

  /** The (child root, child generation) cut recorded at parent
    * generation `gen` (None = the current head). None when the parent
    * has no committed generation, the named one expired, or the file is
    * torn/not a composite snapshot.
    */
  def readCompositeCut(
      spark: SparkSession, parent: String,
      gen: Option[Long] = None): Option[Seq[(String, Long)]] = {
    val fs = new org.apache.hadoop.fs.Path(parent)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val g = gen.orElse(readManifestGen(fs, parent))
      .getOrElse(return None)
    readManifest(fs, new org.apache.hadoop.fs.Path(
      s"$parent/$SnapshotsDirName/g$g")) match {
      case Some(c) if c.split('\n').lastOption.contains("#END") &&
          c.startsWith("4|") =>
        Some(c.split('\n').iterator.filter(_.startsWith("R|")).map { l =>
          val p = l.split('|')
          (p(1), p(2).toLong)
        }.toSeq)
      case _ => None
    }
  }

  /** Run `probe` against ONE composite cut — every child estate pinned
    * at the generation the parent's commit recorded, so a composed
    * probe (registry membership + index scoring) reads a
    * CROSS-ARTIFACT-CONSISTENT state even while a streaming
    * curate-then-index sink churns both roots. `gen` = None serves the
    * newest cut; an explicit generation time-travels (the [[pinnedAt]]
    * semantics, spanning roots). Fails LOUDLY when a child generation
    * expired past its retention horizon — never a silently-nearest
    * state (the q202 GC-teeth contract).
    */
  def pinnedComposite(
      spark: SparkSession, parent: String,
      gen: Option[Long] = None,
      maxAttempts: Int = 8)(probe: => DataFrame): DataFrame = {
    val cut = readCompositeCut(spark, parent, gen).getOrElse(
      throw new IllegalStateException(
        s"pinnedComposite: no composite cut at $parent" +
          gen.map(g => s" generation $g").getOrElse("") +
          " — commit one with commitComposite (or the cut expired)"))
    val snaps = cut.map { case (root, g) =>
      readSnapshotAt(spark, root, g).getOrElse(
        throw new IllegalStateException(
          s"pinnedComposite: child $root@g$g of the cut is no longer " +
            "resolvable — its estate GC'd the generation past the " +
            "retention horizon (raise gcKeepGenerations or pin sooner)"))
    }
    pinnedAt(spark, snaps, maxAttempts)(probe)
  }

  /** Reclaim parent composite generations older than the newest
    * `keepGenerations` — the parent-side retention cadence (children
    * GC their own estates; an expired CHILD generation already fails
    * loudly at [[pinnedComposite]]). Returns generations removed.
    */
  def compositeGc(
      spark: SparkSession, parent: String, keepGenerations: Int): Long = {
    require(keepGenerations >= 1,
      s"compositeGc: keepGenerations must be >= 1, got $keepGenerations")
    val fs = new org.apache.hadoop.fs.Path(parent)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val head = readManifestGen(fs, parent).getOrElse(return 0L)
    val minKept = math.max(1L, head - keepGenerations + 1)
    val dir = new org.apache.hadoop.fs.Path(s"$parent/$SnapshotsDirName")
    if (!fs.exists(dir)) return 0L
    var removed = 0L
    fs.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("g") && !n.contains('.') &&
        scala.util.Try(n.stripPrefix("g").toLong).toOption
          .exists(_ < minKept)) {
        fs.delete(st.getPath, false)
        removed += 1
      }
    }
    removed
  }

  /** Run `probe` against the index roots until it reads one consistent
    * state, and return it MATERIALIZED (localCheckpoint). `probe` is
    * re-evaluated from scratch on every attempt (driver-side stats
    * reads included — a swap can also race those). Failed attempts
    * back off exponentially (25 ms doubling to a 1 s cap — also on the
    * swap-window-exception path), so the default budget rides out
    * seconds of maintenance churn instead of spinning through it.
    */
  def stable(
      spark: SparkSession,
      roots: Seq[String],
      maxAttempts: Int = 12)(probe: => DataFrame): DataFrame = {
    require(roots.nonEmpty, "StableRead.stable: need >= 1 root")
    val sortedRoots = roots.sorted
    var attempt = 0
    var sleepMs = 25L
    def backoff(): Unit = {
      Thread.sleep(sleepMs)
      sleepMs = math.min(sleepMs * 2, 1000L)
    }
    while (attempt < maxAttempts) {
      attempt += 1
      var out: DataFrame = null
      try {
        if (!markerPresent(spark, roots)) {
          val before = sortedRoots.map(r => validationToken(spark, r))
          out = probe.localCheckpoint(true)
          // order matters: marker first, tokens second — a writer that
          // slipped in after the marker check has already bumped its
          // manifest (commit-before-unmark), so the token read sees it;
          // a marker that appeared mid-probe is caught directly
          if (!markerPresent(spark, roots) &&
            sortedRoots.map(r => validationToken(spark, r)) == before)
            return out
          release(out)
          out = null
        }
        // torn window: some root committed while the probe
        // materialized, or a maintenance op holds the marker — back off
        // so a churning writer's gaps become reachable
        backoff()
      } catch {
        case e: Throwable if isSwapWindowError(e) => // swap mid-read
          if (out != null) release(out)
          backoff()
      }
    }
    throw new IllegalStateException(
      s"StableRead.stable: no consistent read in $maxAttempts attempts — " +
        s"the estate at ${roots.mkString(", ")} is under continuous " +
        "maintenance churn; probe inside a maintenance window or raise " +
        "maxAttempts")
  }
}
