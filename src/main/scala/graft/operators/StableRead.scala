package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-consistent reads over a mutable index estate — what lets a
  * PROBE run concurrently with the single-writer maintenance ops
  * (compact / vacuum / delete / merge-swap / ingest apply) and still
  * return a CONSISTENT state, never a blend and never a mid-swap IO
  * error.
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
  * (pre- or post-op, never a blend). Optimistic reads are safe, not
  * wait-free: a writer churning maintenance continuously can starve
  * the reader past `maxAttempts` (the loop then fails loudly rather
  * than returning a torn read) — production serving schedules
  * maintenance in windows exactly as the single-writer contract
  * already requires for writers; this makes the READER side of that
  * window honest. ReaderMaintenanceRaceSpec races federated probes
  * against live compact/vacuum churn and pins every returned relation
  * to the survivors-only oracle; StableReadManifestSpec pins the
  * commit protocol itself (generation bumps, reentrancy, O(1)
  * validation, checkpoint release).
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

  /** Name of the per-root commit manifest: ONE small file whose
    * content (generation counter + a random nonce) changes on every
    * committed mutation. Readers validate a probe by comparing this
    * file's content before/after — O(1) per root, never a listing.
    * Underscore-prefixed so parquet scans of sibling tables ignore it
    * (the `_maintenance` precedent).
    */
  val ManifestName = "_commit_manifest"

  /** In-process reentrancy depths for nested [[withMaintenanceMarker]]
    * brackets (e.g. a vacuum's delete calling Tombstones.clear on the
    * same root): only the OUTERMOST exit commits the manifest and
    * removes the marker. Cross-process nesting cannot occur — the
    * estate's single-writer contract already forbids two concurrent
    * mutators per root.
    */
  private val markerDepth =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  private def depthKey(path: String): String = path.stripSuffix("/")

  /** Bracket a mutating estate op with the reader-isolation marker and
    * commit a new manifest generation on success. Ordering is the
    * protocol: marker up BEFORE the first mutation; manifest bumped
    * BEFORE the marker comes down — so a reader that finds the marker
    * absent at both of its checks either saw no overlapping op at all
    * or sees the new generation in its second token read. The body
    * must not use non-local `return` (it would skip the success-path
    * commit). Reentrant per root (see [[markerDepth]]); on failure the
    * marker stands (crash-window contract) but the depth unwinds, so
    * an in-process re-run can converge and clear it.
    */
  private[graft] def withMaintenanceMarker[T](
      spark: SparkSession, path: String)(body: => T): T = {
    val key = depthKey(path)
    val marker = new org.apache.hadoop.fs.Path(s"$path/$MarkerName")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    val depth = markerDepth.merge(key, 1, (a, b) => a + b)
    if (depth == 1) fs.create(marker, true).close()
    val out =
      try body
      catch {
        case t: Throwable =>
          if (markerDepth.merge(key, -1, (a, b) => a + b) == 0)
            markerDepth.remove(key) // marker file stays standing
          throw t
      }
    if (markerDepth.merge(key, -1, (a, b) => a + b) == 0) {
      markerDepth.remove(key)
      commitManifest(spark, path)
      fs.delete(marker, false)
    }
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

  /** Write the next manifest generation for `path`. The nonce makes
    * every committed content unique even across generation-counter
    * resets (e.g. an estate restored from a copy), so token equality
    * is equivalence of commit identity, not of a counter. Write is
    * tmp + delete + rename; the brief absence window is covered by the
    * marker the caller holds (readers refuse to validate under it),
    * and the trailing terminator lets a reader reject a torn content
    * read outright.
    */
  private[graft] def commitManifest(
      spark: SparkSession, path: String): Unit = {
    val cur = new org.apache.hadoop.fs.Path(s"$path/$ManifestName")
    val fs = cur.getFileSystem(spark.sessionState.newHadoopConf())
    val gen = readManifest(fs, cur) match {
      case Some(c) if c.endsWith("#") =>
        scala.util.Try(c.split('|')(0).toLong).getOrElse(0L) + 1L
      case _ => 1L
    }
    val tmp = new org.apache.hadoop.fs.Path(s"$path/$ManifestName.tmp")
    val out = fs.create(tmp, true)
    out.write(s"$gen|${java.util.UUID.randomUUID()}|#".getBytes("UTF-8"))
    out.close()
    if (fs.exists(cur)) fs.delete(cur, false)
    require(fs.rename(tmp, cur),
      s"commitManifest: rename $tmp -> $cur failed")
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
          // probe-visible effects all land via renames into live tables
          if (!(n.startsWith("_ingest_") && n.endsWith("_tmp")))
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

  private def isSwapWindowError(e: Throwable): Boolean = {
    var cur = e
    var depth = 0
    while (cur != null && depth < 16) {
      cur match {
        case _: java.io.FileNotFoundException => return true
        case _ =>
          val m = cur.getMessage
          // the last clause: RawLocalFileSystem shells out `ls` for
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
