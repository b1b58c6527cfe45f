package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Optimistic snapshot reads over a mutable index estate — what lets a
  * PROBE run concurrently with the single-writer maintenance ops
  * (compact / vacuum / delete / merge-swap) and still return a
  * CONSISTENT state, never a blend and never a mid-swap IO error.
  *
  * The problem: a probe reads several table directories (postings,
  * terms, doclen, stats, tombstones) at different instants, and the
  * maintenance ops rewrite them one swap at a time
  * ([[graft.sinks.Sinks.swapByRename]] leaves each TABLE complete —
  * old or new — but the set of tables is not swapped atomically). A
  * reader overlapping a vacuum can therefore read post-delete terms
  * against pre-delete postings: each table is sound, the COMBINATION
  * is a state that never existed (the scores double-subtract the
  * doomed docs' df). Snapshot isolation needs a manifest the layout
  * does not have — so the reader validates instead of locking:
  *
  *   1. fingerprint the roots' filesystem METADATA (every file's path,
  *      length, mtime — a driver-side listing, no data read);
  *   2. run the probe and MATERIALIZE it (localCheckpoint — every
  *      table read happens inside this step);
  *   3. fingerprint again. Equal fingerprints prove no mutation
  *      overlapped the reads — the probe saw one consistent state
  *      (every maintenance op rewrites files under new names, so any
  *      overlapping op changes the listing). Unequal — or a
  *      FileNotFound/FAILED_READ_FILE from a swap window mid-read —
  *      discards the result and retries.
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
  * to the survivors-only oracle.
  */
object StableRead {

  /** Name of the estate-level maintenance marker. Fingerprint
    * validation alone cannot catch a probe that runs ENTIRELY inside a
    * quiet gap between a multi-table op's internal jobs (e.g. after
    * bm25Delete's terms swap, before its postings rewrite: the
    * filesystem is static, the COMBINATION is a blend) — so the ops
    * that open cross-table inconsistent windows bracket themselves
    * with this marker and [[stable]] refuses to validate while it
    * exists. Removed only on SUCCESS: an op that crashed or threw
    * leaves the marker standing, which keeps readers away from the
    * partial state until the op re-runs and converges (the estate's
    * crash-window contract already requires exactly that re-run).
    */
  val MarkerName = "_maintenance"

  /** Bracket a multi-table maintenance op with the reader-isolation
    * marker. The body must not use non-local `return` (it would skip
    * the success-path removal). Marker creation/removal is two
    * metadata ops — noise on the maintenance path's action floor.
    */
  private[graft] def withMaintenanceMarker[T](
      spark: SparkSession, path: String)(body: => T): T = {
    val marker = new org.apache.hadoop.fs.Path(s"$path/$MarkerName")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    fs.create(marker, true).close()
    val out = body
    fs.delete(marker, false)
    out
  }

  private[graft] def markerPresent(
      spark: SparkSession, roots: Seq[String]): Boolean = {
    val hconf = spark.sessionState.newHadoopConf()
    roots.exists { r =>
      val p = new org.apache.hadoop.fs.Path(s"$r/$MarkerName")
      p.getFileSystem(hconf).exists(p)
    }
  }

  /** Filesystem-metadata fingerprint of `roots` (recursive; md5 of the
    * sorted (path, length, mtime) listing). Metadata-only — never opens
    * a file. A root that vanishes mid-listing surfaces as the
    * exception the retry loop treats as "changed".
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

  /** Run `probe` against the index roots until it reads one consistent
    * state, and return it MATERIALIZED (localCheckpoint). `probe` is
    * re-evaluated from scratch on every attempt (driver-side stats
    * reads included — a swap can also race those).
    */
  def stable(
      spark: SparkSession,
      roots: Seq[String],
      maxAttempts: Int = 12)(probe: => DataFrame): DataFrame = {
    require(roots.nonEmpty, "StableRead.stable: need >= 1 root")
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      try {
        if (!markerPresent(spark, roots)) {
          val before = signature(spark, roots)
          val out = probe.localCheckpoint(true)
          // a marker that appeared mid-probe is caught by the second
          // fingerprint (its file is part of the listing)
          if (signature(spark, roots) == before) return out
        }
        // torn window: some table mutated while the probe materialized,
        // or a maintenance op holds the marker — back off a beat so a
        // churning writer's gaps become reachable
        Thread.sleep(25L)
      } catch {
        case e: Throwable if isSwapWindowError(e) => // swap mid-read
      }
    }
    throw new IllegalStateException(
      s"StableRead.stable: no consistent read in $maxAttempts attempts — " +
        s"the estate at ${roots.mkString(", ")} is under continuous " +
        "maintenance churn; probe inside a maintenance window or raise " +
        "maxAttempts")
  }
}
