package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Soft-delete overlays for the persisted indexes — INSTANT takedown
  * visibility with DEFERRED physical erasure. A physical delete
  * ([[Retrieval.bm25Delete]] / [[Similarity.ivfDelete]]) rewrites the
  * doomed rows' partitions: footprint-proportional, but still a
  * maintenance-window job. A takedown queue needs the doc GONE FROM
  * RESULTS now. The tombstone list is that overlay: an O(batch) append
  * of doomed ids beside the index, honored by every probe (single,
  * federated, quantized), and CLEARED by the physical delete that later
  * applies it — the familiar soft-delete architecture (Lucene's deleted
  * docs, Delta/Iceberg delete files), except the lexical probe adjusts
  * the GLOBAL STATISTICS exactly (Lucene famously does not until merge):
  * N/avgdl drop by the doomed docs' counts and each query term's df by
  * its doomed postings, all computable from the probe's ALREADY-PRUNED
  * reads plus one broadcast of the (small, by contract) tombstone list —
  * so a soft-deleted probe is BIT-FOR-BIT the probe of a physically
  * rebuilt survivors-only index (the q177 gate pins soft == hard ==
  * oracle in one hash).
  *
  * Contract: the tombstone list is a BOUNDED overlay — it is takedown
  * state awaiting compaction, not a second corpus; run the physical
  * delete when it grows past the broadcast threshold. Same single-writer
  * discipline as every index mutation. Layout: `<indexPath>/tombstones/`
  * parquet of (id LONG), distinct; absent dir == empty overlay (zero
  * probe overhead — probes check the file listing, not a job).
  */
object Tombstones {

  private def dirOf(indexPath: String) =
    new org.apache.hadoop.fs.Path(s"$indexPath/tombstones")

  private def bakOf(indexPath: String) =
    new org.apache.hadoop.fs.Path(s"$indexPath/tombstones_swap_bak")

  /** Converge any crashed swap BEFORE mutating (the recoverable-apply
    * discipline): a [[graft.sinks.Sinks.swapByRename]] crash window can
    * leave the overlay only in `tombstones_swap_bak` — and for THIS
    * artifact an absent dir is a VALID state (empty overlay), so unlike
    * doclen the loss would be silent resurrection of every tombstoned
    * doc at probe time, with nothing on the query path to notice.
    * bak-without-cur restores the bak; bak-beside-cur (crash after the
    * second rename) drops the bak; stale tmp dirs drop. Mutating ops
    * call this under the single-writer window; [[read]] stays
    * read-only and instead FALLS BACK to the bak when the live dir is
    * missing (the pre-swap list — complete, since the interrupted
    * mutation never acknowledged).
    */
  private def recover(
      fs: org.apache.hadoop.fs.FileSystem, indexPath: String): Unit = {
    val (cur, bak) = (dirOf(indexPath), bakOf(indexPath))
    if (fs.exists(bak)) {
      if (!fs.exists(cur)) {
        require(fs.rename(bak, cur), s"Tombstones: restore $bak failed")
        StableRead.noteTouched(indexPath, "tombstones")
      } else require(fs.delete(bak, true), s"Tombstones: cannot drop $bak")
    }
    Seq("tombstones_add_tmp", "tombstones_clear_tmp").foreach { t =>
      val p = new org.apache.hadoop.fs.Path(s"$indexPath/$t")
      if (fs.exists(p))
        require(fs.delete(p, true), s"Tombstones: cannot drop $p")
    }
  }

  /** Add doomed ids to the index's overlay (distinct union, swapped in
    * by rename; a crashed prior swap converges first, so a crash never
    * loses the overlay — TombstoneSpec drives the window). Returns
    * the overlay's total id count after the add. Unknown ids are
    * tolerated (no-ops at probe time); [[Fsck]] flags them so a typo'd
    * takedown batch is auditable.
    */
  def add(
      spark: SparkSession,
      indexPath: String,
      keys: DataFrame,
      keyCol: String): Long =
    StableRead.withMaintenanceMarker(spark, indexPath) {
      graft.CacheScope.scoped {
        val cur = dirOf(indexPath)
        val fs = cur.getFileSystem(spark.sessionState.newHadoopConf())
        recover(fs, indexPath)
        val existing = read(spark, indexPath)
          .getOrElse(spark.range(0).select(col("id")))
        val merged = existing
          .unionByName(keys.select(col(keyCol).cast("long").as("id")))
          .distinct()
          .transform(graft.CacheScope.persisted)
        val n = merged.count()
        val tmp =
          new org.apache.hadoop.fs.Path(s"$indexPath/tombstones_add_tmp")
        merged.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        if (fs.exists(cur)) graft.sinks.Sinks.swapByRename(fs, tmp, cur)
        else {
          require(fs.rename(tmp, cur),
            s"Tombstones.add: rename to $cur failed")
          StableRead.noteTouched(indexPath, "tombstones")
        }
        n
      }
    }

  /** The overlay as an (id) frame — None when absent or empty (callers
    * skip all adjustment work; the check is a file listing, not a job).
    * Read-only: a live dir lost to a swap crash is served from the
    * backup until the next mutating op converges it ([[recover]]).
    */
  def read(spark: SparkSession, indexPath: String): Option[DataFrame] = {
    // inside a pinned scope the overlay resolves from the pinned
    // snapshot like any table (bak fallback is a live-read concern —
    // a pinned generation's overlay files are live, bak'd or retired,
    // and readTable checks all three locations)
    if (StableRead.pinnedSnapshotFor(indexPath).isDefined)
      return StableRead.readTableOpt(spark, indexPath, "tombstones",
        Some(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType)))))
    val fs = dirOf(indexPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def parquetIn(p: org.apache.hadoop.fs.Path): Boolean =
      fs.exists(p) &&
        fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
    val src =
      if (parquetIn(dirOf(indexPath))) Some(dirOf(indexPath))
      else if (parquetIn(bakOf(indexPath))) Some(bakOf(indexPath))
      else None
    src.map(p => spark.read.schema("id LONG").parquet(p.toString))
  }

  /** Remove physically-applied ids from the overlay (the tail step of
    * [[Retrieval.bm25Delete]] / [[Similarity.ivfDelete]]): overlay
    * anti-join applied keys; an emptied overlay's dir is removed, so
    * probes return to the zero-overhead path.
    */
  def clear(
      spark: SparkSession,
      indexPath: String,
      applied: DataFrame,
      keyCol: String): Unit =
    StableRead.withMaintenanceMarker(spark, indexPath) {
      graft.CacheScope.scoped {
        val cur = dirOf(indexPath)
        val fs = cur.getFileSystem(spark.sessionState.newHadoopConf())
        recover(fs, indexPath)
        read(spark, indexPath).foreach { existing =>
          val remaining = existing
            .join(applied.select(col(keyCol).cast("long").as("id")),
              Seq("id"), "left_anti")
            .transform(graft.CacheScope.persisted)
          if (remaining.count() == 0L) {
            // manifest-managed roots retire the emptied overlay (pinned
            // readers at pre-clear generations still resolve its files)
            if (StableRead.manifestManaged(
                fs, new org.apache.hadoop.fs.Path(indexPath)))
              StableRead.retireTree(fs, indexPath, "tombstones")
            else require(fs.delete(cur, true),
              s"Tombstones.clear: cannot drop $cur")
          }
          else {
            val tmp = new org.apache.hadoop.fs.Path(
              s"$indexPath/tombstones_clear_tmp")
            remaining.coalesce(1).write.mode("overwrite")
              .parquet(tmp.toString)
            graft.sinks.Sinks.swapByRename(fs, tmp, cur)
          }
        }
      }
    }
}
