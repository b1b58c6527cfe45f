package graft

import graft.operators.{Fsck, Retrieval, Similarity, StableRead}
import org.apache.spark.sql.functions._

/** The commit-protocol estate audit ([[Fsck.estateFsck]], round 18):
  * a healthy multi-generation estate audits clean, and every planted
  * corruption class of the protocol surface is caught by its named
  * violation — torn manifest, unresolvable snapshot (a severed
  * append-delta chain), a pinned file missing from live+retired+bak,
  * stale generation claims and table locks, stranded markers, and
  * standing delete intents.
  */
class EstateFsckSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sessionState.newHadoopConf())

  private def kinds(dir: String): Map[String, Long] =
    Fsck.estateFsck(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** A lived-in estate: build, ingest batches (delta chains), compact
    * (chain reset + retires), GC. */
  private def estate(tag: String): String = {
    val dir = s"${java.nio.file.Files
      .createTempDirectory(s"estate-fsck-$tag")}/ivf"
    Similarity.buildIvfIndex(
      (0L until 60L).map(i => (i, Seq(math.cos(0.2 * i), math.sin(0.2 * i))))
        .toDF("id", "vec"),
      "id", "vec", nlist = 2, dir)
    (0 until 2).foreach(b => Similarity.ivfIngestBatch(dir,
      Seq((500L + b, Seq(0.5, 0.5 * b))).toDF("id", "vec"),
      "id", "vec", b.toLong))
    Similarity.ivfCompact(spark, dir, gcKeepGenerations = Some(2))
    dir
  }

  test("a lived-in estate audits clean; a non-estate root is named") {
    val dir = estate("clean")
    assert(kinds(dir) === Map.empty)
    val empty = java.nio.file.Files
      .createTempDirectory("estate-fsck-empty").toString
    assert(kinds(empty) === Map("estate_no_manifest" -> 1L))
  }

  test("every planted corruption class is caught by its named violation") {
    val dir = estate("plant")
    val fs = fsOf(dir)
    // stale claim + stale lock (mtimes aged past their leases)
    val claim = new org.apache.hadoop.fs.Path(
      s"$dir/${StableRead.SnapshotsDirName}/g99.claim")
    fs.create(claim, true).close()
    fs.setTimes(claim, System.currentTimeMillis() - 3600000L, -1)
    val lock = new org.apache.hadoop.fs.Path(s"$dir/_locks/corpus.lock")
    fs.mkdirs(lock.getParent); fs.create(lock, true).close()
    fs.setTimes(lock, System.currentTimeMillis() - 3600000L, -1)
    // stranded marker + standing delete intent
    fs.create(new org.apache.hadoop.fs.Path(
      s"$dir/${StableRead.MarkerName}"), true).close()
    fs.create(new org.apache.hadoop.fs.Path(
      s"$dir/corpus/${graft.sinks.Sinks.DeleteIntentName}"), true).close()
    val got = kinds(dir)
    assert(got.get("estate_stale_claim").contains(1L), s"got $got")
    assert(got.get("estate_stale_lock").contains(1L), s"got $got")
    assert(got.get("estate_stranded_marker").contains(1L), s"got $got")
    assert(got.get("estate_standing_delete_intent").contains(1L), s"got $got")
    // restore and re-audit clean
    fs.delete(claim, false); fs.delete(lock, false)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$dir/${StableRead.MarkerName}"), false)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$dir/corpus/${graft.sinks.Sinks.DeleteIntentName}"), false)
    assert(kinds(dir) === Map.empty)
  }

  test("a pinned file vanished from live+retired+bak is the loudest class") {
    val dir = estate("missing")
    val snap = StableRead.readSnapshot(spark, dir).get
    val fs = fsOf(dir)
    val (table, ts) = snap.tables.find(_._2.files.nonEmpty).get
    // remove one pinned file WITHOUT retiring it (damage, not protocol)
    val victim = new org.apache.hadoop.fs.Path(
      s"$dir/$table/${ts.files.head}")
    require(fs.delete(victim, false))
    assert(kinds(dir).get("estate_missing_pinned_file").contains(1L))
  }

  test("a severed append-delta chain makes the head snapshot unreadable") {
    val dir = estate("chain")
    val fs = fsOf(dir)
    // a fresh ingest writes a delta shard chaining to the compacted
    // full shard; severing the BASE breaks resolution
    Similarity.ivfIngestBatch(dir,
      Seq((900L, Seq(0.1, 0.9))).toDF("id", "vec"), "id", "vec", 5L)
    val snapDir = new org.apache.hadoop.fs.Path(
      s"$dir/${StableRead.SnapshotsDirName}")
    val head = StableRead.manifestGeneration(spark, dir).get
    val deltaShard = new org.apache.hadoop.fs.Path(snapDir, s"g$head.corpus")
    assert(fs.exists(deltaShard), "fixture: no delta shard at head")
    val headLine = {
      val in = fs.open(deltaShard)
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.linesIterator.next()
      finally in.close()
    }
    assert(headLine.startsWith("3|"), s"fixture: head shard is $headLine")
    val baseGen = headLine.split('|')(3)
    require(fs.delete(
      new org.apache.hadoop.fs.Path(snapDir, s"g$baseGen.corpus"), false))
    assert(kinds(dir).get("estate_snapshot_unreadable").contains(1L))
  }

  test("a torn manifest is named") {
    val dir = estate("torn")
    val fs = fsOf(dir)
    val m = new org.apache.hadoop.fs.Path(s"$dir/${StableRead.ManifestName}")
    val out = fs.create(m, true)
    out.write("7|half-written-no-terminat".getBytes("UTF-8")); out.close()
    assert(kinds(dir) === Map("estate_manifest_torn" -> 1L))
  }
}
