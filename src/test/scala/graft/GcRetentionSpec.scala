package graft

import graft.operators.{Retrieval, StableRead}
import org.apache.spark.sql.functions._

/** Retention-policy cadence (round 18): maintenance ops accept a
  * `gcKeepGenerations` horizon and run the bracketed [[StableRead.gc]]
  * in their own window, so a long-lived estate's `_retired/` and
  * `_snapshots/` stay bounded by the horizon instead of growing with
  * every mutation forever — while an IN-horizon pinned reader is never
  * broken by a concurrent GC (out-of-horizon pins failing loudly is
  * q202's gate and StableReadManifestSpec's drill).
  */
class GcRetentionSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 60L).map(i => (i, s"alpha beta w$i word$i"))

  private def fsOf(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sessionState.newHadoopConf())

  private def filesUnder(dir: String, sub: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$sub")
    val fs = fsOf(dir)
    if (!fs.exists(p)) 0
    else {
      def walk(q: org.apache.hadoop.fs.Path): Int =
        fs.listStatus(q).map(st =>
          if (st.isDirectory) walk(st.getPath) else 1).sum
      walk(p)
    }
  }

  test("an in-horizon pinned reader survives a concurrent GC") {
    val dir = s"${java.nio.file.Files
      .createTempDirectory("gc-inhorizon")}/idx"
    Retrieval.buildBm25Index(
      docs.take(40).toDF("doc_id", "text"), "doc_id", "text", dir,
      buckets = 8)
    Retrieval.bm25Append(
      dir, docs.drop(40).toDF("doc_id", "text"), "doc_id", "text")
    val snap = StableRead.readSnapshot(spark, dir).get
    val q = Seq((1L, "alpha w45")).toDF("query_id", "query_text")
      .localCheckpoint(true)
    val want = StableRead.pinnedAt(spark, Seq(snap)) {
      Retrieval.bm25TopKIndexed(dir, q, 5)
    }.collect().map(_.toString).sorted.toSeq
    // one more generation, then a GC whose horizon still covers the pin
    Retrieval.bm25Compact(spark, dir)
    StableRead.gc(spark, dir, keepGenerations = 3)
    val got = StableRead.pinnedAt(spark, Seq(snap)) {
      Retrieval.bm25TopKIndexed(dir, q, 5)
    }
    assert(got.collect().map(_.toString).sorted.toSeq === want,
      "in-horizon pin broken or drifted by the GC")
    StableRead.release(got)
    // the GC bracketed like any mutation: it committed a generation
    assert(StableRead.manifestGeneration(spark, dir).get > snap.gen)
  }

  test("compaction-cadence GC bounds _retired and _snapshots under churn") {
    val parent = java.nio.file.Files.createTempDirectory("gc-churn")
    val dir = s"$parent/idx"
    val ctl = s"$parent/ctl" // identical churn, NO gc — the control
    Seq(dir, ctl).foreach(d => Retrieval.buildBm25Index(
      docs.take(20).toDF("doc_id", "text"), "doc_id", "text", d,
      buckets = 8))
    def cycle(d: String, i: Int, gc: Option[Int]): Unit = {
      Retrieval.bm25Append(d,
        Seq((1000L + i, s"gamma delta cyc$i")).toDF("doc_id", "text"),
        "doc_id", "text")
      Retrieval.bm25Compact(spark, d, gcKeepGenerations = gc)
    }
    (0 until 3).foreach(i => cycle(dir, i, Some(2)))
    val retiredAt3 = filesUnder(dir, StableRead.RetiredDirName)
    val snapsAt3 = filesUnder(dir, StableRead.SnapshotsDirName)
    (3 until 9).foreach(i => cycle(dir, i, Some(2)))
    (0 until 9).foreach(i => cycle(ctl, i, None))
    val retiredAt9 = filesUnder(dir, StableRead.RetiredDirName)
    val snapsAt9 = filesUnder(dir, StableRead.SnapshotsDirName)
    // steady state: six more churn cycles must not grow the metadata
    // estate beyond per-cycle part-count noise (the appended doc's
    // terms hash into 2-3 buckets depending on i, so the horizon's
    // retained generation varies by a few files) — while the UN-GC'd
    // control grows strictly with every cycle
    assert(retiredAt9 <= retiredAt3 + 4,
      s"_retired grew under GC cadence: $retiredAt3 -> $retiredAt9")
    assert(snapsAt9 <= snapsAt3 + 4,
      s"_snapshots grew under GC cadence: $snapsAt3 -> $snapsAt9")
    val ctlRetired = filesUnder(ctl, StableRead.RetiredDirName)
    val ctlSnaps = filesUnder(ctl, StableRead.SnapshotsDirName)
    assert(ctlRetired > retiredAt9 + 6 && ctlSnaps > snapsAt9 + 6,
      s"control did not diverge (_retired $ctlRetired vs $retiredAt9, " +
        s"_snapshots $ctlSnaps vs $snapsAt9) — the GC assertion is vacuous")
    // and the estate still serves exactly
    val q = Seq((1L, "gamma cyc8")).toDF("query_id", "query_text")
    val rel = Retrieval.bm25TopKIndexed(dir, q, 5)
      .collect().map(_.toString).toSeq
    assert(rel.nonEmpty, "post-churn probe returned nothing")
    assert(graft.operators.Fsck.bm25Fsck(spark, dir).count() === 0L)
  }
}
