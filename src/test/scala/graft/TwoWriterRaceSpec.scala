package graft

import graft.operators.StableRead
import org.apache.spark.sql.functions._

/** The multi-writer commit protocol (round 18): concurrent maintenance
  * brackets on ONE estate root serialize their generation bumps through
  * the create-exclusive claim CAS, rebase automatically when their
  * table footprints are disjoint, abort loudly
  * (ConcurrentModificationException, first committer wins) when they
  * overlap, and steal a crashed claimant's claim after its lease.
  * Interleavings are pinned with latches — both exit orders — and every
  * committed end state is checked against an independent full
  * re-listing (the SnapshotParitySpec invariant).
  */
class TwoWriterRaceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def fsOf(path: String) = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sessionState.newHadoopConf())

  private def land(root: String, table: String, n: Long): Unit =
    graft.sinks.Sinks.landTable(spark.range(n).toDF("id"), root, table)

  private def gen(root: String): Long =
    StableRead.manifestGeneration(spark, root).getOrElse(0L)

  private def liveCount(root: String, table: String): Long =
    spark.read.parquet(s"$root/$table").count()

  /** Seeded two-table estate with one committed generation. */
  private def seed(tag: String): String = {
    val root = s"${tmp(tag)}/estate"
    StableRead.withMaintenanceMarker(spark, root) {
      land(root, "t_a", 3); land(root, "t_b", 4)
    }
    assert(gen(root) === 1L)
    root
  }

  /** The SnapshotParitySpec invariant, reimplemented small: the head
    * snapshot's per-table file lists equal a full independent
    * re-listing of the live tables. */
  private def assertParity(root: String, where: String): Unit = {
    val snap = StableRead.readSnapshot(spark, root)
      .getOrElse(fail(s"$where: no committed snapshot"))
    val fs = fsOf(root)
    def walk(p: org.apache.hadoop.fs.Path, prefix: String): Seq[String] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Seq.empty
        else if (st.isDirectory) walk(st.getPath, s"$prefix$n/")
        else Seq(s"$prefix$n")
      }
    val live = fs.listStatus(new org.apache.hadoop.fs.Path(root)).toSeq
      .filter(st => st.isDirectory &&
        !StableRead.isTransientName(st.getPath.getName))
      .map(st => st.getPath.getName -> walk(st.getPath, "").toSet)
      .toMap
    assert(snap.tables.keySet === live.keySet, s"$where: table sets differ")
    snap.tables.foreach { case (t, ts) =>
      assert(ts.files.toSet === live(t), s"$where: $t files diverge")
    }
  }

  /** Two writers, pinned interleaving: both enter brackets, w1 mutates,
    * then w2 mutates, then writer `firstToExit` (1 or 2) exits and
    * commits; only after its thread fully finished does the other exit.
    * Returns (w1 outcome, w2 outcome).
    */
  private def race(root: String, m1: () => Unit, m2: () => Unit,
      firstToExit: Int)
      : (scala.util.Try[Unit], scala.util.Try[Unit]) = {
    val w1Mutated = new java.util.concurrent.CountDownLatch(1)
    val bothMutated = new java.util.concurrent.CountDownLatch(2)
    val firstDone = new java.util.concurrent.CountDownLatch(1)
    val results =
      new Array[scala.util.Try[Unit]](2)
    def writer(idx: Int, mutate: () => Unit): Thread = new Thread(() => {
      results(idx - 1) = scala.util.Try {
        StableRead.withMaintenanceMarker(spark, root) {
          if (idx == 2) assert(
            w1Mutated.await(60, java.util.concurrent.TimeUnit.SECONDS))
          try mutate()
          finally {
            // ordering latches release even when the mutation CRASHES —
            // the crash test needs the other writer to proceed
            if (idx == 1) w1Mutated.countDown()
            bothMutated.countDown()
          }
          assert(bothMutated.await(60, java.util.concurrent.TimeUnit.SECONDS))
          if (idx != firstToExit)
            assert(firstDone.await(60, java.util.concurrent.TimeUnit.SECONDS))
        }
      }
      if (idx == firstToExit) firstDone.countDown()
    })
    val t1 = writer(1, m1); val t2 = writer(2, m2)
    t1.start(); t2.start()
    t1.join(120000); t2.join(120000)
    assert(!t1.isAlive && !t2.isAlive, "writer threads wedged")
    (results(0), results(1))
  }

  for (first <- Seq(1, 2))
    test(s"disjoint tables rebase: writer $first commits first, both land") {
      val root = seed(s"race-disj-$first")
      val (r1, r2) = race(root,
        () => land(root, "t_a", 5),
        () => land(root, "t_b", 6),
        firstToExit = first)
      assert(r1.isSuccess, s"w1: $r1")
      assert(r2.isSuccess, s"w2: $r2")
      assert(gen(root) === 3L, "two commits must land two generations")
      // the SECOND committer rebased: its snapshot carries the first's
      // entries for the table it didn't touch
      assertParity(root, s"rebase-$first")
      assert(liveCount(root, "t_a") === 5L)
      assert(liveCount(root, "t_b") === 6L)
      // no writer active, marker down, claims cleaned
      assert(!fsOf(root).exists(new org.apache.hadoop.fs.Path(
        s"$root/${StableRead.MarkerName}")))
      val rel = StableRead.pinned(spark, Seq(root)) {
        StableRead.readTable(spark, root, "t_a")
      }
      assert(rel.count() === 5L)
      StableRead.release(rel)
    }

  for (first <- Seq(1, 2))
    test(s"overlapping table: writer $first wins, loser aborts loudly and re-runs") {
      val root = seed(s"race-ovl-$first")
      val (r1, r2) = race(root,
        () => land(root, "t_a", 7),
        () => land(root, "t_a", 9),
        firstToExit = first)
      val (winner, loser) = if (first == 1) (r1, r2) else (r2, r1)
      assert(winner.isSuccess, s"winner: $winner")
      assert(loser.isFailure, "second committer must not silently win")
      assert(loser.failed.get
        .isInstanceOf[java.util.ConcurrentModificationException],
        s"loser threw ${loser.failed.get}")
      assert(gen(root) === 2L, "exactly one commit must have landed")
      // the loser's bracket failed: its marker stands (crash-window
      // contract) and stable() readers refuse, but pinned serving
      // continues on the committed head
      assert(fsOf(root).exists(new org.apache.hadoop.fs.Path(
        s"$root/${StableRead.MarkerName}")))
      val served = StableRead.pinned(spark, Seq(root)) {
        StableRead.readTable(spark, root, "t_a")
      }
      // data-level truth: both writers landed before either committed,
      // so the live table is the LAST land (w2's 9 rows) and the
      // winner's snapshot listed it — the abort exists exactly because
      // the shared table's state is the racers' blend until the
      // mandated re-run re-lands it
      assert(served.count() === 9L)
      StableRead.release(served)
      // the loser's contract-mandated re-run against the new head
      StableRead.withMaintenanceMarker(spark, root) {
        land(root, "t_a", 11)
      }
      assert(gen(root) === 3L)
      assert(liveCount(root, "t_a") === 11L)
      assertParity(root, s"post-rerun-$first")
      assert(!fsOf(root).exists(new org.apache.hadoop.fs.Path(
        s"$root/${StableRead.MarkerName}")), "re-run must clear the marker")
    }

  test("a crashed claimant's claim is stolen after its lease") {
    val root = seed("race-steal")
    val fs = fsOf(root)
    // a dead writer's debris: claim for the next generation, no commit
    val claim = new org.apache.hadoop.fs.Path(
      s"$root/${StableRead.SnapshotsDirName}/g2.claim")
    fs.create(claim, true).close()
    val saved = StableRead.claimLeaseMs
    StableRead.claimLeaseMs = 250L
    try {
      // within the lease the claim blocks the commit; past it, the
      // commit steals and lands — the whole bracket just works
      val t0 = System.nanoTime()
      StableRead.withMaintenanceMarker(spark, root) {
        land(root, "t_a", 8)
      }
      val waitedMs = (System.nanoTime() - t0) / 1000000L
      assert(gen(root) === 2L, "steal must commit the claimed generation")
      assert(waitedMs >= 200L,
        s"commit returned in ${waitedMs}ms — it must have honored the lease")
      assert(!fs.exists(claim), "stolen claim must be cleaned up")
      assertParity(root, "post-steal")
      assert(liveCount(root, "t_a") === 8L)
    } finally StableRead.claimLeaseMs = saved
  }

  test("a writer crashing mid-mutation neither commits nor pollutes the survivor's snapshot") {
    val root = seed("race-crash")
    val boom = new RuntimeException("writer 1 dies mid-mutation")
    val (r1, r2) = race(root,
      () => { land(root, "t_a", 7); throw boom },
      () => land(root, "t_b", 6),
      firstToExit = 1)
    assert(r1.isFailure && (r1.failed.get eq boom))
    assert(r2.isSuccess, s"survivor: $r2")
    assert(gen(root) === 2L, "only the survivor commits")
    // the crashed writer's UNCOMMITTED t_a land is invisible to pinned
    // readers: the snapshot still lists the seed generation's files,
    // resolved from _retired (the land swap moved them there)
    val pinnedA = StableRead.pinned(spark, Seq(root)) {
      StableRead.readTable(spark, root, "t_a")
    }
    assert(pinnedA.count() === 3L,
      "pinned read leaked an uncommitted concurrent mutation")
    StableRead.release(pinnedA)
    assert(liveCount(root, "t_b") === 6L)
    // the crashed op's re-run converges t_a and restores full parity
    StableRead.withMaintenanceMarker(spark, root) {
      land(root, "t_a", 7)
    }
    assert(gen(root) === 3L)
    assertParity(root, "post-crash-rerun")
    assert(liveCount(root, "t_a") === 7L)
  }

  test("a LIVE holder's heartbeat keeps its claim past the lease; only dead debris is stolen") {
    val root = seed("race-heartbeat")
    val fs = fsOf(root)
    val claim = new org.apache.hadoop.fs.Path(
      s"$root/${StableRead.SnapshotsDirName}/g2.claim")
    fs.create(claim, true).close()
    // register the claim as a live holder's: the heartbeat refreshes
    // its mtime on a cadence far inside the lease, so a commit that
    // outlasts the lease (the round-18 lost-commit window) is safe
    StableRead.heartbeatRegister(fs, claim)
    val saved = StableRead.claimLeaseMs
    StableRead.claimLeaseMs = 250L
    try {
      val t0 = System.currentTimeMillis()
      Thread.sleep(600L) // several leases elapse under the heartbeat
      val st = fs.getFileStatus(claim)
      assert(st.getModificationTime > t0,
        "heartbeat must refresh the live claim's mtime")
      // a concurrent committer judges the claim by its mtime — always
      // fresh, so it WAITS instead of stealing; prove it by asserting
      // the steal primitive itself refuses a refreshed incarnation
      val staleMtime = t0 - 10000L
      assert(!StableRead.stealIfUnchanged(fs, claim, staleMtime),
        "a heartbeated claim must never be stolen")
      assert(fs.exists(claim))
    } finally {
      StableRead.claimLeaseMs = saved
      StableRead.heartbeatUnregister(claim)
      fs.delete(claim, false)
    }
  }

  test("the lease steal is TOCTOU-safe: only the observed incarnation is deleted") {
    val root = seed("race-toctou")
    val fs = fsOf(root)
    val lock = new org.apache.hadoop.fs.Path(s"$root/_locks/t_a.lock")
    fs.mkdirs(lock.getParent)
    fs.create(lock, true).close()
    val observed = fs.getFileStatus(lock).getModificationTime
    // between the expiry judgment and the delete, the file is replaced
    // (a fresh claimant, or a holder's heartbeat) — the steal must see
    // the mtime changed and back off rather than delete a live lock
    Thread.sleep(15L)
    fs.setTimes(lock, System.currentTimeMillis() + 5000L, -1)
    assert(!StableRead.stealIfUnchanged(fs, lock, observed),
      "steal must refuse an incarnation newer than the one it judged")
    assert(fs.exists(lock), "the live lock must survive the refused steal")
    // unchanged incarnation: the steal lands exactly once
    val cur = fs.getFileStatus(lock).getModificationTime
    assert(StableRead.stealIfUnchanged(fs, lock, cur))
    assert(!fs.exists(lock))
    assert(!StableRead.stealIfUnchanged(fs, lock, cur),
      "a second steal of the same incarnation must be a no-op")
  }

  test("GC expiring history under an open bracket aborts the commit loudly") {
    val root = seed("race-gc-abort")
    // writer A opens a bracket and mutates t_a; before it commits,
    // two disjoint commits land from other threads and a GC expires
    // their snapshot indexes — A's conflict window (startGen, head]
    // is then unreadable and the commit must FAIL (rebasing blindly
    // could override an overlapping commit), not silently proceed
    val err = intercept[java.util.ConcurrentModificationException] {
      StableRead.withMaintenanceMarker(spark, root) {
        land(root, "t_a", 9)
        val other = new Thread(() => {
          StableRead.withMaintenanceMarker(spark, root) {
            land(root, "t_b", 5)
          }
          StableRead.withMaintenanceMarker(spark, root) {
            land(root, "t_b", 6)
          }
          StableRead.gc(spark, root, keepGenerations = 1)
        })
        other.start(); other.join(60000L)
      }
    }
    assert(err.getMessage.contains("no readable snapshot index"),
      s"wrong abort class: ${err.getMessage}")
    // the contract-mandated re-run opens a fresh bracket at the new
    // head and converges
    StableRead.withMaintenanceMarker(spark, root) { land(root, "t_a", 9) }
    assertParity(root, "post-gc-abort-rerun")
    assert(liveCount(root, "t_a") === 9L)
  }
}
