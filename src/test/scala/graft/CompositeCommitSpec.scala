package graft

import graft.operators.StableRead
import org.apache.spark.sql.functions._

/** Cross-artifact composite commits (round 19): one PARENT root records
  * a (child root -> generation) cut after a composed pipeline commits
  * all its children, and [[StableRead.pinnedComposite]] serves that cut
  * — closing the reader anomaly where a composed probe saw the registry
  * at generation N beside the index still at N-1. The q205 gate drives
  * the real curate-then-index sink under the DuckDB oracle; this spec
  * drills the protocol edges: the inter-commit window, cut immutability
  * under churn, expired-child loudness, and parent retention.
  */
class CompositeCommitSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def land(root: String, table: String, n: Long): Unit =
    StableRead.withMaintenanceMarker(spark, root) {
      graft.sinks.Sinks.landTable(spark.range(n).toDF("id"), root, table)
    }

  private def pinnedCount(
      parent: String, gen: Option[Long], root: String, table: String): Long = {
    val df = StableRead.pinnedComposite(spark, parent, gen) {
      StableRead.readTable(spark, root, table)
    }
    val n = df.count()
    StableRead.release(df)
    n
  }

  test("a cut is immune to the inter-commit window and to later churn") {
    val base = tmp("composite")
    val reg = s"$base/reg"; val idx = s"$base/idx"
    val parent = s"$base/est"
    land(reg, "t", 10); land(idx, "t", 10)
    val c1 = StableRead.commitComposite(spark, parent, Seq(reg, idx))
    assert(c1 === 1L)
    // the INTER-COMMIT WINDOW: the registry has committed its next
    // batch, the index has not — a live composed reader here sees
    // reg@2 beside idx@1 (the anomaly); the cut still serves the
    // consistent (reg@1, idx@1) pair
    land(reg, "t", 25)
    assert(pinnedCount(parent, Some(c1), reg, "t") === 10L,
      "cut leaked the registry's post-cut commit")
    assert(pinnedCount(parent, Some(c1), idx, "t") === 10L)
    // the index catches up; a new cut records the pair
    land(idx, "t", 25)
    val c2 = StableRead.commitComposite(spark, parent, Seq(reg, idx))
    assert(c2 === 2L)
    assert(pinnedCount(parent, Some(c2), reg, "t") === 25L)
    assert(pinnedCount(parent, None, idx, "t") === 25L) // head = newest cut
    // the OLD cut is immutable under any amount of later churn
    (0 until 3).foreach(i => { land(reg, "t", 30 + i); land(idx, "t", 40 + i) })
    StableRead.commitComposite(spark, parent, Seq(reg, idx))
    assert(pinnedCount(parent, Some(c1), reg, "t") === 10L)
    assert(pinnedCount(parent, Some(c1), idx, "t") === 10L)
    // cut content is exactly the recorded pairs
    val cut = StableRead.readCompositeCut(spark, parent, Some(c1)).get.toMap
    assert(cut === Map(reg -> 1L, idx -> 1L))
  }

  test("an expired child generation fails the pinned cut loudly, never nearest-newer") {
    val base = tmp("composite-gc")
    val reg = s"$base/reg"; val idx = s"$base/idx"
    val parent = s"$base/est"
    land(reg, "t", 5); land(idx, "t", 5)
    val c1 = StableRead.commitComposite(spark, parent, Seq(reg, idx))
    // churn the registry several generations past the cut, then GC its
    // estate down to one retained generation — the cut's reg@1 expires
    (0 until 3).foreach(i => land(reg, "t", 6 + i))
    StableRead.gc(spark, reg, keepGenerations = 1)
    val e = intercept[IllegalStateException] {
      StableRead.pinnedComposite(spark, parent, Some(c1)) {
        StableRead.readTable(spark, reg, "t")
      }
    }
    assert(e.getMessage.contains("no longer resolvable"),
      s"wrong failure class: ${e.getMessage}")
  }

  test("parent retention: compositeGc keeps the newest cuts, head survives") {
    val base = tmp("composite-ret")
    val reg = s"$base/reg"; val idx = s"$base/idx"
    val parent = s"$base/est"
    land(reg, "t", 5); land(idx, "t", 5)
    (0 until 5).foreach { i =>
      land(reg, "t", 10 + i)
      land(idx, "t", 10 + i)
      StableRead.commitComposite(spark, parent, Seq(reg, idx))
    }
    assert(StableRead.compositeGc(spark, parent, keepGenerations = 2) === 3L)
    assert(StableRead.readCompositeCut(spark, parent, Some(1L)).isEmpty)
    assert(StableRead.readCompositeCut(spark, parent, Some(4L)).isDefined)
    assert(pinnedCount(parent, None, reg, "t") === 14L)
    // a second GC is a no-op
    assert(StableRead.compositeGc(spark, parent, keepGenerations = 2) === 0L)
  }

  test("commitComposite refuses a child without a committed generation") {
    val base = tmp("composite-refuse")
    val reg = s"$base/reg"
    land(reg, "t", 5)
    val e = intercept[IllegalStateException] {
      StableRead.commitComposite(
        spark, s"$base/est", Seq(reg, s"$base/never-committed"))
    }
    assert(e.getMessage.contains("no committed generation"))
  }
}
