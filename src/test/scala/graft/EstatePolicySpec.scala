package graft

import graft.operators.{Retrieval, StableRead}
import org.apache.spark.sql.functions._

/** Threshold-triggered estate maintenance (round 19):
  * [[StableRead.autoMaintain]] turns retention cadence into an estate
  * property — idle below thresholds, compact + GC when the append-delta
  * chain or the retired footprint trips, and lock-respecting when a
  * writer is live. AuditBench's policy arm measures the 40-cycle churn
  * footprint with no manual gc calls.
  */
class EstatePolicySpec extends SparkSpec {
  import spark.implicits._

  private def freshIndex(tag: String): String = {
    val root = s"${java.nio.file.Files.createTempDirectory(tag)}/idx"
    Retrieval.buildBm25Index(
      (0 until 30).map(i => (i.toLong, s"alpha w$i beta w${i % 5}"))
        .toDF("doc_id", "text"),
      "doc_id", "text", root, buckets = 7)
    root
  }

  // the STREAMING apply: its copyParquetParts landings note exact file
  // paths, so each batch commits an O(batch) append-delta shard — the
  // chain the policy's threshold watches (the batch bm25Append commits
  // fresh full shards; its chain never grows)
  private def append(root: String, i: Int): Unit =
    Retrieval.bm25IngestBatch(root,
      Seq((1000L + i, s"gamma g$i delta")).toDF("doc_id", "text"),
      "doc_id", "text", i.toLong)

  test("idle below thresholds; fires on the chain threshold; chain resets; footprint GC'd") {
    val root = freshIndex("policy")
    val compactsRan = new java.util.concurrent.atomic.AtomicInteger(0)
    def policy(): Option[String] = StableRead.autoMaintain(spark, root,
      () => { compactsRan.incrementAndGet(); Retrieval.bm25Compact(spark, root) },
      keepGenerations = 2, chainThreshold = 4)
    // below threshold: two metadata reads, no mutation, no generation
    assert(policy().isEmpty && compactsRan.get() === 0)
    val genBefore = StableRead.manifestGeneration(spark, root).get
    assert(StableRead.manifestGeneration(spark, root).get === genBefore,
      "an idle policy check must not commit anything")
    // grow the chain past the threshold: appends are chain links
    var fired = 0
    (1 to 6).foreach { i =>
      append(root, i)
      if (policy().isDefined) fired += 1
    }
    assert(fired >= 1 && compactsRan.get() === fired,
      s"policy should have fired on the chain threshold (fired=$fired)")
    assert(StableRead.maxShardChainLen(spark, root) < 4,
      "compact must reset the chain below the threshold")
    // the GC ran at keep=2 when the policy fired: everything below that
    // firing's horizon is expired (later appends commit fresh
    // generations after the GC, so only the PRE-fire history is gone)
    val head = StableRead.manifestGeneration(spark, root).get
    assert(StableRead.readSnapshotAt(spark, root, head).isDefined)
    assert(StableRead.readSnapshotAt(spark, root, 1L).isEmpty,
      "generations below the fired GC's horizon must be expired")
    // probes stay green across the whole policy history
    val hits = Retrieval.bm25TopKIndexed(
      root, Seq((1L, "gamma alpha")).toDF("query_id", "query_text"), 5)
    assert(hits.count() > 0)
    assert(graft.operators.Fsck.bm25Fsck(spark, root).count() === 0L)
  }

  test("fires on the retired-bytes budget") {
    val root = freshIndex("policy-bytes")
    append(root, 1) // one retire-producing mutation (stats swap)
    val reason = StableRead.autoMaintain(spark, root,
      () => Retrieval.bm25Compact(spark, root),
      keepGenerations = 2, chainThreshold = 1000,
      retiredBytesBudget = 1L) // any retired byte trips
    assert(reason.exists(_.startsWith("retired=")), s"got $reason")
  }

  test("a policy firing against a live writer WAITS on the table locks") {
    val root = freshIndex("policy-race")
    (1 to 3).foreach(append(root, _))
    // a foreign writer holds the postings lock; the policy's compact
    // must wait for the release, never interleave (the table-lock
    // discipline — heartbeats keep the lease alive for as long as the
    // holder lives)
    val holderDone = new java.util.concurrent.atomic.AtomicLong(0L)
    val holder = new Thread(() => {
      StableRead.withTableLocks(spark, root, Seq("postings")) {
        Thread.sleep(1500L)
        holderDone.set(System.nanoTime())
      }
    })
    holder.start()
    Thread.sleep(200L) // let the holder acquire
    val reason = StableRead.autoMaintain(spark, root,
      () => Retrieval.bm25Compact(spark, root),
      keepGenerations = 2, chainThreshold = 2)
    val policyDone = System.nanoTime()
    holder.join(30000L)
    assert(reason.isDefined, "chain=3 must trip threshold 2")
    assert(policyDone > holderDone.get() && holderDone.get() > 0L,
      "the policy's compact finished before the lock holder released — " +
        "it interleaved with a live writer")
    assert(graft.operators.Fsck.bm25Fsck(spark, root).count() === 0L)
  }
}
