package graft

import graft.operators.{Retrieval, Similarity, TakedownQueue, Tombstones}
import org.apache.spark.sql.functions._

/** The takedown batching policy: requests are instantly invisible,
  * flushes fire only on a trigger (footprint budget / pending bound /
  * force), prediction equals the measured rewrite footprint, and every
  * request is applied exactly once across flush boundaries.
  */
class TakedownQueueSpec extends SparkSpec {
  import spark.implicits._

  private def freshIndex(tag: String): String = {
    val dir = s"${java.nio.file.Files
      .createTempDirectory(s"tdq-$tag").toString}/idx"
    val rnd = new scala.util.Random(41)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    val docs = (0L until 120L).map { i =>
      (i, (Seq.fill(3 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.length))) ++
        Seq.fill((i % 13).toInt)("pad")).mkString(" "))
    }.toDF("doc_id", "text")
    Retrieval.buildBm25Index(docs, "doc_id", "text", dir, buckets = 16)
    dir
  }

  private def bucketFiles(dir: String): Map[String, Set[String]] = {
    val base = java.nio.file.Paths.get(s"$dir/postings")
    val st = java.nio.file.Files.walk(base)
    try st.toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(p => java.nio.file.Files.isRegularFile(p))
      .map(p => base.relativize(p))
      .filter(_.getNameCount > 1)
      .groupBy(_.getName(0).toString)
      .map { case (b, fs) => b -> fs.map(_.toString).toSet }
    finally st.close()
  }

  test("enqueue is instantly probe-invisible; sub-budget flush is a no-op") {
    val dir = freshIndex("soft")
    val q = Seq((1L, "alpha gamma")).toDF("query_id", "query_text")
    val before = bucketFiles(dir)
    assert(TakedownQueue.enqueue(
      spark, dir, Seq(7L, 8L).toDF("id"), "id") === 2L)
    // soft takedown: no probe may surface a doomed id from this instant
    val hits = Retrieval.bm25TopKIndexed(dir, q, 120).select("doc_id")
      .as[Long].collect().toSet
    assert(!hits.contains(7L) && !hits.contains(8L))
    // two docs' postings cannot approach a 100% footprint budget
    val d = TakedownQueue.bm25FlushIfDue(spark, dir, budgetFraction = 1.0)
    assert(!d.flushed && d.removed === 0L && d.pending === 2L)
    assert(d.affectedFraction > 0.0 && d.nAffectedBuckets > 0L)
    assert(bucketFiles(dir) === before, "a not-due flush touched the index")
    assert(TakedownQueue.pending(spark, dir) === 2L)
  }

  test("due flush applies the whole batch once; prediction == measured footprint") {
    val dir = freshIndex("flush")
    TakedownQueue.enqueue(spark, dir, (0L until 120L by 15L).toDF("id"), "id")
    val before = bucketFiles(dir)
    val plan = TakedownQueue.bm25FlushIfDue(spark, dir, budgetFraction = 1.0)
    assert(!plan.flushed, "fixture drifted: batch hit the 100% budget")
    // force = the caller's deadline trigger
    val d = TakedownQueue.bm25FlushIfDue(
      spark, dir, budgetFraction = 1.0, force = true)
    assert(d.flushed && d.removed === 8L && d.pending === 8L)
    assert(d.nAffectedBuckets === plan.nAffectedBuckets)
    val after = bucketFiles(dir)
    // measured footprint: exactly the predicted buckets changed
    val changed = (before.keySet ++ after.keySet)
      .count(b => before.get(b) != after.get(b))
    assert(changed.toLong === d.nAffectedBuckets,
      s"predicted ${d.nAffectedBuckets} affected buckets, measured $changed")
    // exactly once: the queue drained with the flush
    assert(TakedownQueue.pending(spark, dir) === 0L)
    assert(Tombstones.read(spark, dir).isEmpty)
    val again = TakedownQueue.bm25FlushIfDue(spark, dir, force = true)
    assert(!again.flushed && again.removed === 0L && again.pending === 0L)
  }

  test("pending bound and footprint budget both trigger") {
    val dir = freshIndex("trigger")
    TakedownQueue.enqueue(spark, dir, Seq(3L, 4L, 5L).toDF("id"), "id")
    val byCount = TakedownQueue.bm25FlushIfDue(
      spark, dir, budgetFraction = 1.0, maxPending = 3L)
    assert(byCount.flushed && byCount.removed === 3L)
    TakedownQueue.enqueue(spark, dir, Seq(9L, 10L).toDF("id"), "id")
    // a tiny budget: any non-empty footprint is already over it
    val byBudget = TakedownQueue.bm25FlushIfDue(
      spark, dir, budgetFraction = 0.01)
    assert(byBudget.flushed && byBudget.removed === 2L)
    assert(TakedownQueue.pending(spark, dir) === 0L)
  }

  test("requests split across flush boundaries each apply exactly once") {
    val dir = freshIndex("boundary")
    val q = Seq((1L, "alpha beta gamma delta")).toDF("query_id", "query_text")
    TakedownQueue.enqueue(spark, dir, Seq(11L).toDF("id"), "id")
    assert(TakedownQueue.bm25FlushIfDue(spark, dir, force = true).removed === 1L)
    TakedownQueue.enqueue(spark, dir, Seq(22L, 11L).toDF("id"), "id")
    // 11 was already applied — re-enqueueing it is a tolerated no-op key
    val d = TakedownQueue.bm25FlushIfDue(spark, dir, force = true)
    assert(d.pending === 2L && d.removed === 1L)
    val hits = Retrieval.bm25TopKIndexed(dir, q, 120).select("doc_id")
      .as[Long].collect().toSet
    assert(!hits.contains(11L) && !hits.contains(22L))
    assert(spark.read.parquet(s"$dir/doclen").count() === 118L)
  }

  test("registry twin: enqueue, cost, flush; the flush stamps the merge guard") {
    val dir = s"${java.nio.file.Files
      .createTempDirectory("tdq-reg").toString}/reg"
    graft.operators.DedupRegistry.init(spark, dir, buckets = 8)
    val docs = (0L until 60L).map(i => (i, s"registry doc body $i"))
      .toDF("id", "text")
    graft.operators.DedupRegistry.ingestBatch(dir, docs, "id", "text", 0L)
    TakedownQueue.enqueue(spark, dir, (0L until 60L by 12L).toDF("id"), "id")
    val sub = TakedownQueue.registryFlushIfDue(spark, dir, budgetFraction = 1.0)
    assert(!sub.flushed && sub.pending === 5L && sub.nBuckets === 8L)
    assert(sub.affectedFraction > 0.0)
    val d = TakedownQueue.registryFlushIfDue(
      spark, dir, budgetFraction = 1.0, force = true)
    assert(d.flushed && d.removed === 5L)
    assert(spark.read.parquet(s"$dir/corpus").count() === 55L)
    assert(TakedownQueue.pending(spark, dir) === 0L)
    // the physical removal breaks merge-stats conservation — the flush
    // must leave the permanent guard standing like any registry delete
    intercept[IllegalStateException] {
      graft.operators.DedupRegistry.requirePristine(spark, dir, "spec")
    }
  }

  test("neardup twin: binding fraction spans corpus and bands tables") {
    val dir = s"${java.nio.file.Files
      .createTempDirectory("tdq-ndreg").toString}/ndreg"
    // 64 pk partitions: at modulus 8 even one doc's 16 band keys touch
    // every pk and the binding fraction is legitimately 1.0 (flush
    // always due — the honest economics of this family at tiny moduli)
    graft.operators.NearDupRegistry.init(spark, dir, buckets = 64)
    val docs = (0L until 40L)
      .map(i => (i, s"shingled document body number $i with padding words"))
      .toDF("id", "text")
    graft.operators.NearDupRegistry.ingestBatch(dir, docs, "id", "text", 0L)
    TakedownQueue.enqueue(spark, dir, Seq(3L, 17L, 31L).toDF("id"), "id")
    val sub = TakedownQueue.nearDupFlushIfDue(spark, dir, budgetFraction = 1.0)
    assert(!sub.flushed && sub.pending === 3L && sub.affectedFraction < 1.0)
    // binding fraction: at least the corpus-side share, possibly the
    // bands side (every doc spreads band keys across pk partitions)
    assert(sub.affectedFraction >=
      sub.nAffectedBuckets.toDouble / sub.nBuckets)
    val d = TakedownQueue.nearDupFlushIfDue(spark, dir, force = true)
    assert(d.flushed && d.removed === 3L)
    assert(spark.read.schema(
        "id LONG, text STRING, hs ARRAY<LONG>, bucket LONG")
      .parquet(s"$dir/corpus").count() === 37L)
    assert(TakedownQueue.pending(spark, dir) === 0L)
  }

  test("ivf twin: enqueue, cost, flush") {
    val parent = java.nio.file.Files.createTempDirectory("tdq-ivf").toString
    val dir = s"$parent/ivf"
    val rnd = new scala.util.Random(43)
    val vecs = (0L until 80L).map(i => (i, Array.fill(6)(rnd.nextGaussian()).toSeq))
      .toDF("id", "vec")
    Similarity.buildIvfIndex(vecs, "id", "vec", nlist = 4, dir)
    TakedownQueue.enqueue(spark, dir, (0L until 80L by 16L).toDF("id"), "id")
    val sub = TakedownQueue.ivfFlushIfDue(spark, dir, budgetFraction = 1.0)
    assert(!sub.flushed && sub.pending === 5L && sub.nBuckets === 4L)
    val d = TakedownQueue.ivfFlushIfDue(spark, dir, budgetFraction = 1.0,
      maxPending = 5L)
    assert(d.flushed && d.removed === 5L)
    assert(spark.read.parquet(s"$dir/corpus").count() === 75L)
    assert(TakedownQueue.pending(spark, dir) === 0L)
  }
}
