package graft

import graft.operators.{Retrieval, Similarity, StableRead, Tombstones}
import org.apache.spark.sql.functions._

/** The reader-racing-maintenance drill the round-14 verdict asked for:
  * federated probes fire from a second thread WHILE compact/vacuum
  * swaps churn the estate, and every returned relation must equal the
  * survivors-only oracle — never a blend, never an exception. The
  * tombstone-exactness contract makes pre-vacuum == post-vacuum
  * bit-for-bit (applyTombstones adjusts df/N/avgdl exactly; compact is
  * content-blind), so ONE expected relation covers every instant; the
  * probes run under [[StableRead.stable]], whose fingerprint
  * validation + maintenance marker are the mechanism under test.
  */
class ReaderMaintenanceRaceSpec extends SparkSpec {
  import spark.implicits._

  private def norm(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
    rows.map(_.toString).sorted.toSeq

  test("bm25 federated probes racing compact+vacuum churn read only pre/post states") {
    val parent = java.nio.file.Files
      .createTempDirectory("race-spec-bm25").toString
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")
    val docs = (0L until 240L).map { i =>
      (i, Seq.fill(3 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    }.toDF("doc_id", "text").localCheckpoint(true)
    val a = s"$parent/a"; val b = s"$parent/b"
    // mixed moduli on purpose (the federated contract)
    Retrieval.buildBm25Index(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", a, buckets = 8)
    Retrieval.buildBm25Index(
      docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text", b, buckets = 31)
    // pending takedowns on shard a: every probe below must already
    // exclude them (tombstone-first serving), and the mid-race vacuum
    // physically applies them without moving any probe
    Tombstones.add(spark, a,
      (0L until 240L by 10L).toDF("id"), "id")
    val queries = Seq(
      (1L, "alpha gamma"), (2L, "beta zeta kappa"),
      (3L, "mu iota"), (4L, "theta theta delta"))
      .toDF("query_id", "query_text").localCheckpoint(true)
    def probe() = StableRead.stable(spark, Seq(a, b), maxAttempts = 200) {
      Retrieval.bm25TopKFederated(spark, Seq(a, b), queries, 10)
    }
    val expected = norm(probe().collect())
    assert(expected.nonEmpty)
    // the oracle relation: a federated probe over SURVIVORS-ONLY
    // rebuilt shards — pins the expected snapshot to first principles,
    // not to the implementation's own pre-state
    val aClean = s"$parent/a_clean"
    Retrieval.buildBm25Index(
      docs.filter(col("doc_id") % 2 === 0 && col("doc_id") % 10 =!= 0),
      "doc_id", "text", aClean, buckets = 8)
    assert(norm(Retrieval.bm25TopKFederated(
      spark, Seq(aClean, b), queries, 10).collect()) === expected,
      "tombstoned probe diverged from the survivors-only oracle")

    // churn: finite maintenance burst on a second thread — compacts
    // (content-blind swaps) around a mid-burst vacuum (the real
    // cross-table rewrite)
    val writer = scala.concurrent.Future {
      (1 to 3).foreach { i =>
        Retrieval.bm25Compact(spark, a)
        Retrieval.bm25Compact(spark, b)
        if (i == 2) assert(Retrieval.bm25Vacuum(spark, a) === 24L)
      }
    }(scala.concurrent.ExecutionContext.global)
    var raced = 0
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    while (!writer.isCompleted || raced < 3) {
      val got = norm(probe().collect())
      if (got != expected)
        bad += s"probe $raced diverged (${got.size} vs ${expected.size} rows)"
      raced += 1
    }
    scala.concurrent.Await.result(
      writer, scala.concurrent.duration.Duration.Inf)
    assert(bad.isEmpty, bad.mkString("; "))
    assert(raced >= 3)
    // post-churn: overlay gone (vacuum cleared it), relation unmoved
    assert(Tombstones.read(spark, a).isEmpty)
    assert(norm(probe().collect()) === expected)
  }

  test("ivf federated probes racing compact+vacuum churn read only pre/post states") {
    val parent = java.nio.file.Files
      .createTempDirectory("race-spec-ivf").toString
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 160L).map { i =>
      (i, Array.fill(8)(rnd.nextGaussian()).toSeq)
    }.toDF("id", "vec").localCheckpoint(true)
    val a = s"$parent/a"; val b = s"$parent/b"
    Similarity.buildIvfIndex(
      vecs.filter(col("id") % 2 === 0), "id", "vec", nlist = 4, a)
    Similarity.buildIvfIndex(
      vecs.filter(col("id") % 2 =!= 0), "id", "vec", nlist = 4, b)
    Tombstones.add(spark, a, (0L until 160L by 8L).toDF("id"), "id")
    val queries = (101L to 104L).map { q =>
      val r2 = new scala.util.Random(q)
      (q, Array.fill(8)(r2.nextGaussian()).toSeq)
    }.toDF("qid", "qvec").localCheckpoint(true)
    // nprobe == nlist: exhaustive cells, so the relation is exact and
    // vacuum/compact cannot move it
    def probe() = StableRead.stable(spark, Seq(a, b), maxAttempts = 200) {
      Similarity.ivfTopKFederated(Seq(a, b), queries, "qid", "qvec", 10,
        nprobe = 4)
    }
    val expected = norm(probe().collect())
    assert(expected.nonEmpty)
    val writer = scala.concurrent.Future {
      (1 to 3).foreach { i =>
        Similarity.ivfCompact(spark, a)
        Similarity.ivfCompact(spark, b)
        if (i == 2) assert(Similarity.ivfVacuum(spark, a) === 20L)
      }
    }(scala.concurrent.ExecutionContext.global)
    var raced = 0
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    while (!writer.isCompleted || raced < 3) {
      val got = norm(probe().collect())
      if (got != expected)
        bad += s"probe $raced diverged (${got.size} vs ${expected.size} rows)"
      raced += 1
    }
    scala.concurrent.Await.result(
      writer, scala.concurrent.duration.Duration.Inf)
    assert(bad.isEmpty, bad.mkString("; "))
    assert(raced >= 3)
    assert(norm(probe().collect()) === expected)
  }

  test("probes racing a live ingest stream read only committed prefix states") {
    // the serving question the compact/vacuum arms don't cover: a stack
    // probing CONTINUOUSLY while batches apply. Every stable probe must
    // equal the relation of the index after SOME batch prefix — never a
    // half-applied batch (new postings against old stats), which the
    // ingest apply's maintenance marker + fingerprint validation forbid.
    val parent = java.nio.file.Files
      .createTempDirectory("race-spec-ingest").toString
    val idx = s"$parent/idx"
    Retrieval.bm25Init(spark, idx, buckets = 8)
    val rnd = new scala.util.Random(13)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val batches = (0 until 4).map { b =>
      (0 until 30).map { i =>
        // per-doc padding makes dl (and so every BM25 norm) distinct
        // enough that no two docs tie at the rounded score — a tie's
        // ORDER depends on the raw sum's low bits, which legitimately
        // differ between the direct and indexed plans' addition orders
        (b * 100L + i,
          (Seq.fill(2 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.length))) ++
            Seq.fill((b * 30 + i) % 17)("pad")).mkString(" "))
      }
    }
    val queries = Seq((1L, "alpha gamma"), (2L, "beta zeta epsilon"))
      .toDF("query_id", "query_text").localCheckpoint(true)
    // expected prefix relations from FIRST PRINCIPLES: the direct-scan
    // bm25TopK over each committed prefix corpus (indexed probe parity
    // is pinned elsewhere — q134)
    val expected: Seq[Seq[String]] = (0 to 4).map { k =>
      if (k == 0) Seq.empty
      else norm(Retrieval.bm25TopK(
        batches.take(k).flatten.toDF("doc_id", "text"),
        "doc_id", "text", queries, 10).collect())
    }
    val writer = scala.concurrent.Future {
      batches.zipWithIndex.foreach { case (docs, b) =>
        Retrieval.bm25IngestBatch(
          idx, docs.toDF("doc_id", "text"), "doc_id", "text", b.toLong)
        Thread.sleep(30L)
      }
    }(scala.concurrent.ExecutionContext.global)
    var raced = 0
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    while (!writer.isCompleted || raced < 3) {
      val got = norm(StableRead.stable(spark, Seq(idx), maxAttempts = 200) {
        Retrieval.bm25TopKIndexed(idx, queries, 10)
      }.collect())
      if (!expected.contains(got))
        bad += s"probe $raced matched no committed prefix (${got.size} rows)"
      raced += 1
    }
    scala.concurrent.Await.result(
      writer, scala.concurrent.duration.Duration.Inf)
    assert(bad.isEmpty, bad.mkString("; "))
    assert(raced >= 3)
    assert(norm(StableRead.stable(spark, Seq(idx)) {
      Retrieval.bm25TopKIndexed(idx, queries, 10)
    }.collect()) === expected(4), "final state is not the full corpus")
  }

  test("stable read refuses a stranded maintenance marker loudly") {
    val parent = java.nio.file.Files
      .createTempDirectory("race-spec-marker").toString
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma"))
      .toDF("doc_id", "text")
    val idx = s"$parent/idx"
    Retrieval.buildBm25Index(docs, "doc_id", "text", idx, buckets = 4)
    val q = Seq((1L, "alpha")).toDF("query_id", "query_text")
    // a crashed delete leaves its marker standing; stable probes must
    // fail loudly, not return the partial state
    val marker = new org.apache.hadoop.fs.Path(
      s"$idx/${StableRead.MarkerName}")
    marker.getFileSystem(spark.sessionState.newHadoopConf())
      .create(marker, true).close()
    val e = intercept[IllegalStateException] {
      StableRead.stable(spark, Seq(idx), maxAttempts = 3) {
        Retrieval.bm25TopKIndexed(idx, q, 5)
      }
    }
    assert(e.getMessage.contains("no consistent read"))
    // the interrupted op's re-run clears it (bm25Delete on the same —
    // here empty — key set), and probes resume
    assert(Retrieval.bm25Delete(spark, idx, Seq(99L).toDF("id"), "id") === 0L)
    assert(StableRead.stable(spark, Seq(idx)) {
      Retrieval.bm25TopKIndexed(idx, q, 5)
    }.count() === 1L)
  }

  test("pinned probes never starve under CONTINUOUS back-to-back churn") {
    // the round-16 residual: a writer churning maintenance with no gaps
    // starves stable()'s optimistic validate-retry loop. Pinned probes
    // resolve one committed generation and read exactly its files —
    // DEFAULT maxAttempts, no gap required, every probe must land.
    val parent = java.nio.file.Files
      .createTempDirectory("race-spec-pinned").toString
    val idx = s"$parent/idx"
    val docs = (0L until 60L).map(i => (i, s"alpha beta w$i"))
      .toDF("doc_id", "text")
    Retrieval.buildBm25Index(docs, "doc_id", "text", idx, buckets = 4)
    val q = Seq((1L, "alpha")).toDF("query_id", "query_text")
      .localCheckpoint(true)
    def probe() = {
      val df = StableRead.pinned(spark, Seq(idx)) {
        Retrieval.bm25TopKIndexed(idx, q, 5)
      }
      val out = df.collect().map(_.toString).sorted.toSeq
      StableRead.release(df)
      out
    }
    val expected = probe()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val churn = scala.concurrent.Future {
      var n = 0
      while (!stop.get()) { Retrieval.bm25Compact(spark, idx); n += 1 }
      n
    }(scala.concurrent.ExecutionContext.global)
    try {
      // every probe under the zero-gap writer: content-blind churn, so
      // every committed generation yields the same relation
      (1 to 6).foreach { i =>
        assert(probe() === expected, s"pinned probe $i diverged mid-churn")
      }
    } finally stop.set(true)
    val rounds = scala.concurrent.Await.result(
      churn, scala.concurrent.duration.Duration.Inf)
    assert(rounds >= 2, s"churn too slow to exercise the race ($rounds)")
    // retention hygiene closes the loop: GC the churn's shed versions,
    // current-generation probes unaffected
    StableRead.expireRetired(spark, idx)
    assert(probe() === expected)
  }
}
