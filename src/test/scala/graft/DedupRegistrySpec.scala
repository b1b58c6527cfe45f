package graft

import org.apache.spark.sql.functions._

/** The persisted corpus registry: first-arrival semantics, every
  * recoverable-apply crash window, the read-side probe, and the
  * maintenance lifecycle (compact/delete) over streamed generations.
  */
class DedupRegistrySpec extends SparkSpec {
  import spark.implicits._

  private def reg = graft.operators.DedupRegistry

  private def corpusIds(path: String): Seq[Long] =
    spark.read.parquet(s"$path/corpus")
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq

  private def statsOf(path: String): (Long, Long) = {
    val r = spark.read.parquet(s"$path/stats").collect()(0)
    (r.getAs[Long]("n_docs"), r.getAs[Long]("n_dropped"))
  }

  test("first arrival wins within and across batches; stats exact") {
    val dir = java.nio.file.Files.createTempDirectory("reg-spec").toString
    reg.init(spark, dir, buckets = 8)
    // batch 0: one within-batch dup pair (2 and 3 share text; min id wins)
    reg.ingestBatch(dir,
      Seq((1L, "alpha"), (3L, "beta"), (2L, "beta")).toDF("doc_id", "text"),
      "doc_id", "text", 0L)
    assert(corpusIds(dir) === Seq(1L, 2L) && statsOf(dir) === ((2L, 1L)))
    // batch 1: a cross-batch dup (text "alpha" again) drops; new text lands
    reg.ingestBatch(dir,
      Seq((9L, "alpha"), (4L, "gamma")).toDF("doc_id", "text"),
      "doc_id", "text", 1L)
    assert(corpusIds(dir) === Seq(1L, 2L, 4L) && statsOf(dir) === ((3L, 2L)))
    // the registered copy keeps ITS text, not the loser's id
    val kept = spark.read.parquet(s"$dir/corpus")
      .filter(col("digest") === md5(lit("beta")))
      .select(col("id")).collect().map(_.getLong(0)).toSeq
    assert(kept === Seq(2L))
  }

  test("digest bucketing is the membership pruning contract") {
    val dir = java.nio.file.Files.createTempDirectory("reg-spec-b").toString
    reg.init(spark, dir, buckets = 4)
    val docs = (1L to 20L).map(i => (i, s"text number $i")).toDF("doc_id", "text")
    reg.ingestBatch(dir, docs, "doc_id", "text", 0L)
    // every row sits in the bucket its digest hashes to
    val misplaced = spark.read.parquet(s"$dir/corpus")
      .filter(col("bucket") =!= pmod(xxhash64(md5(col("text"))), lit(4L)))
      .count()
    assert(misplaced === 0L)
  }

  test("every crash window converges to exactly one application") {
    val dir = java.nio.file.Files.createTempDirectory("reg-spec-c").toString
    reg.init(spark, dir, buckets = 8)
    reg.ingestBatch(dir,
      Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text"),
      "doc_id", "text", 0L)
    // ---- manufactured mid-apply crash of batch 1 ----
    val junk = Seq((-999L, "__JUNK__")).toDF("id", "text")
      .withColumn("digest", md5(col("text")))
    val junkBucket = junk
      .select(pmod(xxhash64(col("digest")), lit(8L))).collect()(0).getLong(0)
    locally { // a tagged part a crashed move-in left behind
      val stage = java.nio.file.Files.createTempDirectory("reg-spec-plant").toString
      junk.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(s"$dir/corpus/bucket=$junkBucket")
      dst.mkdirs()
      java.nio.file.Files.move(part.toPath,
        new java.io.File(dst, s"b1_${part.getName}").toPath)
    }
    new java.io.File(s"$dir/_ingest_b1_tmp").mkdirs() // crash staging
    // ... plus the mid-swap window: live stats corrupted, truth in _bak
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sessionState.newHadoopConf())
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/stats"),
      new org.apache.hadoop.fs.Path(s"$dir/stats_b1_bak"))
    spark.range(1)
      .select(lit(777777L).as("n_docs"), lit(777777L).as("n_dropped"),
        lit(8L).as("buckets"))
      .coalesce(1).write.parquet(s"$dir/stats")
    // the re-delivered batch must erase all of it, then apply
    reg.ingestBatch(dir,
      Seq((5L, "beta"), (6L, "gamma")).toDF("doc_id", "text"),
      "doc_id", "text", 1L)
    assert(corpusIds(dir) === Seq(1L, 2L, 6L) && statsOf(dir) === ((3L, 1L)))
    // post-commit re-delivery: marker present -> skipped whole (a re-run
    // would recount batch 1's rows as drops)
    reg.ingestBatch(dir,
      Seq((5L, "beta"), (6L, "gamma")).toDF("doc_id", "text"),
      "doc_id", "text", 1L)
    assert(corpusIds(dir) === Seq(1L, 2L, 6L) && statsOf(dir) === ((3L, 1L)))
    // no _bak/_new/_tmp debris survives a completed apply
    val debris = new java.io.File(dir).listFiles().map(_.getName)
      .filter(n => n.contains("_bak") || n.contains("_new") || n.contains("_tmp"))
    assert(debris.isEmpty, s"leftover apply state: ${debris.mkString(", ")}")
    // an empty batch commits as a no-op marker: stats untouched, id burned
    reg.ingestBatch(dir, Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text", 2L)
    assert(statsOf(dir) === ((3L, 1L)))
    assert(new java.io.File(s"$dir/ingestlog").list()
      .filterNot(_.startsWith(".")).sorted.toSeq === Seq("b0", "b1", "b2"))
  }

  test("a crash-erased generation on an EMPTY registry still applies cleanly") {
    // the membership read must survive a corpus whose only bucket dirs
    // are husks left by recovery (no parquet files -> no inference)
    val dir = java.nio.file.Files.createTempDirectory("reg-spec-e").toString
    reg.init(spark, dir, buckets = 8)
    val junk = Seq((-999L, "__JUNK__")).toDF("id", "text")
      .withColumn("digest", md5(col("text")))
    val junkBucket = junk
      .select(pmod(xxhash64(col("digest")), lit(8L))).collect()(0).getLong(0)
    val stage = java.nio.file.Files.createTempDirectory("reg-spec-e-pl").toString
    junk.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dst = new java.io.File(s"$dir/corpus/bucket=$junkBucket")
    dst.mkdirs()
    java.nio.file.Files.move(part.toPath,
      new java.io.File(dst, s"b0_${part.getName}").toPath)
    // reachable-state fidelity: a real mid-apply crash always leaves
    // the batch's staging dir (deleted strictly after the marker), and
    // the recovery sweep is gated on it
    new java.io.File(s"$dir/_ingest_b0_tmp").mkdirs()
    reg.ingestBatch(dir,
      Seq((1L, "alpha")).toDF("doc_id", "text"), "doc_id", "text", 0L)
    assert(corpusIds(dir) === Seq(1L) && statsOf(dir) === ((1L, 0L)))
  }

  test("probe answers membership without mutating; loud-fail on null text") {
    val dir = java.nio.file.Files.createTempDirectory("reg-spec-p").toString
    reg.init(spark, dir, buckets = 8)
    // probe against an EMPTY registry: everything is new
    val pre = reg.probe(spark, dir,
        Seq((9L, "alpha")).toDF("doc_id", "text"), "doc_id", "text")
      .select(col("doc_id"), col("is_new")).collect()
    assert(pre.map(r => (r.getLong(0), r.getBoolean(1))).toSeq === Seq((9L, true)))
    reg.ingestBatch(dir,
      Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text"),
      "doc_id", "text", 0L)
    val flags = reg.probe(spark, dir,
        Seq((10L, "alpha"), (11L, "new text"), (12L, "new text"))
          .toDF("doc_id", "text"),
        "doc_id", "text")
      .select(col("doc_id"), col("is_new")).collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).sorted.toSeq
    // membership only: both copies of the unseen text flag new
    assert(flags === Seq((10L, false), (11L, true), (12L, true)))
    assert(statsOf(dir) === ((2L, 0L))) // probe mutated nothing
    val ex = intercept[Exception] {
      reg.probe(spark, dir,
        Seq((13L, null: String)).toDF("doc_id", "text"), "doc_id", "text")
          .collect()
    }
    assert(ex.getMessage.contains("null text"))
    val ex2 = intercept[Exception] {
      reg.ingestBatch(dir,
        Seq((14L, null: String)).toDF("doc_id", "text"), "doc_id", "text", 1L)
    }
    assert(ex2.getMessage.contains("null text"))
  }

  test("maintenance is layout-blind over streamed generations") {
    val dir = java.nio.file.Files.createTempDirectory("reg-spec-m").toString
    reg.init(spark, dir, buckets = 4)
    (0 until 3).foreach { b =>
      reg.ingestBatch(dir,
        (1L to 12L).filter(_ % 3 == b.toLong)
          .map(i => (i + 100L * b, s"doc number $i")).toDF("doc_id", "text"),
        "doc_id", "text", b.toLong)
    }
    // cross-batch dups dropped: batch 1's "doc number 3k" ids never collide
    val before = corpusIds(dir)
    val (nd, _) = statsOf(dir)
    assert(before.size.toLong === nd)
    // compact collapses the per-batch file sets; content identical
    reg.compact(spark, dir)
    assert(corpusIds(dir) === before)
    val multi = new java.io.File(s"$dir/corpus").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .filter(_.listFiles().count(_.getName.endsWith(".parquet")) > 1)
    assert(multi.isEmpty, s"uncompacted buckets: ${multi.mkString(", ")}")
    // takedown: rows out, stats decremented, content re-acceptable
    val doomed = before.head
    assert(reg.delete(spark, dir, Seq(doomed).toDF("doc_id"), "doc_id") === 1L)
    assert(corpusIds(dir) === before.tail)
    assert(statsOf(dir)._1 === nd - 1)
    // the deleted content's digest left with it: the same text re-ingests
    val textOf = spark.read.parquet(s"$dir/corpus").count() // corpus readable
    assert(textOf === nd - 1)
    // absent key: zero-footprint no-op
    assert(reg.delete(spark, dir, Seq(99999L).toDF("doc_id"), "doc_id") === 0L)
  }

  test("batchRows reads back exactly the committed accepted slice") {
    val dir = java.nio.file.Files.createTempDirectory("reg-spec-br").toString
    reg.init(spark, dir, buckets = 4)
    reg.ingestBatch(dir,
      Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text"),
      "doc_id", "text", 0L)
    reg.ingestBatch(dir,
      Seq((5L, "beta"), (6L, "gamma")).toDF("doc_id", "text"),
      "doc_id", "text", 1L)
    def rows(b: Long) = reg.batchRows(spark, dir, b)
      .select(col("id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(rows(0L) === Seq((1L, "alpha"), (2L, "beta")))
    assert(rows(1L) === Seq((6L, "gamma"))) // the dup never committed
    assert(rows(7L) === Seq.empty)          // unknown batch: empty
  }

  test("curate-then-index composition converges with crashes on BOTH artifacts") {
    val regDir = java.nio.file.Files.createTempDirectory("reg-spec-ci").toString
    val idxDir = java.nio.file.Files.createTempDirectory("reg-spec-ci-idx").toString + "/idx"
    reg.init(spark, regDir, buckets = 8)
    graft.operators.Retrieval.bm25Init(spark, idxDir, buckets = 7)
    val sink = reg.dedupIndexStreamSink(regDir, idxDir, "doc_id", "text")
    val q = Seq((1L, "apple cherry")).toDF("query_id", "query_text")
    def probe(path: String) =
      graft.operators.Retrieval.bm25TopKIndexed(path, q, 10)
        .collect().map(_.toString).sorted.toSeq
    // batch 0 through the composed sink
    sink(Seq((1L, "apple banana"), (2L, "cherry")).toDF("doc_id", "text"), 0L)
    // crash windows for batch 1 on BOTH artifacts: a tagged registry
    // part and tagged index parts
    val junk = Seq((-9L, "__J__")).toDF("id", "text")
      .withColumn("digest", md5(col("text")))
    val jb = junk.select(pmod(xxhash64(col("digest")), lit(8L)))
      .collect()(0).getLong(0)
    def plant(df: org.apache.spark.sql.DataFrame, dst: String): Unit = {
      val stage = java.nio.file.Files.createTempDirectory("reg-ci-pl").toString
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      new java.io.File(dst).mkdirs()
      java.nio.file.Files.move(part.toPath,
        new java.io.File(dst, s"b1_${part.getName}").toPath)
    }
    plant(junk, s"$regDir/corpus/bucket=$jb")
    new java.io.File(s"$regDir/_ingest_b1_tmp").mkdirs() // crash staging
    val appleBucket = spark.range(1)
      .select(pmod(xxhash64(lit("apple")), lit(7L))).collect()(0).getLong(0)
    plant(Seq((-9L, "apple", 50L)).toDF("id", "term", "tf"),
      s"$idxDir/postings/bucket=$appleBucket")
    plant(Seq((-9L, 50L)).toDF("id", "dl"), s"$idxDir/doclen")
    new java.io.File(s"$idxDir/_ingest_b1_tmp").mkdirs() // crash staging
    // batch 1: one dup (dropped) + one new doc; both recoveries fire
    sink(Seq((5L, "cherry"), (6L, "apple durian")).toDF("doc_id", "text"), 1L)
    // the standing index == a from-scratch build over the deduped corpus
    val want = {
      val p = java.nio.file.Files.createTempDirectory("reg-ci-rb").toString
      graft.operators.Retrieval.buildBm25Index(
        Seq((1L, "apple banana"), (2L, "cherry"), (6L, "apple durian"))
          .toDF("doc_id", "text"),
        "doc_id", "text", p, buckets = 7)
      probe(p)
    }
    assert(probe(idxDir) === want)
    // post-commit re-delivery of batch 1 through the composed apply:
    // both markers skip, nothing changes
    sink(Seq((5L, "cherry"), (6L, "apple durian")).toDF("doc_id", "text"), 1L)
    assert(probe(idxDir) === want)
    assert(statsOf(regDir) === ((3L, 1L)))
    val idxStats = spark.read.parquet(s"$idxDir/stats").collect()(0)
    assert(idxStats.getAs[Long]("n_docs") === 3L)
  }

  test("tombstone overlay: digest stops blocking instantly, carried by merge, cleared by delete") {
    val dir = java.nio.file.Files.createTempDirectory("reg-spec-t").toString
    reg.init(spark, dir, buckets = 8)
    reg.ingestBatch(dir,
      Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text"),
      "doc_id", "text", 0L)
    // membership blocks while doc 1 is live
    assert(!reg.probe(spark, dir, Seq((9L, "alpha")).toDF("doc_id", "text"),
      "doc_id", "text").select(col("is_new")).collect()(0).getBoolean(0))
    // tombstone doc 1: instant, no rewrite; content re-acceptable NOW
    graft.operators.Tombstones.add(spark, dir, Seq(1L).toDF("doc_id"), "doc_id")
    assert(corpusIds(dir) === Seq(1L, 2L))
    assert(reg.probe(spark, dir, Seq((9L, "alpha")).toDF("doc_id", "text"),
      "doc_id", "text").select(col("is_new")).collect()(0).getBoolean(0))
    reg.ingestBatch(dir, Seq((7L, "alpha")).toDF("doc_id", "text"),
      "doc_id", "text", 1L)
    assert(corpusIds(dir) === Seq(1L, 2L, 7L))
    // fsck: dup digest across (tombstoned, re-accepted) is legitimate
    // in the served registry; overlay audited
    assert(graft.operators.Fsck.registryFsck(spark, dir).count() === 0L)
    // merge: tombstoned doc must NOT evict the live duplicate via the
    // min-id ranking — it is carried verbatim with the overlay
    val dir2 = java.nio.file.Files.createTempDirectory("reg-spec-t2").toString
    reg.init(spark, dir2, buckets = 8)
    reg.ingestBatch(dir2, Seq((50L, "gamma")).toDF("doc_id", "text"),
      "doc_id", "text", 0L)
    val merged = java.nio.file.Files
      .createTempDirectory("reg-spec-tm").toString + "/m"
    reg.merge(spark, Seq(dir, dir2), merged)
    assert(corpusIds(merged).toSet === Set(1L, 2L, 7L, 50L),
      "merge must carry the tombstoned row and keep the live duplicate")
    assert(graft.operators.Tombstones.read(spark, merged)
      .exists(_.collect().map(_.getLong(0)).toSeq === Seq(1L)))
    // vacuum applies + clears; the re-accepted content keeps serving
    assert(reg.vacuum(spark, merged) === 1L)
    assert(corpusIds(merged).toSet === Set(2L, 7L, 50L))
    assert(graft.operators.Tombstones.read(spark, merged).isEmpty)
    assert(!reg.probe(spark, merged, Seq((9L, "alpha")).toDF("doc_id", "text"),
      "doc_id", "text").select(col("is_new")).collect()(0).getBoolean(0))
    assert(graft.operators.Fsck.registryFsck(spark, merged).count() === 0L)
  }

  test("init refuses a pre-existing registry and bad moduli") {
    val dir = java.nio.file.Files.createTempDirectory("reg-spec-i").toString
    reg.init(spark, dir, buckets = 2)
    intercept[IllegalArgumentException] { reg.init(spark, dir, 2) }
    intercept[IllegalArgumentException] {
      reg.init(spark, dir + "-x", buckets = 0)
    }
    intercept[IllegalArgumentException] {
      reg.ingestBatch(dir, Seq((1L, "a")).toDF("doc_id", "text"),
        "doc_id", "text", -1L)
    }
  }
}
