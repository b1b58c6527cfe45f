package graft

import org.apache.spark.sql.functions._

/** The persisted NEAR-duplicate registry: certainty on identical texts,
  * the smaller-id within-batch policy, crash-window convergence over
  * both tables, the read-side probe, and the maintenance lifecycle
  * (including takedown removing a doc's dedup-witness role).
  */
class NearDupRegistrySpec extends SparkSpec {
  import spark.implicits._

  private def reg = graft.operators.NearDupRegistry

  private def corpusIds(path: String): Seq[Long] =
    spark.read.parquet(s"$path/corpus")
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq

  private def bandIds(path: String): Seq[Long] =
    spark.read.schema("band INT, bkey INT, id LONG, pk LONG")
      .parquet(s"$path/bands")
      .select(col("id")).distinct().collect().map(_.getLong(0)).sorted.toSeq

  private def statsOf(path: String): (Long, Long) = {
    val r = spark.read.parquet(s"$path/stats").collect()(0)
    (r.getAs[Long]("n_docs"), r.getAs[Long]("n_dropped"))
  }

  test("identical texts drop with certainty; distinct texts pass; policy holds") {
    val dir = java.nio.file.Files.createTempDirectory("ndreg-spec").toString
    reg.init(spark, dir, buckets = 8)
    // batch 0: three identical rows -> ids 2 and 3 drop against id 1
    // (the smaller-id policy; the partner need not itself survive)
    reg.ingestBatch(dir,
      Seq((1L, "alpha beta gamma delta"), (3L, "alpha beta gamma delta"),
        (2L, "alpha beta gamma delta"), (4L, "omega psi chi phi"))
        .toDF("doc_id", "text"),
      "doc_id", "text", 0L)
    assert(corpusIds(dir) === Seq(1L, 4L) && statsOf(dir) === ((2L, 2L)))
    // the accepted docs' band keys are registered alongside
    assert(bandIds(dir) === Seq(1L, 4L))
    // batch 1: an exact copy of a REGISTERED doc drops; new content lands
    reg.ingestBatch(dir,
      Seq((9L, "alpha beta gamma delta"), (10L, "rho sigma tau upsilon"))
        .toDF("doc_id", "text"),
      "doc_id", "text", 1L)
    assert(corpusIds(dir) === Seq(1L, 4L, 10L) && statsOf(dir) === ((3L, 3L)))
    // soundness of every drop: each dropped id's text verifies at
    // J = 1.0 against a registered or smaller-id row (trivially true
    // here — all drops were identical texts)
  }

  test("near-identical (not exact) drops verify; dissimilar rows always pass") {
    val dir = java.nio.file.Files.createTempDirectory("ndreg-spec-n").toString
    reg.init(spark, dir, buckets = 8, threshold = 0.5)
    val base = "the quick brown fox jumps over the lazy dog again and again"
    reg.ingestBatch(dir,
      Seq((1L, base)).toDF("doc_id", "text"), "doc_id", "text", 0L)
    // a trailing-junk variant (high but < 1.0 Jaccard) and an unrelated doc
    reg.ingestBatch(dir,
      Seq((5L, base + " zz"), (6L, "completely different text about ships"))
        .toDF("doc_id", "text"),
      "doc_id", "text", 1L)
    val ids = corpusIds(dir)
    // the unrelated doc is ALWAYS accepted
    assert(ids.contains(6L))
    // IF the variant dropped, it must genuinely verify >= 0.5 vs doc 1
    // (recompute the exact shingle-set Jaccard independently)
    if (!ids.contains(5L)) {
      val j = Seq((base, base + " zz")).toDF("a", "b")
        .select((size(array_intersect(
            graft.operators.Dedup.shingles(col("a"), 3),
            graft.operators.Dedup.shingles(col("b"), 3))).cast("double") /
          size(array_union(
            graft.operators.Dedup.shingles(col("a"), 3),
            graft.operators.Dedup.shingles(col("b"), 3)))).as("j"))
        .collect()(0).getDouble(0)
      assert(j >= 0.5, s"dropped a row whose true jaccard is $j")
    }
    val (nd, ndr) = statsOf(dir)
    assert(nd === ids.size.toLong && nd + ndr === 3L)
  }

  test("empty-shingle rows are always accepted, even identical ones") {
    val dir = java.nio.file.Files.createTempDirectory("ndreg-spec-e").toString
    reg.init(spark, dir, buckets = 4, shingleSize = 3)
    reg.ingestBatch(dir,
      Seq((1L, "too short"), (2L, "too short")).toDF("doc_id", "text"),
      "doc_id", "text", 0L)
    assert(corpusIds(dir) === Seq(1L, 2L) && statsOf(dir) === ((2L, 0L)))
    assert(bandIds(dir) === Seq.empty) // no sketches to register
  }

  test("every crash window converges over corpus, bands, and stats") {
    val dir = java.nio.file.Files.createTempDirectory("ndreg-spec-c").toString
    reg.init(spark, dir, buckets = 8)
    reg.ingestBatch(dir,
      Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text"),
      "doc_id", "text", 0L)
    // manufacture a mid-apply crash of batch 1: tagged junk in BOTH
    // partitioned tables + the stats mid-swap window
    def plant(df: org.apache.spark.sql.DataFrame, dst: String): Unit = {
      val stage = java.nio.file.Files.createTempDirectory("ndreg-pl").toString
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      new java.io.File(dst).mkdirs()
      java.nio.file.Files.move(part.toPath,
        new java.io.File(dst, s"b1_${part.getName}").toPath)
    }
    plant(Seq((-9L, "__J__", Seq(1L, 2L))).toDF("id", "text", "hs"),
      s"$dir/corpus/bucket=3")
    plant(Seq((0, 12345, -9L)).toDF("band", "bkey", "id"),
      s"$dir/bands/pk=1")
    new java.io.File(s"$dir/_ingest_b1_tmp").mkdirs() // crash staging
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sessionState.newHadoopConf())
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/stats"),
      new org.apache.hadoop.fs.Path(s"$dir/stats_b1_bak"))
    spark.range(1)
      .select(lit(777L).as("n_docs"), lit(777L).as("n_dropped"),
        lit(8L).as("buckets"), lit(3L).as("shingle_size"),
        lit(64L).as("num_hashes"), lit(16L).as("bands"),
        lit(0.5).as("threshold"))
      .coalesce(1).write.parquet(s"$dir/stats")
    // re-delivery of batch 1 erases all of it, then applies
    reg.ingestBatch(dir,
      Seq((5L, "alpha beta gamma delta"), (6L, "rho sigma tau upsilon"))
        .toDF("doc_id", "text"),
      "doc_id", "text", 1L)
    assert(corpusIds(dir) === Seq(1L, 6L) && bandIds(dir) === Seq(1L, 6L))
    assert(statsOf(dir) === ((2L, 1L)))
    // post-commit re-delivery: skipped whole
    reg.ingestBatch(dir,
      Seq((5L, "alpha beta gamma delta"), (6L, "rho sigma tau upsilon"))
        .toDF("doc_id", "text"),
      "doc_id", "text", 1L)
    assert(statsOf(dir) === ((2L, 1L)))
    val debris = new java.io.File(dir).listFiles().map(_.getName)
      .filter(n => n.contains("_bak") || n.contains("_new") || n.contains("_tmp"))
    assert(debris.isEmpty, s"leftover apply state: ${debris.mkString(", ")}")
    // empty batch burns its id
    reg.ingestBatch(dir, Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text", 2L)
    assert(statsOf(dir) === ((2L, 1L)))
    assert(new java.io.File(s"$dir/ingestlog").list()
      .filterNot(_.startsWith(".")).sorted.toSeq === Seq("b0", "b1", "b2"))
  }

  test("probe flags registered near-dups without mutating") {
    val dir = java.nio.file.Files.createTempDirectory("ndreg-spec-p").toString
    reg.init(spark, dir, buckets = 8)
    // probe of an empty registry: everything new
    val pre = reg.probe(spark, dir,
        Seq((9L, "alpha beta gamma delta")).toDF("doc_id", "text"),
        "doc_id", "text")
      .select(col("doc_id"), col("is_new")).collect()
    assert(pre.map(r => (r.getLong(0), r.getBoolean(1))).toSeq === Seq((9L, true)))
    reg.ingestBatch(dir,
      Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text"),
      "doc_id", "text", 0L)
    val flags = reg.probe(spark, dir,
        Seq((10L, "alpha beta gamma delta"), (11L, "unrelated words here now"))
          .toDF("doc_id", "text"),
        "doc_id", "text")
      .select(col("doc_id"), col("is_new")).collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).sorted.toSeq
    assert(flags === Seq((10L, false), (11L, true)))
    assert(statsOf(dir) === ((1L, 0L)))
  }

  test("maintenance: compact preserves both tables; delete removes the witness") {
    val dir = java.nio.file.Files.createTempDirectory("ndreg-spec-m").toString
    reg.init(spark, dir, buckets = 4)
    reg.ingestBatch(dir,
      Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text"),
      "doc_id", "text", 0L)
    reg.ingestBatch(dir,
      Seq((2L, "epsilon zeta eta theta")).toDF("doc_id", "text"),
      "doc_id", "text", 1L)
    val (ids0, bids0) = (corpusIds(dir), bandIds(dir))
    reg.compact(spark, dir)
    assert(corpusIds(dir) === ids0 && bandIds(dir) === bids0)
    // takedown: the doc leaves corpus AND bands, and stops witnessing
    assert(reg.delete(spark, dir, Seq(1L).toDF("doc_id"), "doc_id") === 1L)
    assert(corpusIds(dir) === Seq(2L) && bandIds(dir) === Seq(2L))
    assert(statsOf(dir)._1 === 1L)
    reg.ingestBatch(dir,
      Seq((7L, "alpha beta gamma delta")).toDF("doc_id", "text"),
      "doc_id", "text", 2L)
    assert(corpusIds(dir) === Seq(2L, 7L)) // re-accepted: witness gone
  }

  test("tombstone overlay: witness suspended instantly, carried by merge, cleared by delete") {
    val dir = java.nio.file.Files.createTempDirectory("ndreg-spec-t").toString
    reg.init(spark, dir, buckets = 4)
    reg.ingestBatch(dir,
      Seq((1L, "alpha beta gamma delta"), (2L, "epsilon zeta eta theta"))
        .toDF("doc_id", "text"),
      "doc_id", "text", 0L)
    // an exact copy of doc 1 is blocked while doc 1 witnesses
    val pre = reg.probe(spark, dir,
        Seq((9L, "alpha beta gamma delta")).toDF("doc_id", "text"),
        "doc_id", "text")
      .select(col("is_new")).collect()(0).getBoolean(0)
    assert(!pre)
    // tombstone doc 1: the witness role suspends INSTANTLY — no rewrite
    graft.operators.Tombstones.add(spark, dir, Seq(1L).toDF("doc_id"), "doc_id")
    assert(corpusIds(dir) === Seq(1L, 2L)) // physically still present
    val post = reg.probe(spark, dir,
        Seq((9L, "alpha beta gamma delta")).toDF("doc_id", "text"),
        "doc_id", "text")
      .select(col("is_new")).collect()(0).getBoolean(0)
    assert(post, "tombstoned doc still witnessing at probe time")
    // ingest of the same content is now ACCEPTED (takedown semantics)
    reg.ingestBatch(dir,
      Seq((7L, "alpha beta gamma delta")).toDF("doc_id", "text"),
      "doc_id", "text", 1L)
    assert(corpusIds(dir) === Seq(1L, 2L, 7L))
    // fsck: the served-registry semantic invariant tolerates the
    // (tombstoned, re-accepted) near-pair; the overlay itself audits
    assert(graft.operators.Fsck.nearDupRegistryFsck(spark, dir)
      .count() === 0L)
    // merge carries the overlay and the tombstoned doc does not witness
    // cross-shard either
    val dir2 = java.nio.file.Files.createTempDirectory("ndreg-spec-t2").toString
    reg.init(spark, dir2, buckets = 4)
    reg.ingestBatch(dir2,
      Seq((50L, "iota kappa lambda mu")).toDF("doc_id", "text"),
      "doc_id", "text", 0L)
    val merged = java.nio.file.Files
      .createTempDirectory("ndreg-spec-tm").toString + "/m"
    reg.merge(spark, Seq(dir, dir2), merged)
    assert(corpusIds(merged).toSet === Set(1L, 2L, 7L, 50L))
    val mOverlay = graft.operators.Tombstones.read(spark, merged)
    assert(mOverlay.exists(_.collect().map(_.getLong(0)).toSeq === Seq(1L)))
    // vacuum physically applies and clears
    assert(reg.vacuum(spark, merged) === 1L)
    assert(corpusIds(merged).toSet === Set(2L, 7L, 50L))
    assert(bandIds(merged).toSet === Set(2L, 7L, 50L))
    assert(graft.operators.Tombstones.read(spark, merged).isEmpty)
    assert(graft.operators.Fsck.nearDupRegistryFsck(spark, merged)
      .count() === 0L)
  }

  test("delete crash windows converge: orphan bands removed, stats self-heal") {
    val dir = java.nio.file.Files.createTempDirectory("ndreg-spec-dw").toString
    reg.init(spark, dir, buckets = 4)
    reg.ingestBatch(dir,
      Seq((1L, "alpha beta gamma delta"), (2L, "epsilon zeta eta theta"))
        .toDF("doc_id", "text"),
      "doc_id", "text", 0L)
    // manufacture the between-rewrites crash: the corpus rewrite landed
    // but the bands rewrite and the stats swap did not
    graft.sinks.Sinks.deleteRows(
      spark, s"$dir/corpus", "bucket", "id", Seq(1L).toDF("id"))
    // interim state is detected, not silent
    val kinds = graft.operators.Fsck.nearDupRegistryFsck(spark, dir)
      .select(col("kind")).collect().map(_.getString(0)).toSet
    assert(kinds.contains("ndreg_stats_ndocs"), s"got $kinds")
    assert(kinds.contains("ndreg_alien_band_key"), s"got $kinds")
    // re-running the SAME delete converges every table: the corpus key
    // matches nothing (n == 0), the orphaned band keys leave, and the
    // self-healing stats write recounts
    assert(reg.delete(spark, dir, Seq(1L).toDF("doc_id"), "doc_id") === 0L)
    assert(corpusIds(dir) === Seq(2L) && bandIds(dir) === Seq(2L))
    assert(statsOf(dir)._1 === 1L)
    assert(graft.operators.Fsck.nearDupRegistryFsck(spark, dir).count() === 0L)
    // stats-only window: a crash after both rewrites left stale stats;
    // ANY later delete heals them, even one whose keys match nothing
    val st = spark.read.parquet(s"$dir/stats").collect()(0)
    spark.range(1).select(
        lit(99L).as("n_docs"),
        lit(st.getAs[Long]("n_dropped")).as("n_dropped"),
        lit(st.getAs[Long]("buckets")).as("buckets"),
        lit(st.getAs[Long]("shingle_size")).as("shingle_size"),
        lit(st.getAs[Long]("num_hashes")).as("num_hashes"),
        lit(st.getAs[Long]("bands")).as("bands"),
        lit(st.getAs[Double]("threshold")).as("threshold"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
    assert(statsOf(dir)._1 === 99L)
    assert(reg.delete(spark, dir, Seq(777L).toDF("doc_id"), "doc_id") === 0L)
    assert(statsOf(dir)._1 === 1L)
  }

  test("batchRows hands back exactly the committed slice; composed sink is idempotent") {
    val parent = java.nio.file.Files.createTempDirectory("ndreg-spec-bx").toString
    val dir = s"$parent/reg"; val idx = s"$parent/idx"
    reg.init(spark, dir, buckets = 8)
    graft.operators.Retrieval.bm25Init(spark, idx, buckets = 7)
    val sink = reg.dedupIndexStreamSink(dir, idx, "doc_id", "text")
    sink(Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "rho sigma tau upsilon")).toDF("doc_id", "text"), 0L)
    // the committed slice excludes the dropped near-dup
    val b0 = reg.batchRows(spark, dir, 0L)
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(b0 === Seq(1L, 3L))
    assert(reg.batchRows(spark, dir, 9L).collect().isEmpty) // unknown batch
    // only accepted rows were indexed
    val indexed = spark.read
      .schema(graft.operators.Retrieval.doclenSchema)
      .parquet(s"$idx/doclen")
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(indexed === Seq(1L, 3L))
    // post-commit re-delivery through the COMPOSED apply: both markers
    // hold, nothing double-applies
    val q = Seq((1L, "alpha gamma")).toDF("query_id", "query_text")
    val before = graft.operators.Retrieval.bm25TopKIndexed(idx, q, 10)
      .collect().map(_.toString).sorted.toSeq
    sink(Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "rho sigma tau upsilon")).toDF("doc_id", "text"), 0L)
    val after = graft.operators.Retrieval.bm25TopKIndexed(idx, q, 10)
      .collect().map(_.toString).sorted.toSeq
    assert(before.nonEmpty && after === before)
    assert(statsOf(dir) === ((2L, 1L)))
  }

  test("init rejects bad parameters") {
    val dir = java.nio.file.Files.createTempDirectory("ndreg-spec-i").toString
    reg.init(spark, dir, buckets = 2)
    intercept[IllegalArgumentException] { reg.init(spark, dir, 2) }
    intercept[IllegalArgumentException] {
      reg.init(spark, dir + "-x", buckets = 2, numHashes = 10, bands = 16)
    }
    intercept[IllegalArgumentException] {
      reg.init(spark, dir + "-y", buckets = 2, threshold = 0.0)
    }
  }
}
