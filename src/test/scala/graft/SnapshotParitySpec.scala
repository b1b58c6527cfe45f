package graft

import graft.operators.{DedupRegistry, NearDupRegistry, Retrieval, Similarity, StableRead, TextAnalysis, Tombstones}
import org.apache.spark.sql.functions._

/** The incremental-snapshot INVARIANT: `writeSnapshot` re-lists only
  * the tables the bracket noted as touched and reuses the previous
  * snapshot's entries verbatim for the rest — so a primitive that
  * lands or removes a file under a live estate table WITHOUT noting it
  * would freeze a stale file list into the next committed snapshot and
  * silently corrupt every pinned read of it. This spec drills every op
  * family and compares the committed snapshot against an INDEPENDENT
  * full re-listing after each op. A new operator built from the house
  * primitives (swapByRename/landTable/copyParquetParts/retire*) passes
  * by construction; one that invents its own landing path fails here
  * before it can corrupt a pin.
  */
class SnapshotParitySpec extends SparkSpec {
  import spark.implicits._

  /** Independent recompute of what the snapshot MUST contain: every
    * non-transient table dir's recursive data files (same skip rules
    * as the snapshot writer, reimplemented deliberately).
    */
  private def fullListing(path: String): Map[String, Set[String]] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def walk(p: org.apache.hadoop.fs.Path, prefix: String): Seq[String] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Seq.empty
        else if (st.isDirectory) walk(st.getPath, s"$prefix$n/")
        else Seq(s"$prefix$n")
      }
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && !StableRead.isTransientName(st.getPath.getName))
      .map(st => st.getPath.getName -> walk(st.getPath, "").toSet)
      .toMap
  }

  private def assertParity(path: String, where: String): Unit = {
    val snap = StableRead.readSnapshot(spark, path).getOrElse(
      fail(s"$where: no committed snapshot at $path"))
    val live = fullListing(path)
    assert(snap.tables.keySet === live.keySet,
      s"$where: snapshot tables ${snap.tables.keySet} != live ${live.keySet}")
    snap.tables.foreach { case (t, ts) =>
      assert(ts.files.toSet === live(t),
        s"$where: table $t snapshot files diverge from the live listing " +
          s"(snapshot-only: ${ts.files.toSet -- live(t)}; " +
          s"live-only: ${live(t) -- ts.files.toSet})")
    }
  }

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("bm25 family: every op commits a file-exact snapshot") {
    val dir = s"${tmp("parity-bm25")}/idx"
    val docs = (0L until 40L).map(i => (i, s"alpha beta w$i"))
      .toDF("doc_id", "text")
    Retrieval.buildBm25Index(docs, "doc_id", "text", dir, buckets = 4)
    assertParity(dir, "build")
    Retrieval.bm25Append(dir,
      Seq((100L, "alpha zeta"), (101L, "beta")).toDF("doc_id", "text"),
      "doc_id", "text")
    assertParity(dir, "append")
    Retrieval.bm25IngestBatch(dir,
      Seq((200L, "gamma delta")).toDF("doc_id", "text"),
      "doc_id", "text", 0L)
    assertParity(dir, "ingestBatch")
    Retrieval.bm25Compact(spark, dir)
    assertParity(dir, "compact")
    Tombstones.add(spark, dir, Seq(2L, 4L).toDF("id"), "id")
    assertParity(dir, "tombstone add")
    assert(Retrieval.bm25Vacuum(spark, dir) === 2L)
    assertParity(dir, "vacuum (delete + clear)")
    StableRead.expireRetired(spark, dir)
    // GC mutates only _retired/_snapshots — no commit, parity of the
    // CURRENT snapshot must still hold
    assertParity(dir, "expireRetired")
  }

  test("ivf family: every op commits a file-exact snapshot") {
    val dir = s"${tmp("parity-ivf")}/ivf"
    val emb = (0L until 48L)
      .map(i => (i, Seq.tabulate(4)(d => ((i * 7 + d) % 13).toDouble)))
      .toDF("vec_id", "embedding")
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", nlist = 2, dir)
    assertParity(dir, "build")
    Similarity.ivfAppend(dir,
      (100L until 104L)
        .map(i => (i, Seq.tabulate(4)(d => ((i * 7 + d) % 13).toDouble)))
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    assertParity(dir, "append")
    Similarity.ivfIngestBatch(dir,
      (200L until 204L)
        .map(i => (i, Seq.tabulate(4)(d => ((i * 7 + d) % 13).toDouble)))
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", 0L)
    assertParity(dir, "ingestBatch")
    Similarity.ivfSplitCells(spark, dir, maxCellRows = 8)
    assertParity(dir, "splitCells")
    Tombstones.add(spark, dir, Seq(0L, 7L).toDF("id"), "id")
    assertParity(dir, "tombstone add")
    assert(Similarity.ivfVacuum(spark, dir) === 2L)
    assertParity(dir, "vacuum")
  }

  test("registries and artifact saves commit file-exact snapshots") {
    val reg = s"${tmp("parity-reg")}/reg"
    DedupRegistry.init(spark, reg, buckets = 4)
    assertParity(reg, "dedup init")
    DedupRegistry.ingestBatch(reg,
      (0L until 20L).map(i => (i, s"text ${i % 15}")).toDF("doc_id", "text"),
      "doc_id", "text", 0L)
    assertParity(reg, "dedup ingest")
    DedupRegistry.compact(spark, reg)
    assertParity(reg, "dedup compact")
    Tombstones.add(spark, reg, Seq(3L).toDF("id"), "id")
    assert(DedupRegistry.vacuum(spark, reg) >= 1L)
    assertParity(reg, "dedup vacuum")

    val nd = s"${tmp("parity-ndreg")}/nd"
    NearDupRegistry.init(spark, nd, buckets = 4)
    NearDupRegistry.ingestBatch(nd,
      (0L until 12L).map(i =>
        (i, s"the quick brown fox jumps over dog ${i % 9} end"))
        .toDF("doc_id", "text"),
      "doc_id", "text", 0L)
    assertParity(nd, "neardup ingest")

    val bpe = s"${tmp("parity-bpe")}/bpe"
    val merges = Seq((1L, "a", "b", 5L, 90L), (2L, "ab", "c", 3L, 87L))
      .toDF("round", "pair_a", "pair_b", "pair_count", "tokens_after")
    TextAnalysis.bpeSave(spark, merges, bpe)
    assertParity(bpe, "bpe save")
    TextAnalysis.bpeSave(spark, merges, bpe) // re-save over live
    assertParity(bpe, "bpe re-save")
  }

  test("ingest commits write O(batch) append-delta shards, exact under chains") {
    val dir = s"${tmp("parity-chain")}/ivf"
    val base = (0L until 400L)
      .map(i => (i, Seq(math.cos(0.1 * i), math.sin(0.1 * i))))
      .toDF("id", "vec")
    Similarity.buildIvfIndex(base, "id", "vec", nlist = 2, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    (0 until 3).foreach { b =>
      Similarity.ivfIngestBatch(dir,
        Seq((1000L + b, Seq(1.0, 0.5 * b))).toDF("id", "vec"),
        "id", "vec", b.toLong)
      assertParity(dir, s"chain batch $b") // resolution == full listing
      // the commit's corpus shard must be the DELTA, not a re-listing:
      // a `3|` header and exactly the one landed file — O(batch)
      // metadata against any standing corpus size (the MediaScaleBench
      // mmapply flatness)
      val gen = StableRead.manifestGeneration(spark, dir).get
      val shard = new org.apache.hadoop.fs.Path(
        s"$dir/${StableRead.SnapshotsDirName}/g$gen.corpus")
      val in = fs.open(shard)
      val content =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      assert(content.startsWith("3|"),
        s"batch $b commit re-listed the corpus instead of a delta shard")
      assert(content.linesIterator.count(_.startsWith("F|")) === 1,
        s"batch $b delta shard carries more than the landed file")
    }
    // a rewrite resets the chain to a full shard and parity holds
    Similarity.ivfCompact(spark, dir)
    assertParity(dir, "chain reset by compact")
    val gen = StableRead.manifestGeneration(spark, dir).get
    val head = {
      val p = new org.apache.hadoop.fs.Path(
        s"$dir/${StableRead.SnapshotsDirName}/g$gen.corpus")
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.linesIterator.next()
      finally in.close()
    }
    assert(head.startsWith("1|"), "compact did not reset the shard chain")
  }
}
