package graft

import graft.operators.{Retrieval, StableRead, Tombstones}
import org.apache.spark.sql.functions._

/** The commit-manifest protocol behind [[StableRead]]'s O(1) probe
  * validation: every bracketed mutation bumps the root's one-file
  * `_commit_manifest` generation (bump BEFORE marker removal), and a
  * probe validates by comparing that one file's content before/after —
  * never by listing the estate. These tests pin the protocol pieces
  * the race specs exercise only indirectly: generation monotonicity
  * across every op family, reentrancy (nested brackets = ONE commit,
  * marker held to the outermost exit), the manifest-vs-listing
  * mechanism itself, the legacy-root fallback, and the retry path's
  * checkpoint release (a serving process under churn must not
  * accumulate dead cached blocks).
  */
class StableReadManifestSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def gen(path: String): Long =
    StableRead.manifestGeneration(spark, path).getOrElse(
      fail(s"no manifest at $path"))

  test("every mutating op commits a new manifest generation") {
    val dir = s"${tmpDir("manifest-gen")}/idx"
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma"), (3L, "gamma"))
      .toDF("doc_id", "text")
    Retrieval.buildBm25Index(docs, "doc_id", "text", dir, buckets = 4)
    val g0 = gen(dir)
    assert(g0 >= 1L)
    Retrieval.bm25Append(dir, Seq((4L, "alpha zeta")).toDF("doc_id", "text"),
      "doc_id", "text")
    val g1 = gen(dir)
    assert(g1 > g0, "append did not bump the generation")
    Retrieval.bm25Compact(spark, dir)
    val g2 = gen(dir)
    assert(g2 > g1, "compact did not bump the generation")
    Tombstones.add(spark, dir, Seq(2L).toDF("id"), "id")
    val g3 = gen(dir)
    assert(g3 > g2, "tombstone add did not bump the generation")
    // vacuum = delete + tombstone clear + heal, all nested under ONE
    // outermost bracket per op — generations advance but the marker
    // never flickers mid-op (the reentrancy test below pins that)
    assert(Retrieval.bm25Vacuum(spark, dir) === 1L)
    assert(gen(dir) > g3, "vacuum did not bump the generation")
  }

  test("nested brackets hold the marker to the outermost exit and commit once") {
    val dir = s"${tmpDir("manifest-nest")}/root"
    val marker = new org.apache.hadoop.fs.Path(
      s"$dir/${StableRead.MarkerName}")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    StableRead.withMaintenanceMarker(spark, dir) {
      assert(fs.exists(marker), "outer bracket did not raise the marker")
      StableRead.withMaintenanceMarker(spark, dir) {
        assert(fs.exists(marker))
      }
      // the inner exit must NOT remove the marker or commit — the outer
      // op's mutation window is still open
      assert(fs.exists(marker), "inner exit dropped the outer marker")
      assert(StableRead.manifestGeneration(spark, dir).isEmpty,
        "inner exit committed while the outer window was open")
    }
    assert(!fs.exists(marker))
    assert(gen(dir) === 1L, "nested brackets must commit exactly once")
  }

  test("a failed bracket leaves the marker standing; the re-run clears it") {
    val dir = s"${tmpDir("manifest-fail")}/root"
    val marker = new org.apache.hadoop.fs.Path(
      s"$dir/${StableRead.MarkerName}")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    intercept[RuntimeException] {
      StableRead.withMaintenanceMarker(spark, dir) {
        throw new RuntimeException("op crashed mid-window")
      }
    }
    assert(fs.exists(marker), "a crashed op must leave its marker")
    assert(StableRead.manifestGeneration(spark, dir).isEmpty,
      "a crashed op must not commit")
    // the contract-mandated re-run (same bracket, now succeeding)
    // clears the marker and commits — including from a FRESH process
    // (the depth map is per-JVM; a standing marker with depth 0 is
    // exactly the crash-recovery state)
    StableRead.withMaintenanceMarker(spark, dir) { () }
    assert(!fs.exists(marker))
    assert(gen(dir) === 1L)
  }

  test("validation is manifest-based: one file read, not a listing") {
    val dir = s"${tmpDir("manifest-o1")}/idx"
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma"))
      .toDF("doc_id", "text")
    Retrieval.buildBm25Index(docs, "doc_id", "text", dir, buckets = 4)
    val t0 = StableRead.validationToken(spark, dir)
    assert(t0.startsWith("M:"), s"expected manifest token, got $t0")
    // the mechanism, pinned: touching an UNBRACKETED stray file changes
    // the listing but not the manifest — the token must not move (this
    // is what makes validation O(1): the probe trusts the commit
    // protocol, it does not walk the estate). Mutations outside the
    // bracketed ops are outside the estate contract by definition.
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.create(new org.apache.hadoop.fs.Path(s"$dir/stray_file"), true).close()
    assert(StableRead.validationToken(spark, dir) === t0,
      "manifest token must not depend on the file listing")
    // ...while a bracketed commit moves it
    Tombstones.add(spark, dir, Seq(1L).toDF("id"), "id")
    assert(StableRead.validationToken(spark, dir) !== t0)
  }

  test("legacy roots without a manifest fall back to the listing fingerprint") {
    val dir = s"${tmpDir("manifest-legacy")}/legacy"
    // hand-built root: parquet files, no manifest (pre-round-16 estate)
    Seq((1L, "x")).toDF("id", "text")
      .write.parquet(s"$dir/corpus")
    val t0 = StableRead.validationToken(spark, dir)
    assert(t0.startsWith("S:"), s"expected listing token, got $t0")
    // listing-based: ANY file change moves the token (the old, sound,
    // O(files) behavior survives for exactly these roots)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.create(new org.apache.hadoop.fs.Path(s"$dir/stray_file"), true).close()
    assert(StableRead.validationToken(spark, dir) !== t0)
    // first bracketed op upgrades the root to manifest validation
    StableRead.withMaintenanceMarker(spark, dir) { () }
    assert(StableRead.validationToken(spark, dir).startsWith("M:"))
  }

  test("stable probes stay consistent under churn and release discarded checkpoints") {
    val dir = s"${tmpDir("manifest-release")}/idx"
    val docs = (0L until 60L)
      .map(i => (i, s"alpha beta w$i")).toDF("doc_id", "text")
    Retrieval.buildBm25Index(docs, "doc_id", "text", dir, buckets = 4)
    val q = Seq((1L, "alpha")).toDF("query_id", "query_text")
      .localCheckpoint(true)
    val first = StableRead.stable(spark, Seq(dir)) {
      Retrieval.bm25TopKIndexed(dir, q, 5)
    }
    val expected = first.collect().map(_.toString).sorted.toSeq
    StableRead.release(first)
    val baseline = spark.sparkContext.getPersistentRDDs.size
    // churn loop: every probe races a compact, forcing validation
    // failures and retries; discarded attempts must unpersist their
    // localCheckpoint blocks rather than park them until GC
    (1 to 4).foreach { _ =>
      val churn = scala.concurrent.Future {
        Retrieval.bm25Compact(spark, dir)
      }(scala.concurrent.ExecutionContext.global)
      val got = StableRead.stable(spark, Seq(dir), maxAttempts = 200) {
        Retrieval.bm25TopKIndexed(dir, q, 5)
      }
      assert(got.collect().map(_.toString).sorted.toSeq === expected)
      StableRead.release(got) // consumed — free the checkpoint blocks
      scala.concurrent.Await.result(
        churn, scala.concurrent.duration.Duration.Inf)
    }
    // allow the explicit unpersists to settle; only the RETAINED
    // baseline blocks may remain (plus the one query-side checkpoint)
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= baseline + 1,
      s"retried probes leaked cached blocks: $baseline -> $after")
  }

  // ---- round-17: snapshot-PINNED reads ----------------------------------

  private def rel(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val out = df.collect().map(_.toString).sorted.toSeq
    StableRead.release(df)
    out
  }

  test("every commit writes a snapshot pinning each table's exact files") {
    val dir = s"${tmpDir("snap-write")}/idx"
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma"), (3L, "gamma"))
      .toDF("doc_id", "text")
    Retrieval.buildBm25Index(docs, "doc_id", "text", dir, buckets = 4)
    val snap = StableRead.readSnapshot(spark, dir).getOrElse(
      fail("no snapshot after build"))
    assert(snap.gen === gen(dir))
    Seq("postings", "terms", "doclen", "stats").foreach { t =>
      val ts = snap.tables.getOrElse(t, fail(s"table $t not in snapshot"))
      assert(ts.files.nonEmpty, s"table $t pinned no files")
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      ts.files.foreach(f => assert(
        fs.exists(new org.apache.hadoop.fs.Path(s"$dir/$t/$f")),
        s"pinned file $t/$f does not exist"))
    }
    // a commit that only touches ONE table inherits the others'
    // lastRewriteGen (the retired-dir name key stays stable)
    val dlBefore = snap.tables("doclen").lastRewriteGen
    Tombstones.add(spark, dir, Seq(2L).toDF("id"), "id")
    val snap2 = StableRead.readSnapshot(spark, dir).get
    assert(snap2.gen > snap.gen)
    assert(snap2.tables("doclen").lastRewriteGen === dlBefore,
      "untouched table's version key must not move")
    assert(snap2.tables("tombstones").files.nonEmpty)
  }

  test("a swap retires the old version; time travel reads it back exactly") {
    val dir = s"${tmpDir("snap-retire")}/idx"
    val docs = (0L until 40L).map(i => (i, s"alpha beta w$i"))
      .toDF("doc_id", "text")
    Retrieval.buildBm25Index(docs, "doc_id", "text", dir, buckets = 4)
    val q = Seq((1L, "alpha")).toDF("query_id", "query_text")
      .localCheckpoint(true)
    val snap0 = StableRead.readSnapshot(spark, dir).get
    val expected = rel(StableRead.pinned(spark, Seq(dir)) {
      Retrieval.bm25TopKIndexed(dir, q, 5)
    })
    // compact rewrites postings+doclen: the old versions must land in
    // _retired under their creation-generation names
    Retrieval.bm25Compact(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val retired = StableRead.retiredDirOf(
      dir, "postings", snap0.tables("postings").lastRewriteGen)
    assert(fs.exists(retired), s"old postings not retired at $retired")
    // the new snapshot bumps the rewritten tables' version keys
    val snap1 = StableRead.readSnapshot(spark, dir).get
    assert(snap1.tables("postings").lastRewriteGen === snap1.gen)
    // pinned read of the CURRENT generation: same relation (compact is
    // content-blind)
    assert(rel(StableRead.pinned(spark, Seq(dir)) {
      Retrieval.bm25TopKIndexed(dir, q, 5)
    }) === expected)
    // TIME TRAVEL: the pre-compact snapshot is still fully readable —
    // its postings resolve from the retired dir
    assert(rel(StableRead.pinnedAt(spark, Seq(snap0)) {
      Retrieval.bm25TopKIndexed(dir, q, 5)
    }) === expected)
  }

  test("partition-level deletes keep pinned generations readable") {
    val dir = s"${tmpDir("snap-del")}/idx"
    val docs = (0L until 40L).map(i => (i, s"alpha beta w$i"))
      .toDF("doc_id", "text")
    Retrieval.buildBm25Index(docs, "doc_id", "text", dir, buckets = 4)
    val q = Seq((1L, "alpha")).toDF("query_id", "query_text")
      .localCheckpoint(true)
    val snap0 = StableRead.readSnapshot(spark, dir).get
    val before = rel(StableRead.pinned(spark, Seq(dir)) {
      Retrieval.bm25TopKIndexed(dir, q, 5)
    })
    // physical delete: postings via partition rewrite (deleteRows),
    // terms via dynamic overwrite, doclen via swap — all must retain
    val doomed = (0L until 40L by 2L).toDF("id")
    assert(Retrieval.bm25Delete(spark, dir, doomed, "id") === 20L)
    val after = rel(StableRead.pinned(spark, Seq(dir)) {
      Retrieval.bm25TopKIndexed(dir, q, 5)
    })
    assert(after !== before, "delete changed nothing — vacuous test")
    // the pre-delete generation reads back bit-for-bit: every shed file
    // (rewritten partitions AND whole-table swaps) resolves retired
    assert(rel(StableRead.pinnedAt(spark, Seq(snap0)) {
      Retrieval.bm25TopKIndexed(dir, q, 5)
    }) === before)
  }

  test("pinned probes serve under a standing maintenance marker") {
    val dir = s"${tmpDir("snap-marker")}/idx"
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma"))
      .toDF("doc_id", "text")
    Retrieval.buildBm25Index(docs, "doc_id", "text", dir, buckets = 4)
    val q = Seq((1L, "alpha")).toDF("query_id", "query_text")
      .localCheckpoint(true)
    val expected = rel(StableRead.pinned(spark, Seq(dir)) {
      Retrieval.bm25TopKIndexed(dir, q, 5)
    })
    val marker = new org.apache.hadoop.fs.Path(
      s"$dir/${StableRead.MarkerName}")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    fs.create(marker, true).close()
    try {
      // stable() refuses (the optimistic protocol cannot validate under
      // a marker); pinned() serves the last COMMITTED generation — the
      // crashed-writer partial state is unreachable by construction
      intercept[IllegalStateException] {
        StableRead.stable(spark, Seq(dir), maxAttempts = 2) {
          Retrieval.bm25TopKIndexed(dir, q, 5)
        }
      }
      assert(rel(StableRead.pinned(spark, Seq(dir)) {
        Retrieval.bm25TopKIndexed(dir, q, 5)
      }) === expected)
    } finally fs.delete(marker, false)
  }

  test("untouched tables SHARE their shard file across generations") {
    val dir = s"${tmpDir("snap-shard")}/idx"
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma"))
      .toDF("doc_id", "text")
    Retrieval.buildBm25Index(docs, "doc_id", "text", dir, buckets = 4)
    val g0 = gen(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def shardExists(g: Long, t: String): Boolean = fs.exists(
      new org.apache.hadoop.fs.Path(
        s"$dir/${StableRead.SnapshotsDirName}/g$g.$t"))
    assert(shardExists(g0, "postings") && shardExists(g0, "doclen"))
    // a commit that touches ONLY the tombstone overlay writes ONE new
    // shard; postings/doclen/terms keep referencing their g0 shards —
    // the commit neither lists nor serializes their file lists
    Tombstones.add(spark, dir, Seq(2L).toDF("id"), "id")
    val g1 = gen(dir)
    assert(shardExists(g1, "tombstones"))
    Seq("postings", "doclen", "terms", "stats").foreach(t =>
      assert(!shardExists(g1, t),
        s"untouched table $t re-serialized its shard at g$g1"))
    // and the resolved snapshot still pins the g0 file lists exactly
    val snap = StableRead.readSnapshot(spark, dir).get
    assert(snap.gen === g1)
    assert(snap.tables("postings").files.nonEmpty)
    snap.tables("postings").files.foreach(f => assert(
      fs.exists(new org.apache.hadoop.fs.Path(s"$dir/postings/$f"))))
  }

  test("expireRetired reclaims only unreferenced versions, loudly breaking past-horizon pins") {
    val dir = s"${tmpDir("snap-gc")}/idx"
    val docs = (0L until 40L).map(i => (i, s"alpha beta w$i"))
      .toDF("doc_id", "text")
    Retrieval.buildBm25Index(docs, "doc_id", "text", dir, buckets = 4)
    val q = Seq((1L, "alpha")).toDF("query_id", "query_text")
      .localCheckpoint(true)
    val snap0 = StableRead.readSnapshot(spark, dir).get
    Retrieval.bm25Compact(spark, dir)
    Retrieval.bm25Compact(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val oldRetired = StableRead.retiredDirOf(
      dir, "postings", snap0.tables("postings").lastRewriteGen)
    assert(fs.exists(oldRetired))
    // keep only the newest generation: gen-1's postings version is
    // still referenced (it IS the live version's predecessor only if a
    // kept snapshot names it) — snap0's version is not
    assert(StableRead.expireRetired(spark, dir, keepGenerations = 1) > 0L)
    assert(!fs.exists(oldRetired),
      "unreferenced retired version survived the GC")
    // the horizon contract: a pin past the retention fails LOUDLY
    intercept[IllegalStateException] {
      rel(StableRead.pinnedAt(spark, Seq(snap0), maxAttempts = 2) {
        Retrieval.bm25TopKIndexed(dir, q, 5)
      })
    }
    // current generation unaffected
    assert(rel(StableRead.pinned(spark, Seq(dir)) {
      Retrieval.bm25TopKIndexed(dir, q, 5)
    }).nonEmpty)
  }

  test("timestamp-addressed time travel resolves the right generation") {
    val dir = s"${tmpDir("manifest-asof")}/idx"
    Retrieval.buildBm25Index(
      Seq((1L, "alpha beta")).toDF("doc_id", "text"), "doc_id", "text",
      dir, buckets = 4)
    Thread.sleep(30)
    Retrieval.bm25Append(dir,
      Seq((2L, "beta gamma")).toDF("doc_id", "text"), "doc_id", "text")
    Thread.sleep(30)
    Retrieval.bm25Compact(spark, dir)
    val (g1, g2, g3) = (gen(dir) - 2, gen(dir) - 1, gen(dir))
    val ts = Seq(g1, g2, g3).map(g =>
      StableRead.snapshotCommitTime(spark, dir, g).getOrElse(
        fail(s"no commit time for g$g")))
    assert(ts == ts.sorted, "commit times must be monotone")
    // between g2 and g3 -> g2; at/after g3 -> g3; before g1 -> None
    assert(StableRead.readSnapshotAsOf(spark, dir, ts(1)).map(_.gen)
      .contains(g2))
    assert(StableRead.readSnapshotAsOf(spark, dir, (ts(1) + ts(2)) / 2)
      .map(_.gen).contains(g2))
    assert(StableRead.readSnapshotAsOf(spark, dir, ts(2) + 1000L)
      .map(_.gen).contains(g3))
    assert(StableRead.readSnapshotAsOf(spark, dir, ts(0) - 1L).isEmpty,
      "a timestamp before the first retained commit must not resolve")
    // the resolved snapshot probes exactly (doc 2 is IN at g2)
    val q = Seq((1L, "gamma")).toDF("query_id", "query_text")
      .localCheckpoint(true)
    val snap = StableRead.readSnapshotAsOf(spark, dir, ts(1)).get
    val rel = StableRead.pinnedAt(spark, Seq(snap)) {
      Retrieval.bm25TopKIndexed(dir, q, 5)
    }
    assert(rel.select(col("doc_id")).collect().map(_.getLong(0)).toSet
      === Set(2L))
    StableRead.release(rel)
    // past the GC horizon the timestamp stops resolving, loudly-absent
    StableRead.gc(spark, dir, keepGenerations = 1)
    assert(StableRead.readSnapshotAsOf(spark, dir, ts(1)).isEmpty,
      "an expired generation must not resolve by timestamp")
  }
}
