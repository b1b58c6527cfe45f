package graft

import org.apache.spark.sql.functions._

/** Distributed registry bootstrap (shard-and-merge) for BOTH registry
  * families: the exact registry's merge must equal the one-batch build
  * bit-for-bit (digest equality is transitive); the near-dup registry's
  * merge follows the documented conservative registered-witness policy —
  * equal to the one-batch build on chain-free corpora, deliberately
  * divergent on witness chains (dropped rows don't witness), and always
  * sound. Plus the parameter/destination guards on both.
  */
class RegistryMergeSpec extends SparkSpec {
  import spark.implicits._

  private def reg = graft.operators.DedupRegistry
  private def ndreg = graft.operators.NearDupRegistry

  private def ids(path: String): Seq[Long] =
    spark.read.parquet(s"$path/corpus")
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq

  private def stats(path: String): (Long, Long) = {
    val r = spark.read.parquet(s"$path/stats").collect()(0)
    (r.getAs[Long]("n_docs"), r.getAs[Long]("n_dropped"))
  }

  test("exact-registry merge == the one-batch build over the union") {
    val parent = java.nio.file.Files.createTempDirectory("reg-merge").toString
    // cross-shard dups (same text, ids 2<12), within-shard dup (21/22),
    // and a three-way digest (2, 12, 23) whose GLOBAL min id must win
    val slices = Seq(
      Seq((2L, "alpha"), (5L, "beta")),
      Seq((12L, "alpha"), (16L, "gamma")),
      Seq((21L, "delta"), (22L, "delta"), (23L, "alpha")))
    val shards = slices.zipWithIndex.map { case (sl, i) =>
      val p = s"$parent/sh$i"
      reg.init(spark, p, buckets = 8)
      reg.ingestBatch(p, sl.toDF("doc_id", "text"), "doc_id", "text", 0L)
      p
    }
    val merged = s"$parent/merged"
    reg.merge(spark, shards, merged)
    val oneBatch = s"$parent/one"
    reg.init(spark, oneBatch, buckets = 8)
    reg.ingestBatch(
      oneBatch, slices.flatten.toDF("doc_id", "text"), "doc_id", "text", 0L)
    assert(ids(merged) === Seq(2L, 5L, 16L, 21L) &&
      ids(merged) === ids(oneBatch))
    assert(stats(merged) === ((4L, 3L)) && stats(merged) === stats(oneBatch))
    // the merged registry keeps functioning: registered content drops
    reg.ingestBatch(
      merged, Seq((99L, "alpha"), (98L, "fresh")).toDF("doc_id", "text"),
      "doc_id", "text", 0L)
    assert(ids(merged) === Seq(2L, 5L, 16L, 21L, 98L))
    // guards
    intercept[IllegalArgumentException] { reg.merge(spark, Seq(shards.head), s"$parent/x") }
    intercept[IllegalArgumentException] { reg.merge(spark, shards, merged) }
    val odd = s"$parent/odd"
    reg.init(spark, odd, buckets = 4) // drifted modulus
    intercept[IllegalArgumentException] {
      reg.merge(spark, Seq(shards.head, odd), s"$parent/y")
    }
  }

  test("near-dup merge: chain-free equality, exact-copy certainty, working result") {
    val parent = java.nio.file.Files.createTempDirectory("ndreg-merge").toString
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val other = "completely different words about ships sailing the open sea"
    // chain-free: cross-shard exact copy (1/11) and near-copy (2/12),
    // no within-shard similarity — merge must equal the one-batch build
    val slices = Seq(
      Seq((1L, base), (2L, other)),
      Seq((11L, base), (12L, other + " zz"), (13L, "unrelated short news item text here today")))
    val shards = slices.zipWithIndex.map { case (sl, i) =>
      val p = s"$parent/sh$i"
      ndreg.init(spark, p, buckets = 8)
      ndreg.ingestBatch(p, sl.toDF("doc_id", "text"), "doc_id", "text", 0L)
      p
    }
    // fixture sanity: everything survived its own shard
    assert(ids(shards(0)) === Seq(1L, 2L) && ids(shards(1)) === Seq(11L, 12L, 13L))
    val merged = s"$parent/merged"
    ndreg.merge(spark, shards, merged)
    val oneBatch = s"$parent/one"
    ndreg.init(spark, oneBatch, buckets = 8)
    ndreg.ingestBatch(
      oneBatch, slices.flatten.toDF("doc_id", "text"), "doc_id", "text", 0L)
    // the exact copy (11) drops with certainty; whatever the banding
    // decided for the near-copy (12), merge and one-batch agree
    assert(!ids(merged).contains(11L))
    assert(ids(merged) === ids(oneBatch) && stats(merged) === stats(oneBatch))
    assert(stats(merged)._1 + stats(merged)._2 === 5L)
    // bands travel with the survivors: the merged registry keeps
    // deduping content registered by EITHER shard
    ndreg.ingestBatch(
      merged, Seq((99L, base), (98L, "genuinely new content never seen before"))
        .toDF("doc_id", "text"),
      "doc_id", "text", 0L)
    assert(!ids(merged).contains(99L) && ids(merged).contains(98L))
    // guards: parameter drift and existing destination abort
    intercept[IllegalArgumentException] { ndreg.merge(spark, shards, merged) }
    val odd = s"$parent/odd"
    ndreg.init(spark, odd, buckets = 8, threshold = 0.7)
    intercept[IllegalArgumentException] {
      ndreg.merge(spark, Seq(shards.head, odd), s"$parent/y")
    }
  }

  test("near-dup merge pins the conservative policy: dropped rows don't witness") {
    // q < p < r with p ~ q (J=6/7), r ~ p (J=7/14=0.5), r !~ q
    // (J=6/14<0.5). numHashes=bands=64 makes J>=0.5 candidacy certain
    // in practice (64 independent 1-row bands).
    val q = "a b c d e f g h"
    val p = q + " x"
    val r = "a b c d e f g h x y z w v u t s"
    val parent = java.nio.file.Files.createTempDirectory("ndreg-chain").toString
    val shards = Seq(Seq((1L, q), (2L, p)), Seq((3L, r))).zipWithIndex
      .map { case (sl, i) =>
        val pth = s"$parent/sh$i"
        ndreg.init(spark, pth, buckets = 4, numHashes = 64, bands = 64)
        ndreg.ingestBatch(pth, sl.toDF("doc_id", "text"), "doc_id", "text", 0L)
        pth
      }
    // p dropped inside its shard (certain candidate at J=6/7)
    assert(ids(shards(0)) === Seq(1L))
    // one-batch build: r drops via the DROPPED p (partners need not
    // survive — the streaming within-batch policy)
    val oneBatch = s"$parent/one"
    ndreg.init(spark, oneBatch, buckets = 4, numHashes = 64, bands = 64)
    ndreg.ingestBatch(
      oneBatch, Seq((1L, q), (2L, p), (3L, r)).toDF("doc_id", "text"),
      "doc_id", "text", 0L)
    assert(ids(oneBatch) === Seq(1L))
    // merge: p's sketch is GONE from shard 0, r's only registered
    // potential witness is 1 at J<0.5 — r survives (the documented
    // conservative divergence), and the drop is still witnessed
    val merged = s"$parent/merged"
    ndreg.merge(spark, shards, merged)
    assert(ids(merged) === Seq(1L, 3L))
    assert(stats(merged) === ((2L, 1L))) // raw 3 conserved
  }

  test("interrupted merge re-runs without losing tombstones (overlay lands before stats)") {
    val parent = java.nio.file.Files.createTempDirectory("reg-merge-ov").toString
    val slices = Seq(Seq((1L, "alpha"), (2L, "beta")), Seq((11L, "gamma")))
    val shards = slices.zipWithIndex.map { case (sl, i) =>
      val p = s"$parent/sh$i"
      reg.init(spark, p, buckets = 8)
      reg.ingestBatch(p, sl.toDF("doc_id", "text"), "doc_id", "text", 0L)
      p
    }
    // a pending takedown on shard 0 must travel with the merge
    graft.operators.Tombstones.add(spark, shards(0), Seq(2L).toDF("id"), "id")
    val dest = s"$parent/merged"
    reg.merge(spark, shards, dest)
    // stats is the merge's re-run refusal marker, and the overlay is
    // written BEFORE it — so the deepest interruptible state a crash can
    // leave (everything but stats) must both carry the tombstones and
    // accept a re-run. Manufacture it by removing stats from a completed
    // merge.
    val fs = new org.apache.hadoop.fs.Path(dest)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(graft.operators.Tombstones.read(spark, dest).isDefined,
      "completed merge lost the shard overlay")
    require(fs.delete(new org.apache.hadoop.fs.Path(s"$dest/stats"), true))
    // a REAL crash never reaches the bracket exit, so the dest carries
    // no commit manifest/snapshots (and a committed dest is now
    // explicitly refused — the round-18 in-place-merge guard, asserted
    // below); strip the protocol files the completed merge left so the
    // manufactured state matches the reachable one
    intercept[IllegalArgumentException] { reg.merge(spark, shards, dest) }
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$dest/${graft.operators.StableRead.ManifestName}"), false)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$dest/${graft.operators.StableRead.SnapshotsDirName}"), true)
    reg.merge(spark, shards, dest) // re-run accepted, not refused
    assert(ids(dest) === Seq(1L, 2L, 11L))
    assert(stats(dest) === ((3L, 0L)))
    val ov = graft.operators.Tombstones.read(spark, dest)
    assert(ov.map(_.select(col("id")).collect().map(_.getLong(0)).toSeq)
      .getOrElse(Seq.empty) === Seq(2L),
      "re-run merge resurrected the tombstoned witness")
    // same window on the near-dup family
    val ndShards = Seq("a", "b").zipWithIndex.map { case (t, i) =>
      val p = s"$parent/nd$i"
      ndreg.init(spark, p, buckets = 4, numHashes = 16, bands = 16)
      ndreg.ingestBatch(
        p, Seq((i * 10 + 1L, s"text $t one two three")).toDF("doc_id", "text"),
        "doc_id", "text", 0L)
      p
    }
    graft.operators.Tombstones.add(spark, ndShards(0), Seq(1L).toDF("id"), "id")
    val ndDest = s"$parent/nd-merged"
    ndreg.merge(spark, ndShards, ndDest)
    require(fs.delete(new org.apache.hadoop.fs.Path(s"$ndDest/stats"), true))
    // same reachable-state strip as the exact-registry arm above
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$ndDest/${graft.operators.StableRead.ManifestName}"), false)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$ndDest/${graft.operators.StableRead.SnapshotsDirName}"), true)
    ndreg.merge(spark, ndShards, ndDest)
    assert(graft.operators.Tombstones.read(spark, ndDest)
      .map(_.select(col("id")).collect().map(_.getLong(0)).toSeq)
      .getOrElse(Seq.empty) === Seq(1L))
  }
}
