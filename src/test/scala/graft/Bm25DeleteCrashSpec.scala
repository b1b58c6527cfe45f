package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

/** Crash-window convergence for [[graft.operators.Retrieval.bm25Delete]]
  * — the spec the round-14 verdict demanded for its one verified code
  * defect. The delete runs as: [terms recompute -> postings rewrite]
  * chained in one thunk, the doclen rewrite concurrent with the chain,
  * and a SELF-HEALING stats write strictly after every rewrite. Each
  * test manufactures one reachable partial-commit state directly on the
  * index's tables (the NearDupRegistrySpec technique), re-runs the SAME
  * delete, and asserts the whole index — all four tables as relations,
  * plus a probe — equals a from-scratch rebuild on the survivors.
  *
  * Unreachable-by-construction windows, asserted here by the code's
  * shape rather than a test: stats-only (stats write last, never inside
  * the concurrent group) and postings-without-terms (the postings
  * rewrite is sequenced after the terms recompute inside one thunk).
  */
class Bm25DeleteCrashSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry durian"),
    (4L, "")) // token-less: no postings, but N/avgdl count it
  private val doomed = Seq(3L, 4L)
  private val buckets = 8

  private lazy val rebuilt: String = {
    val dir = java.nio.file.Files.createTempDirectory("bm25-crash-rb").toString
    Retrieval.buildBm25Index(
      corpus.toDF("doc_id", "text").filter(!col("doc_id").isin(doomed: _*)),
      "doc_id", "text", dir, buckets = buckets)
    dir
  }

  private def freshIndex(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"bm25-crash-$tag").toString
    Retrieval.buildBm25Index(
      corpus.toDF("doc_id", "text"), "doc_id", "text", dir, buckets = buckets)
    dir
  }

  private def fsOf(dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  private def rel(dir: String): Seq[Seq[String]] = Seq(
    spark.read.schema(Retrieval.postingsSchema).parquet(s"$dir/postings")
      .collect().map(_.toString).sorted.toSeq,
    spark.read.schema(Retrieval.termsSchema).parquet(s"$dir/terms")
      .collect().map(_.toString).sorted.toSeq,
    spark.read.schema(Retrieval.doclenSchema).parquet(s"$dir/doclen")
      .collect().map(_.toString).sorted.toSeq,
    spark.read.parquet(s"$dir/stats")
      .select(col("n_docs"), col("total_tokens"), col("buckets"))
      .collect().map(_.toString).toSeq)

  private val q = Seq((1L, "apple cherry"), (2L, "banana durian"))

  private def assertConverged(dir: String, ctx: String): Unit = {
    val got = rel(dir); val want = rel(rebuilt)
    Seq("postings", "terms", "doclen", "stats").zipWithIndex.foreach {
      case (t, i) => assert(got(i) === want(i), s"$ctx: $t diverged from rebuild")
    }
    val probed = Retrieval.bm25TopKIndexed(dir, q.toDF("query_id", "query_text"), 10)
      .collect().map(_.toString).sorted.toSeq
    val ideal = Retrieval.bm25TopKIndexed(rebuilt, q.toDF("query_id", "query_text"), 10)
      .collect().map(_.toString).sorted.toSeq
    assert(probed.nonEmpty && probed === ideal, s"$ctx: probe diverged")
  }

  // manufactured rewrites — each replicates exactly what ONE committed
  // leg of the delete leaves on disk

  /** terms leg committed: post-delete terms content (== the rebuild's —
    * the recompute is exact), postings/doclen/stats untouched. */
  private def commitTerms(dir: String): Unit = {
    val rb = spark.read.schema(Retrieval.termsSchema)
      .parquet(s"$rebuilt/terms").localCheckpoint(true)
    fsOf(dir).delete(new org.apache.hadoop.fs.Path(s"$dir/terms"), true)
    rb.repartition(col("bucket"))
      .write.partitionBy("bucket").parquet(s"$dir/terms")
  }

  /** postings leg committed: survivors-only postings. */
  private def commitPostings(dir: String): Unit =
    graft.sinks.Sinks.deleteRows(
      spark, s"$dir/postings", "bucket", "id", doomed.toDF("id"))

  /** doclen leg committed: survivors-only registry. */
  private def commitDoclen(dir: String): Unit = {
    val surv = spark.read.schema(Retrieval.doclenSchema)
      .parquet(s"$dir/doclen")
      .filter(!col("id").isin(doomed: _*))
      .localCheckpoint(true)
    surv.write.mode("overwrite").parquet(s"$dir/doclen")
  }

  private def rerun(dir: String): Long =
    Retrieval.bm25Delete(spark, dir, doomed.toDF("doc_id"), "doc_id")

  test("clean delete converges (fixture sanity)") {
    val dir = freshIndex("clean")
    assert(rerun(dir) === 2L)
    assertConverged(dir, "clean")
  }

  test("terms-committed-only window: re-run converges") {
    val dir = freshIndex("w1")
    commitTerms(dir)
    // re-run: affected buckets re-derive identically (postings still
    // doomed) and the recompute is idempotent
    assert(rerun(dir) === 2L)
    assertConverged(dir, "terms-only")
  }

  test("terms+postings committed window: re-run converges") {
    val dir = freshIndex("w2")
    commitTerms(dir); commitPostings(dir)
    // re-run: affected set is EMPTY, the registry still lists the keys
    // -> only the doclen rewrite and the stats heal run
    assert(rerun(dir) === 2L)
    assertConverged(dir, "terms+postings")
  }

  test("doclen-committed-only window: re-run converges") {
    val dir = freshIndex("w3")
    commitDoclen(dir)
    // re-run: the registry no longer lists the keys (nDel == 0) but the
    // affected set is non-empty -> the terms+postings chain still runs;
    // the OLD code's nDel==0 early return would have stranded this
    // window forever
    assert(rerun(dir) === 0L)
    assertConverged(dir, "doclen-only")
  }

  test("all-rewrites-committed window: stale stats detected by fsck, healed by any delete") {
    val dir = freshIndex("w4")
    commitTerms(dir); commitPostings(dir); commitDoclen(dir)
    // interim state is detected, not silent
    val kinds = graft.operators.Fsck.bm25Fsck(spark, dir)
      .select(col("kind")).collect().map(_.getString(0)).toSet
    assert(kinds.contains("bm25_stats_ndocs") ||
      kinds.contains("bm25_stats_tokens"), s"got $kinds")
    // a KEY-MISS delete still heals the stranded stats
    assert(Retrieval.bm25Delete(
      spark, dir, Seq(777L).toDF("doc_id"), "doc_id") === 0L)
    assertConverged(dir, "stale-stats")
    assert(graft.operators.Fsck.bm25Fsck(spark, dir).count() === 0L)
  }

  /** Manufacture the round-17 advisor's window directly: stage the
    * postings survivors + intent marker exactly as deleteRows does,
    * retire the affected partitions, then "crash" before any landing —
    * live postings are now missing committed survivor rows AND the
    * doomed keys project to an empty affected set, the state that was
    * non-convergent before the intent protocol.
    */
  private def stageUnlandedDelete(dir: String): Unit = {
    val postings = s"$dir/postings"
    val all = spark.read.schema(Retrieval.postingsSchema).parquet(postings)
      .localCheckpoint(true)
    val affB = all.filter(col("id").isin(doomed: _*))
      .select(col("bucket")).distinct().collect().map(_.getLong(0)).sorted
    assert(affB.nonEmpty, "fixture: doomed docs must own postings")
    val surv = all
      .filter(col("bucket").isin(affB: _*) && !col("id").isin(doomed: _*))
      .localCheckpoint(true)
    val keptB = surv.select(col("bucket")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(keptB.nonEmpty, "fixture: some affected bucket must keep rows")
    surv.write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dir/postings__del_tmp")
    val kept = affB.filter(keptB).map(b => s"bucket=$b").toSeq
    val dmd = affB.filterNot(keptB).map(b => s"bucket=$b").toSeq
    val fs = fsOf(dir)
    graft.operators.StableRead.atomicWrite(fs,
      new org.apache.hadoop.fs.Path(postings),
      graft.sinks.Sinks.DeleteIntentName,
      (kept.map("K|" + _) ++ dmd.map("D|" + _))
        .mkString("", "\n", "\n#END\n"))
    graft.operators.StableRead.retirePartitions(
      fs, dir, "postings", kept ++ dmd)
  }

  test("staged-but-unlanded postings window: fsck flags it, re-run rolls forward") {
    val dir = freshIndex("w5")
    // reachable-state fidelity: deleteRows runs strictly AFTER the
    // terms recompute inside one thunk, so a crash inside deleteRows
    // always sees terms already committed
    commitTerms(dir)
    stageUnlandedDelete(dir)
    // the audit must surface the standing intent, not read past it
    val kinds = graft.operators.Fsck.bm25Fsck(spark, dir)
      .select(col("kind")).collect().map(_.getString(0)).toSet
    assert(kinds.contains("bm25_standing_delete_intent"), s"got $kinds")
    // re-running the SAME delete recovers the stage first (the doomed
    // keys alone could never re-derive the affected set — their
    // postings are retired), then converges
    assert(rerun(dir) === 2L)
    assertConverged(dir, "staged-unlanded")
    assert(graft.operators.Fsck.bm25Fsck(spark, dir).count() === 0L)
  }

  test("staged-and-partially-landed window: re-run retires nothing it already landed") {
    val dir = freshIndex("w6")
    commitTerms(dir) // terms precede deleteRows in the chain (see w5)
    stageUnlandedDelete(dir)
    // land ONE staged partition by hand (the atomic per-partition
    // rename), leaving the rest staged — the mid-landing-loop crash
    val fs = fsOf(dir)
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/postings__del_tmp")
    val first = fs.listStatus(tmp).map(_.getPath)
      .filter(_.getName.startsWith("bucket=")).minBy(_.getName)
    assert(fs.rename(first,
      new org.apache.hadoop.fs.Path(s"$dir/postings/${first.getName}")))
    // recovery must EXCLUDE the landed partition from the re-retire (a
    // blind re-retire would move the landed survivors to _retired and
    // lose them from live)
    assert(rerun(dir) === 2L)
    assertConverged(dir, "partially-landed")
  }

  test("no-op delete on a healthy index rewrites nothing") {
    val dir = freshIndex("noop")
    def snap(): Map[String, (Long, Long)] = {
      val b = java.nio.file.Paths.get(dir)
      val st = java.nio.file.Files.walk(b)
      try st.toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(p => java.nio.file.Files.isRegularFile(p))
        // the commit manifest AND its per-generation snapshot are
        // PROTOCOL metadata, not index data — a no-op delete still
        // commits a generation (every bracket exit does; the bracket
        // cannot know the body changed nothing)
        .filter(p => !p.getFileName.toString
          .contains(graft.operators.StableRead.ManifestName))
        .filter(p => !p.toString
          .contains(graft.operators.StableRead.SnapshotsDirName))
        .map(p => b.relativize(p).toString ->
          ((java.nio.file.Files.size(p),
            java.nio.file.Files.getLastModifiedTime(p).toMillis)))
        .toMap
      finally st.close()
    }
    val before = snap()
    assert(Retrieval.bm25Delete(
      spark, dir, Seq(777L).toDF("doc_id"), "doc_id") === 0L)
    assert(snap() === before, "a key-miss delete touched index files")
  }
}
