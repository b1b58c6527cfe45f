package graft

import graft.operators.{Retrieval, TextAnalysis}
import org.apache.spark.sql.functions._

/** BM25 retrieval, posting statistics, and the NB quality classifier —
  * each checked against an INDEPENDENT driver-side reference model
  * (plain Scala loops over the same tiny corpora), not against the
  * operator's own arithmetic.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry durian"),
    (4L, "")) // token-less: still counts toward N and avgdl

  /** Reference BM25: naive per-doc loop, same formula/parameters. */
  private def refBm25(
      docs: Seq[(Long, String)],
      query: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): Seq[(Long, Double)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSeq
    }.toMap
    val n = docs.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val dfm = toks.values.flatMap(_.distinct).groupBy(identity).map { case (t, xs) => t -> xs.size }
    val qts = query.split("\\s+").filter(_.nonEmpty).distinct
    docs.flatMap { case (id, _) =>
      val tfs = toks(id).groupBy(identity).map { case (t, xs) => t -> xs.size }
      val score = qts.flatMap { t =>
        dfm.get(t).flatMap { df =>
          tfs.get(t).map { tf =>
            val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            idf * (tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * toks(id).size / avgdl)))
          }
        }
      }.sum
      if (score > 0.0) Some(id -> score) else None
    }.sortBy { case (id, s) => (-s, id) }.take(k)
  }

  private def runBm25(query: String, k: Int = 10) =
    Retrieval.bm25TopK(
        corpus.toDF("doc_id", "text"), "doc_id", "text",
        Seq((1L, query)).toDF("query_id", "query_text"), k)
      .orderBy(col("rnk"))
      .select(col("doc_id"), col("score"))
      .as[(Long, Double)].collect().toSeq

  test("bm25 matches the independent reference model") {
    val got = runBm25("apple cherry")
    val want = refBm25(corpus, "apple cherry", 10)
      .map { case (id, s) => (id, math.rint(s * 1e4) / 1e4) }
    assert(got.map(_._1) === want.map(_._1))
    got.zip(want).foreach { case ((_, g), (_, w)) => assert(math.abs(g - w) < 1e-9) }
    // d3 (cherry tf=3) must outrank d2 (cherry tf=1) on the cherry arm;
    // d1 is the only apple holder
    assert(got.map(_._1).toSet === Set(1L, 2L, 3L))
  }

  test("bm25 distinct-term semantics: repeated query terms score once") {
    assert(runBm25("apple apple cherry") === runBm25("apple cherry"))
  }

  test("bm25 ignores out-of-corpus terms and honors the k cut") {
    assert(runBm25("zebra") === Seq.empty)
    val full = runBm25("banana cherry")
    val cut = runBm25("banana cherry", k = 2)
    assert(cut === full.take(2))
  }

  test("bm25 tie-break toward the smaller doc id") {
    val two = Seq((7L, "kiwi mango"), (3L, "kiwi mango"))
    val got = Retrieval.bm25TopK(
        two.toDF("doc_id", "text"), "doc_id", "text",
        Seq((1L, "kiwi")).toDF("query_id", "query_text"), 2)
      .orderBy(col("rnk")).select(col("doc_id")).as[Long].collect().toSeq
    assert(got === Seq(3L, 7L))
  }

  test("bm25 rejects bad parameters") {
    val df = corpus.toDF("doc_id", "text")
    val q = Seq((1L, "x")).toDF("query_id", "query_text")
    intercept[IllegalArgumentException](Retrieval.bm25TopK(df, "doc_id", "text", q, 0))
    intercept[IllegalArgumentException](Retrieval.bm25TopK(df, "doc_id", "text", q, 1, k1 = 0.0))
    intercept[IllegalArgumentException](Retrieval.bm25TopK(df, "doc_id", "text", q, 1, b = 1.5))
  }

  /** Reference 40-bit posting hash: same md5-prefix rule, independent impl. */
  private def refPostingHash(id: Long, tf: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id:$tf".getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(5).map(b => f"$b%02x").mkString, 16)
  }

  test("posting stats: exact counts and order-independent checksum") {
    val got = Retrieval.postingStats(corpus.toDF("doc_id", "text"), "doc_id", "text", 10)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // df order: cherry 2 = apple/banana... cherry df=2, banana df=2, apple df=1, durian df=1
    assert(got.map(_._1) === Seq("banana", "cherry", "apple", "durian"))
    val cherry = got.find(_._1 == "cherry").get
    assert(cherry._2 === 2L) // df: d2, d3
    assert(cherry._3 === 4L) // tf 1 + 3
    assert((cherry._4, cherry._5) === (2L, 3L))
    assert(cherry._6 === refPostingHash(2L, 1L) + refPostingHash(3L, 3L))
    val apple = got.find(_._1 == "apple").get
    assert(apple._6 === refPostingHash(1L, 2L))
  }

  test("posting checksum is partitioning-invariant") {
    val df = corpus.toDF("doc_id", "text")
    val a = Retrieval.postingStats(df, "doc_id", "text", 10).collect().toSeq
    val b = Retrieval.postingStats(df.repartition(7), "doc_id", "text", 10).collect().toSeq
    assert(a === b)
  }

  // NB classifier fixture: seed ids < 10. "good" docs clear the 0.75
  // quality gate (20 distinct clean tokens -> score 1.0); "bad" docs
  // fail it (20x the same token -> 0.4 + 0.02 + 0.2 = 0.62).
  private val goodText = (1 to 20).map(i => s"clean$i").mkString(" ")
  private val badText = Seq.fill(20)("spam").mkString(" ")
  private val nbDocs = Seq(
    (1L, goodText), (2L, goodText), (3L, badText),
    // targets:
    (11L, "clean1 clean2 clean3"), // good-vocab only
    (12L, "spam spam"), // bad-vocab only
    (13L, "zebra unseen words"), // fully unseen -> no row
    (14L, "clean1 spam")) // mixed

  private def refNb(): Map[Long, (Long, Double, Boolean)] = {
    val nPos = 2L; val nNeg = 1L
    val cpos = (1 to 20).map(i => s"clean$i" -> 2L).toMap // 2 good docs
    val cneg = Map("spam" -> 20L)
    val vocabAll = (cpos.keySet ++ cneg.keySet).toSeq
    val tp = 40L; val tn = 20L; val v = vocabAll.size.toLong // 21
    def w(t: String): Option[Double] =
      if (!cpos.contains(t) && !cneg.contains(t)) None
      else Some(
        math.log((cpos.getOrElse(t, 0L) + 1L).toDouble / (tp + v).toDouble) -
          math.log((cneg.getOrElse(t, 0L) + 1L).toDouble / (tn + v).toDouble))
    val prior = math.log(nPos.toDouble / nNeg.toDouble)
    nbDocs.filter(_._1 >= 10L).flatMap { case (id, text) =>
      val ws = text.split("\\s+").filter(_.nonEmpty).toSeq.flatMap(w(_))
      if (ws.isEmpty) None
      else {
        val s = prior + ws.sum
        Some(id -> ((ws.size.toLong, s, s > 0.0)))
      }
    }.toMap
  }

  test("nb classifier matches the independent reference on every arm") {
    val got = TextAnalysis.nbQualityScores(
        nbDocs.toDF("doc_id", "text"), "doc_id", "text", seedMax = 10L)
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val want = refNb()
    assert(got.keySet === want.keySet)
    assert(!got.contains(13L)) // fully-unseen doc carries no evidence
    want.foreach { case (id, (n, s, p)) =>
      val (gn, gs, gp) = got(id)
      assert(gn === n, s"doc $id n_terms")
      assert(math.abs(gs - s) < 1e-12, s"doc $id score")
      assert(gp === p, s"doc $id pred")
    }
    assert(got(11L)._3 && !got(12L)._3) // good-vocab pos, bad-vocab neg
  }

  test("indexed bm25 probe reproduces the direct scan exactly (odd modulus)") {
    val dir = java.nio.file.Files.createTempDirectory("bm25-spec-idx").toString
    val docs = corpus.toDF("doc_id", "text")
    val q = Seq((1L, "apple cherry"), (2L, "banana durian zebra"))
      .toDF("query_id", "query_text")
    // buckets=7: high buckets may stay EMPTY — the probe must recover
    // the build's modulus from stats, not infer it from written buckets
    graft.operators.Retrieval.buildBm25Index(docs, "doc_id", "text", dir, buckets = 7)
    val direct = graft.operators.Retrieval.bm25TopK(docs, "doc_id", "text", q, 10)
      .collect().map(_.toString).sorted.toSeq
    val probed = graft.operators.Retrieval.bm25TopKIndexed(dir, q, 10)
      .collect().map(_.toString).sorted.toSeq
    assert(probed.nonEmpty && probed === direct)
  }

  test("bm25 append: probe over an appended index equals the full rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("bm25-spec-app").toString
    val docs = corpus.toDF("doc_id", "text")
    val q = Seq((1L, "apple cherry"), (2L, "banana durian"))
      .toDF("query_id", "query_text")
    // base = docs 1-2, batch = docs 3-4: the batch shifts df("cherry"),
    // dl, N, and avgdl — every statistic the append must maintain
    graft.operators.Retrieval.buildBm25Index(
      docs.filter(col("doc_id") <= 2), "doc_id", "text", dir, buckets = 7)
    graft.operators.Retrieval.bm25Append(
      dir, docs.filter(col("doc_id") > 2), "doc_id", "text")
    val direct = graft.operators.Retrieval.bm25TopK(docs, "doc_id", "text", q, 10)
      .collect().map(_.toString).sorted.toSeq
    val probed = graft.operators.Retrieval.bm25TopKIndexed(dir, q, 10)
      .collect().map(_.toString).sorted.toSeq
    assert(probed.nonEmpty && probed === direct)
  }

  test("bm25 compact: probe identical before/after, postings files per bucket drop to 1") {
    val dir = java.nio.file.Files.createTempDirectory("bm25-spec-cmp").toString
    val docs = corpus.toDF("doc_id", "text")
    val q = Seq((1L, "apple cherry"), (2L, "banana durian"))
      .toDF("query_id", "query_text")
    graft.operators.Retrieval.buildBm25Index(
      docs.filter(col("doc_id") <= 2), "doc_id", "text", dir, buckets = 7)
    graft.operators.Retrieval.bm25Append(
      dir, docs.filter(col("doc_id") === 3), "doc_id", "text")
    graft.operators.Retrieval.bm25Append(
      dir, docs.filter(col("doc_id") === 4), "doc_id", "text")
    def bucketFiles(): Map[String, Int] =
      new java.io.File(s"$dir/postings").listFiles()
        .filter(_.getName.startsWith("bucket="))
        .map(d => d.getName ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    val before = graft.operators.Retrieval.bm25TopKIndexed(dir, q, 10)
      .collect().map(_.toString).sorted.toSeq
    // two appends on top of the build -> some bucket holds >= 2 files
    assert(bucketFiles().values.max >= 2,
      s"fixture failed to fragment the index: ${bucketFiles()}")
    graft.operators.Retrieval.bm25Compact(spark, dir)
    assert(bucketFiles().values.max === 1,
      s"compaction left multi-file buckets: ${bucketFiles()}")
    val after = graft.operators.Retrieval.bm25TopKIndexed(dir, q, 10)
      .collect().map(_.toString).sorted.toSeq
    assert(after.nonEmpty && after === before,
      "compaction changed the probe relation")
  }

  test("bm25 delete: probe equals a rebuild on survivors; untouched buckets byte-identical") {
    val dir = java.nio.file.Files.createTempDirectory("bm25-spec-del").toString
    val docs = corpus.toDF("doc_id", "text")
    val q = Seq((1L, "apple cherry"), (2L, "banana durian"))
      .toDF("query_id", "query_text")
    graft.operators.Retrieval.buildBm25Index(
      docs.filter(col("doc_id") <= 2), "doc_id", "text", dir, buckets = 64)
    graft.operators.Retrieval.bm25Append(
      dir, docs.filter(col("doc_id") > 2), "doc_id", "text")
    // physical posting files per bucket BEFORE the delete
    def postingFiles(): Map[String, Set[(String, Long, Long)]] =
      new java.io.File(s"$dir/postings").listFiles()
        .filter(_.getName.startsWith("bucket="))
        .map(d => d.getName -> d.listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.length, f.lastModified)).toSet).toMap
    val before = postingFiles()
    val affected = spark.read.parquet(s"$dir/postings")
      .filter(col("id") >= 3)
      .select(col("bucket")).distinct().as[Long].collect()
      .map(b => s"bucket=$b").toSet
    assert(affected.nonEmpty)
    // doom docs 3 (the only cherry-majority/durian doc) and 4 (TOKENLESS:
    // no postings, but the registry must still decrement N), plus an
    // absent key (no-op)
    val nDel = graft.operators.Retrieval.bm25Delete(
      spark, dir, Seq(3L, 4L, 999L).toDF("doc_id"), "doc_id")
    assert(nDel === 2L, s"deleted $nDel docs")
    // untouched buckets keep their PHYSICAL files
    val after = postingFiles()
    before.keySet.diff(affected).foreach { b =>
      assert(after(b) === before(b), s"untouched bucket $b was rewritten")
    }
    // probe equals a from-scratch rebuild on the survivors, bit for bit
    val rebuilt = java.nio.file.Files.createTempDirectory("bm25-spec-del-rb").toString
    graft.operators.Retrieval.buildBm25Index(
      docs.filter(col("doc_id") <= 2), "doc_id", "text", rebuilt, buckets = 64)
    val probed = graft.operators.Retrieval.bm25TopKIndexed(dir, q, 10)
      .collect().map(_.toString).sorted.toSeq
    val want = graft.operators.Retrieval.bm25TopKIndexed(rebuilt, q, 10)
      .collect().map(_.toString).sorted.toSeq
    assert(probed.nonEmpty && probed === want)
    // stats decremented exactly (docs 1+2: 3+2 tokens); terms whose df
    // hit 0 are gone; the registry holds exactly the survivors
    val st = spark.read.parquet(s"$dir/stats").collect()(0)
    assert((st.getAs[Long]("n_docs"), st.getAs[Long]("total_tokens")) === ((2L, 5L)))
    val terms = spark.read.parquet(s"$dir/terms")
      .select(col("term")).as[String].collect().toSet
    assert(terms === Set("apple", "banana", "cherry"))
    assert(spark.read.parquet(s"$dir/doclen")
      .select(col("id")).as[Long].collect().toSet === Set(1L, 2L))
    // absent-only key list is a no-op returning 0
    assert(graft.operators.Retrieval.bm25Delete(
      spark, dir, Seq(777L).toDF("doc_id"), "doc_id") === 0L)
  }

  test("bm25 merge: merged shards equal the full rebuild; sources untouched; guards hold") {
    val dirA = java.nio.file.Files.createTempDirectory("bm25-spec-mg-a").toString
    val dirB = java.nio.file.Files.createTempDirectory("bm25-spec-mg-b").toString
    val parent = java.nio.file.Files.createTempDirectory("bm25-spec-mg").toString
    val dest = s"$parent/merged"
    val docs = corpus.toDF("doc_id", "text")
    val q = Seq((1L, "apple cherry"), (2L, "banana durian"))
      .toDF("query_id", "query_text")
    // shard A: docs 1-2; shard B: docs 3-4 (incl. the TOKENLESS doc 4 —
    // its registry row must survive the file union so N stays exact)
    graft.operators.Retrieval.buildBm25Index(
      docs.filter(col("doc_id") <= 2), "doc_id", "text", dirA, buckets = 7)
    graft.operators.Retrieval.buildBm25Index(
      docs.filter(col("doc_id") > 2), "doc_id", "text", dirB, buckets = 7)
    def fileMap(root: String): Set[String] = {
      val b = java.nio.file.Paths.get(root)
      val st = java.nio.file.Files.walk(b)
      try st.toArray.map(p => b.relativize(
        p.asInstanceOf[java.nio.file.Path]).toString).toSet
      finally st.close()
    }
    val beforeA = fileMap(dirA)
    graft.operators.Retrieval.bm25Merge(spark, dirA, dirB, dest)
    // sources byte-layout untouched
    assert(fileMap(dirA) === beforeA)
    // probe == full-corpus rebuild, bit for bit
    val rebuilt = java.nio.file.Files.createTempDirectory("bm25-spec-mg-rb").toString
    graft.operators.Retrieval.buildBm25Index(
      docs, "doc_id", "text", rebuilt, buckets = 7)
    val merged = graft.operators.Retrieval.bm25TopKIndexed(dest, q, 10)
      .collect().map(_.toString).sorted.toSeq
    val want = graft.operators.Retrieval.bm25TopKIndexed(rebuilt, q, 10)
      .collect().map(_.toString).sorted.toSeq
    assert(merged.nonEmpty && merged === want)
    // stats are the shard sums; the registry holds every doc
    val st = spark.read.parquet(s"$dest/stats").collect()(0)
    assert((st.getAs[Long]("n_docs"), st.getAs[Long]("total_tokens")) === ((4L, 9L)))
    assert(spark.read.parquet(s"$dest/doclen")
      .select(col("id")).as[Long].collect().toSet === Set(1L, 2L, 3L, 4L))
    // guards: existing dest and modulus mismatch both abort
    intercept[IllegalArgumentException] {
      graft.operators.Retrieval.bm25Merge(spark, dirA, dirB, dest)
    }
    val dirC = java.nio.file.Files.createTempDirectory("bm25-spec-mg-c").toString
    graft.operators.Retrieval.buildBm25Index(
      docs.filter(col("doc_id") <= 2), "doc_id", "text", dirC, buckets = 5)
    intercept[IllegalArgumentException] {
      graft.operators.Retrieval.bm25Merge(spark, dirC, dirB, s"$parent/m2")
    }
  }

  test("bm25Merge N-way: one 4-shard merge == pairwise tree == rebuild; move consumes parts") {
    val parent = java.nio.file.Files.createTempDirectory("bm25-spec-nway").toString
    val docs = corpus.toDF("doc_id", "text")
    val q = Seq((1L, "apple cherry"), (2L, "banana durian"))
      .toDF("query_id", "query_text")
    def probe(path: String) =
      graft.operators.Retrieval.bm25TopKIndexed(path, q, 10)
        .collect().map(_.toString).sorted.toSeq
    val shards = (0 until 4).map { i =>
      val p = s"$parent/sh$i"
      graft.operators.Retrieval.buildBm25Index(
        docs.filter(col("doc_id") % 4 === i), "doc_id", "text", p, buckets = 7)
      p
    }
    // ONE variadic merge vs the pairwise tree over the same shards: the
    // df job folds N ways at once vs log N times — results must be
    // identical, and both must equal the full single-corpus rebuild
    graft.operators.Retrieval.bm25Merge(spark, shards, s"$parent/nway")
    graft.operators.Retrieval.bm25Merge(spark, shards(0), shards(1), s"$parent/t01")
    graft.operators.Retrieval.bm25Merge(spark, shards(2), shards(3), s"$parent/t23")
    graft.operators.Retrieval.bm25Merge(spark, s"$parent/t01", s"$parent/t23", s"$parent/tree")
    val rebuilt = s"$parent/rebuilt"
    graft.operators.Retrieval.buildBm25Index(docs, "doc_id", "text", rebuilt, buckets = 7)
    val want = probe(rebuilt)
    assert(want.nonEmpty)
    assert(probe(s"$parent/nway") === want)
    assert(probe(s"$parent/tree") === want)
    val st = spark.read.parquet(s"$parent/nway/stats").collect()(0)
    assert((st.getAs[Long]("n_docs"), st.getAs[Long]("total_tokens")) === ((4L, 9L)))
    // move = true: same result from renames, and the consumed sources'
    // corpus-sized dirs hold no part files afterwards
    def partFiles(root: String): Seq[String] = {
      val b = java.nio.file.Paths.get(root)
      if (!java.nio.file.Files.isDirectory(b)) Seq.empty
      else {
        val st = java.nio.file.Files.walk(b)
        try st.toArray.map(_.toString).filter(_.endsWith(".parquet")).toSeq
        finally st.close()
      }
    }
    graft.operators.Retrieval.bm25Merge(
      spark, Seq(s"$parent/t01", s"$parent/t23"), s"$parent/moved", move = true)
    assert(probe(s"$parent/moved") === want)
    Seq("t01", "t23").foreach { t =>
      assert(partFiles(s"$parent/$t/postings").isEmpty,
        s"move left part files in $t/postings")
      assert(partFiles(s"$parent/$t/doclen").isEmpty,
        s"move left part files in $t/doclen")
    }
    // < 2 shards aborts
    intercept[IllegalArgumentException] {
      graft.operators.Retrieval.bm25Merge(spark, Seq(rebuilt), s"$parent/m1")
    }
  }

  test("bm25 stream-ingest apply converges every crash window to exactly one application") {
    val dir = java.nio.file.Files.createTempDirectory("bm25-spec-ing").toString
    val docs = corpus.toDF("doc_id", "text")
    val q = Seq((1L, "apple cherry durian")).toDF("query_id", "query_text")
    def probe(path: String) =
      graft.operators.Retrieval.bm25TopKIndexed(path, q, 10)
        .collect().map(_.toString).sorted.toSeq
    def statsOf(path: String) = {
      val r = spark.read.parquet(s"$path/stats").collect()(0)
      (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"))
    }
    def rebuildWant(maxId: Long): Seq[String] = {
      val p = java.nio.file.Files.createTempDirectory("bm25-spec-ing-rb").toString
      graft.operators.Retrieval.buildBm25Index(
        docs.filter(col("doc_id") <= maxId), "doc_id", "text", p, buckets = 7)
      probe(p)
    }
    graft.operators.Retrieval.buildBm25Index(
      docs.filter(col("doc_id") <= 2), "doc_id", "text", dir, buckets = 7)
    // happy path: batch 0 lands docs 3+4 (4 is tokenless)
    graft.operators.Retrieval.bm25IngestBatch(
      dir, docs.filter(col("doc_id") > 2), "doc_id", "text", 0L)
    val want = rebuildWant(4L)
    assert(probe(dir) === want && statsOf(dir) === ((4L, 9L)))
    // post-commit re-delivery: marker present -> skipped whole
    graft.operators.Retrieval.bm25IngestBatch(
      dir, docs.filter(col("doc_id") > 2), "doc_id", "text", 0L)
    assert(probe(dir) === want && statsOf(dir) === ((4L, 9L)))
    // mid-apply crash of batch 1: tagged junk parts moved in — postings,
    // doclen, AND a terms df-delta bomb (terms is append-delta since
    // round 19; a missed tagged delta row would inflate "apple"'s
    // merge-on-read df 100x) — plus stats renamed away entirely (the
    // window between its two renames)
    def plant(df: org.apache.spark.sql.DataFrame, dst: String): Unit = {
      val stage = java.nio.file.Files.createTempDirectory("bm25-spec-plant").toString
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      new java.io.File(dst).mkdirs()
      java.nio.file.Files.move(part.toPath,
        new java.io.File(dst, s"b1_${part.getName}").toPath)
    }
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sessionState.newHadoopConf())
    val appleBucket = spark.range(1)
      .select(pmod(xxhash64(lit("apple")), lit(7L))).collect()(0).getLong(0)
    plant(Seq((-7L, "apple", 50L)).toDF("id", "term", "tf"),
      s"$dir/postings/bucket=$appleBucket")
    plant(Seq((-7L, 50L)).toDF("id", "dl"), s"$dir/doclen")
    plant(Seq(("apple", 100L)).toDF("term", "df"),
      s"$dir/terms/bucket=$appleBucket")
    new java.io.File(s"$dir/_ingest_b1_tmp").mkdirs() // crash staging
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/stats"),
      new org.apache.hadoop.fs.Path(s"$dir/stats_b1_bak"))
    // the re-delivered batch must erase all of it, then apply docs 5+6
    val more = Seq((5L, "durian apple"), (6L, "elderberry"))
      .toDF("doc_id", "text")
    graft.operators.Retrieval.bm25IngestBatch(dir, more, "doc_id", "text", 1L)
    val want2 = {
      val p = java.nio.file.Files.createTempDirectory("bm25-spec-ing-rb2").toString
      graft.operators.Retrieval.buildBm25Index(
        docs.unionByName(more), "doc_id", "text", p, buckets = 7)
      probe(p)
    }
    assert(probe(dir) === want2 && statsOf(dir) === ((6L, 12L)))
    // no _bak/_new/_tmp debris survives a completed apply
    val debris = new java.io.File(dir).listFiles().map(_.getName)
      .filter(n => n.contains("_bak") || n.contains("_new") || n.contains("_tmp"))
    assert(debris.isEmpty, s"leftover apply state: ${debris.mkString(", ")}")
    // an empty batch commits as a no-op marker: stats untouched, id burned
    graft.operators.Retrieval.bm25IngestBatch(
      dir, docs.filter(col("doc_id") > 100), "doc_id", "text", 2L)
    assert(statsOf(dir) === ((6L, 12L)))
    // maintenance is layout-blind over streamed generations: compaction
    // collapses the per-batch file sets, probe bit-identical
    graft.operators.Retrieval.bm25Compact(spark, dir)
    assert(probe(dir) === want2)
    // (filter the local-FS .crc sidecars)
    assert(new java.io.File(s"$dir/ingestlog").list()
      .filterNot(_.startsWith(".")).sorted.toSeq === Seq("b0", "b1", "b2"))
    // ... and so is targeted deletion: a takedown from the
    // streamed-and-compacted index equals a rebuild on the survivors
    assert(graft.operators.Retrieval.bm25Delete(
      spark, dir, Seq(5L).toDF("doc_id"), "doc_id") === 1L)
    val want3 = {
      val p = java.nio.file.Files.createTempDirectory("bm25-spec-ing-rb3").toString
      graft.operators.Retrieval.buildBm25Index(
        docs.unionByName(more).filter(col("doc_id") =!= 5L),
        "doc_id", "text", p, buckets = 7)
      probe(p)
    }
    assert(probe(dir) === want3)
  }

  test("bm25DeleteBatchPlan predicts exactly the buckets bm25Delete rewrites") {
    val dir = java.nio.file.Files.createTempDirectory("bm25-spec-plan").toString
    // a wider corpus so doomed terms spread across several of 16 buckets
    val docs = (1L to 24L).map(i =>
      (i, s"w${i} w${i + 1} w${i + 2} shared")).toDF("doc_id", "text")
    graft.operators.Retrieval.buildBm25Index(
      docs, "doc_id", "text", dir, buckets = 16)
    val keys = Seq(3L, 11L).toDF("doc_id")
    val plan = graft.operators.Retrieval.bm25DeleteBatchPlan(
      spark, dir, keys, "doc_id").collect()(0)
    // independent prediction: the doomed docs' distinct terms, bucketed
    // straight off the RAW corpus (never through the index)
    val expectedBuckets = docs.filter(col("doc_id").isin(3L, 11L))
      .select(explode(split(col("text"), " ")).as("term")).distinct()
      .select(pmod(xxhash64(col("term")), lit(16L)).as("b"))
      .distinct().as[Long].collect().toSet
    assert(plan.getAs[Long]("n_doomed_docs") === 2L)
    assert(plan.getAs[Long]("doomed_postings") === 8L) // 4 distinct terms x 2 docs
    assert(plan.getAs[Long]("n_affected_buckets") === expectedBuckets.size.toLong)
    assert(plan.getAs[Long]("n_buckets") === 16L)
    assert(plan.getAs[Double]("affected_fraction")
      === expectedBuckets.size.toDouble / 16.0)
    // measured footprint: per-bucket postings file state before/after a
    // REAL delete — the changed set must be exactly the predicted set
    def fileState(): Map[Long, Set[(String, Long)]] =
      new java.io.File(s"$dir/postings").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .map(d => d.getName.stripPrefix("bucket=").toLong ->
          d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => (f.getName, f.length)).toSet)
        .toMap
    val before = fileState()
    val nDel = graft.operators.Retrieval.bm25Delete(spark, dir, keys, "doc_id")
    assert(nDel === plan.getAs[Long]("n_doomed_docs"))
    val after = fileState()
    val changed = (before.keySet ++ after.keySet)
      .filter(b => before.get(b) != after.get(b))
    assert(changed === expectedBuckets,
      s"measured rewrite footprint $changed != predicted $expectedBuckets")
    // planning an absent key is a zero-footprint no-op
    val empty = graft.operators.Retrieval.bm25DeleteBatchPlan(
      spark, dir, Seq(999L).toDF("doc_id"), "doc_id").collect()(0)
    assert(empty.getAs[Long]("n_doomed_docs") === 0L)
    assert(empty.getAs[Long]("n_affected_buckets") === 0L)
    assert(empty.getAs[Double]("affected_fraction") === 0.0)
    // the planning read is column-pruned: the postings scan must not
    // read term or tf (the plan's honest cost is one (id, bucket) pass)
    val planStr = graft.operators.Retrieval.bm25DeleteBatchPlan(
        spark, dir, keys, "doc_id")
      .queryExecution.executedPlan.toString
    val postingsSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(planStr).map(_.group(1)).toSeq
    assert(postingsSchemas.exists(s => s.contains("id") && !s.contains("term")),
      s"postings scan not pruned to (id):\n$planStr")
    assert(!postingsSchemas.exists(_.contains("term")),
      s"a planning scan reads the term column:\n$planStr")
  }

  test("bm25Init: empty index probes as the empty relation, then grows by ingest") {
    val dir = java.nio.file.Files.createTempDirectory("bm25-spec-init").toString + "/idx"
    graft.operators.Retrieval.bm25Init(spark, dir, buckets = 7)
    val q = Seq((1L, "apple banana")).toDF("query_id", "query_text")
    // a probe of the empty index is empty, not an inference abort
    assert(graft.operators.Retrieval.bm25TopKIndexed(dir, q, 10).collect().isEmpty)
    // the first streamed batch applies against the empty generation
    graft.operators.Retrieval.bm25IngestBatch(
      dir, Seq((1L, "apple"), (2L, "banana apple")).toDF("doc_id", "text"),
      "doc_id", "text", 0L)
    val want = {
      val p = java.nio.file.Files.createTempDirectory("bm25-spec-init-rb").toString
      graft.operators.Retrieval.buildBm25Index(
        Seq((1L, "apple"), (2L, "banana apple")).toDF("doc_id", "text"),
        "doc_id", "text", p, buckets = 7)
      graft.operators.Retrieval.bm25TopKIndexed(p, q, 10)
        .collect().map(_.toString).sorted.toSeq
    }
    assert(graft.operators.Retrieval.bm25TopKIndexed(dir, q, 10)
      .collect().map(_.toString).sorted.toSeq === want)
    // refuses a double init
    intercept[IllegalArgumentException] {
      graft.operators.Retrieval.bm25Init(spark, dir, 7)
    }
  }

  test("indexed bm25 probe partition-prunes the postings scan to the query buckets") {
    val dir = java.nio.file.Files.createTempDirectory("bm25-spec-prune").toString
    val docs = corpus.toDF("doc_id", "text")
    graft.operators.Retrieval.buildBm25Index(docs, "doc_id", "text", dir, buckets = 64)
    val probe = graft.operators.Retrieval.bm25TopKIndexed(
      dir, Seq((1L, "apple")).toDF("query_id", "query_text"), 10)
    val plan = probe.queryExecution.executedPlan.toString
    spark.sharedState.cacheManager.clearCache()
    // both bucketed scans (postings + terms) must carry a bucket
    // partition filter; doclen is unbucketed by design
    val pruned = "PartitionFilters: \\[[^\\]]*bucket".r.findAllIn(plan).length
    assert(pruned >= 2,
      s"expected bucket partition filters on both index scans, got $pruned:\n" + plan)
  }

  test("rrf fusion: both-arm docs win, cross-arm ties break by id, sentinels mark absent arms") {
    // query 1: doc 10 ranks 1 in A and 2 in B; doc 20 only in A at rank 2;
    // doc 30 only in B at rank 1; doc 40 only in A at rank 3 TIES doc 50
    // only in B at rank 3 -> tie broken toward doc 40.
    val a = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 40L, 3)).toDF("query_id", "doc_id", "rnk")
    val b = Seq((1L, 30L, 1), (1L, 10L, 2), (1L, 50L, 3)).toDF("query_id", "doc_id", "rnk")
    val got = graft.operators.Retrieval.rrfFuse(a, b, k = 10)
      .orderBy(col("rnk"))
      .as[(Long, Int, Long, Double, Int, Int)].collect().toSeq
    assert(got.map(_._3) === Seq(10L, 30L, 20L, 40L, 50L))
    val byDoc = got.map(g => g._3 -> g).toMap
    assert(byDoc(10L)._4 === math.rint((1.0 / 61 + 1.0 / 62) * 1e6) / 1e6)
    assert((byDoc(10L)._5, byDoc(10L)._6) === (1, 2))
    assert((byDoc(30L)._5, byDoc(30L)._6) === (-1, 1))
    assert((byDoc(20L)._5, byDoc(20L)._6) === (2, -1))
    // the planted tie: identical fused scores, 40 < 50 decides
    assert(byDoc(40L)._4 === byDoc(50L)._4)
    assert(byDoc(40L)._2 < byDoc(50L)._2)
  }

  test("rrf fusion honors the k cut and rejects bad args") {
    val a = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("query_id", "doc_id", "rnk")
    val b = Seq((1L, 30L, 1)).toDF("query_id", "doc_id", "rnk")
    val cut = graft.operators.Retrieval.rrfFuse(a, b, k = 1).collect()
    assert(cut.length === 1)
    intercept[IllegalArgumentException](graft.operators.Retrieval.rrfFuse(a, b, 0))
    intercept[IllegalArgumentException](graft.operators.Retrieval.rrfFuse(a, b, 1, c = 0))
  }

  test("phrase search: positions, overlapping matches, repeated phrase terms") {
    val docs = Seq(
      (1L, "x a b c y a b"), // "a b" at 1 and 5; "a b c" at 1
      (2L, "a a a"),         // "a a" overlaps at 0 and 1
      (3L, "b a"),           // reversed order must NOT match "a b"
      (4L, "")).toDF("doc_id", "text")
    val phrases = Seq((1L, "a b"), (2L, "a a"), (3L, "a b c"))
      .toDF("phrase_id", "phrase_text")
    val out = Retrieval.phraseSearch(docs, "doc_id", "text", phrases)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet
    assert(out === Set(
      (1L, 1L, 2L, 1), // two occurrences, first at position 1
      (2L, 2L, 2L, 0), // overlapping starts both count
      (3L, 1L, 1L, 1)))
  }

  test("phrase search: a partial prefix match is not an occurrence") {
    // doc has "a b" but never "a b c"; the base-position group sees idx
    // 0 and 1 witnessed but not 2 -> no row
    val docs = Seq((1L, "a b x c")).toDF("doc_id", "text")
    val phrases = Seq((1L, "a b c")).toDF("phrase_id", "phrase_text")
    assert(Retrieval.phraseSearch(docs, "doc_id", "text", phrases).count() === 0)
  }

  test("nb training fails loudly on a one-class seed") {
    val oneClass = Seq((1L, goodText), (2L, goodText), (11L, "clean1"))
    val ex = intercept[IllegalArgumentException] {
      TextAnalysis.nbQualityScores(
        oneClass.toDF("doc_id", "text"), "doc_id", "text", seedMax = 10L)
    }
    assert(ex.getMessage.contains("both classes"))
  }
}
