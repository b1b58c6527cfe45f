package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, if (i % 4 == 0) "en" else "de")).toDF("id", "lang")

  test("assignSplit covers every row, near the requested fractions") {
    val out = Sampling.assignSplit(
      docs(10000), "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 10000)
    assert(counts.keySet == Set("train", "val", "test"))
    // md5 is uniform: 3-sigma tolerance on a binomial(10000, p)
    assert(math.abs(counts("train") - 8000) < 3 * math.sqrt(10000 * 0.8 * 0.2))
    assert(math.abs(counts("val") - 1000) < 3 * math.sqrt(10000 * 0.1 * 0.9))
  }

  test("assignSplit is deterministic and partitioning-invariant") {
    val a = Sampling.assignSplit(docs(2000), "id", Seq("a" -> 0.5, "b" -> 0.5))
      .select("id", "split").as[(Long, String)].collect().toMap
    val b = Sampling.assignSplit(docs(2000).repartition(13), "id", Seq("a" -> 0.5, "b" -> 0.5))
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
  }

  test("assignSplit sends NULL keys to the last split (SQL CASE parity)") {
    val withNull = Seq((java.lang.Long.valueOf(1L), "x"),
      (null.asInstanceOf[java.lang.Long], "y")).toDF("id", "v")
    val out = Sampling.assignSplit(
      withNull, "id", Seq("train" -> 0.9, "eval" -> 0.1))
      .select("v", "split").as[(String, String)].collect().toMap
    assert(out("y") == "eval") // documented fall-through, matches CASE ... ELSE
  }

  test("assignSplit rejects fractions that do not sum to 1") {
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(docs(10), "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("different salts give independent assignments") {
    val n = 4000
    val s1 = Sampling.assignSplit(docs(n), "id", Seq("a" -> 0.5, "b" -> 0.5), salt = "s1")
      .filter($"split" === "a").select("id").as[Long].collect().toSet
    val s2 = Sampling.assignSplit(docs(n), "id", Seq("a" -> 0.5, "b" -> 0.5), salt = "s2")
      .filter($"split" === "a").select("id").as[Long].collect().toSet
    val overlap = s1.intersect(s2).size.toDouble
    // independent halves overlap in ~25% of rows; 3-sigma band
    assert(math.abs(overlap - n * 0.25) < 3 * math.sqrt(n * 0.25 * 0.75), s"overlap $overlap")
  }

  test("stratifiedSample keeps per-stratum fractions and is a subset") {
    val out = Sampling.stratifiedSample(
      docs(8000), "id", "lang", Map("en" -> 0.5, "de" -> 0.1))
    val counts = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    // 2000 en rows at 0.5, 6000 de rows at 0.1
    assert(math.abs(counts("en") - 1000) < 3 * math.sqrt(2000 * 0.25))
    assert(math.abs(counts("de") - 600) < 3 * math.sqrt(6000 * 0.09))
    // sampling never invents rows
    assert(out.join(docs(8000), Seq("id"), "left_anti").count() == 0)
  }

  test("mixture thins each source to its rate, independently per source") {
    val a = (0 until 4000).map(i => (i.toLong, "a")).toDF("id", "src")
    val b = (0 until 4000).map(i => (i.toLong, "b")).toDF("id", "src") // SAME ids
    val out = Sampling.mixture(Seq(a -> 0.5, b -> 0.5), "id")
    val counts = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("a") - 2000) < 3 * math.sqrt(4000 * 0.25))
    assert(math.abs(counts("b") - 2000) < 3 * math.sqrt(4000 * 0.25))
    // identical key values in different sources draw INDEPENDENT keys
    // (the salt carries the source index): without it the two kept id
    // sets would be identical; independent halves overlap in ~25%
    val aKept = out.filter($"src" === "a").select("id").as[Long].collect().toSet
    val bKept = out.filter($"src" === "b").select("id").as[Long].collect().toSet
    val overlap = aKept.intersect(bKept).size.toDouble
    assert(math.abs(overlap - 1000) < 3 * math.sqrt(4000 * 0.25 * 0.75),
      s"overlap $overlap suggests correlated keys across sources")
    // rate 1.0 keeps every row
    assert(Sampling.mixture(Seq(a -> 1.0), "id").count() == 4000)
  }

  test("stratifiedSample default fraction 0 drops unmapped strata") {
    val out = Sampling.stratifiedSample(docs(1000), "id", "lang", Map("en" -> 1.0))
    assert(out.filter($"lang" =!= "en").count() == 0)
    assert(out.count() == 250) // every en row survives at fraction 1.0
  }

  test("topFractionPerGroup: exact integer cut, ties broken by the tie column") {
    // group g: scores 10,10,10,8 — keep 2/4 => ranks 1,2: the two LOWEST
    // ids among the score-10 ties
    val df = Seq(
      ("g", 3L, 10L), ("g", 1L, 10L), ("g", 2L, 10L), ("g", 4L, 8L),
      ("h", 9L, 5L), ("h", 8L, 7L)   // keep 2/4 of 2 rows => rank*4<=2*2 => rank 1
    ).toDF("grp", "id", "score")
    val kept = Sampling.topFractionPerGroup(df, "grp", "score", "id", 2, 4)
      .select("grp", "id").as[(String, Long)].collect().toSet
    assert(kept == Set(("g", 1L), ("g", 2L), ("h", 8L)))
  }

  test("approxThresholdCut agrees with the exact cut at exact accuracy") {
    val rng = new scala.util.Random(5)
    val df = (1L to 2000L).map(i =>
      (s"l${i % 4}", i, rng.nextInt(100000).toLong)).toDF("grp", "id", "score")
    // distinct scores w.h.p. => no boundary ties; accuracy >> n makes the
    // percentile sketch exact, so the two forms must agree exactly
    val exact = Sampling.topFractionPerGroup(df, "grp", "score", "id", 3, 4)
      .select("id").as[Long].collect().toSet
    val approx = Sampling.approxThresholdCut(df, "grp", "score", 0.75, accuracy = 100000)
      .select("id").as[Long].collect().toSet
    val disagree = (exact diff approx).size + (approx diff exact).size
    assert(disagree <= exact.size / 100,
      s"approx cut diverged on $disagree of ${exact.size}")
  }

  test("sampleExactKPerGroup: exact size, subset, deterministic, k > group size") {
    val df = docs(1000) // 250 per lang
    val out = Sampling.sampleExactKPerGroup(df, "lang", "id", 40)
    val counts = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ == 40), counts.toString)
    // deterministic: same call, same ids, regardless of partitioning
    val a = out.select("id").as[Long].collect().toSet
    val b = Sampling.sampleExactKPerGroup(df.repartition(13), "lang", "id", 40)
      .select("id").as[Long].collect().toSet
    assert(a == b, "exact-k sample changed under repartitioning")
    // k larger than the group keeps the whole group
    assert(Sampling.sampleExactKPerGroup(df, "lang", "id", 9999).count() == 1000)
  }

  test("capPerGroup: absolute quality-first cut, total-order ties, cap > group") {
    import org.apache.spark.sql.functions.col
    // group g: lengths 10,10,9,8 with cap 2 -> the two best, tie on 10
    // broken by id ASC; group h smaller than the cap keeps everything
    val df = Seq(
      ("g", 3L, 10L), ("g", 1L, 10L), ("g", 2L, 9L), ("g", 4L, 8L),
      ("h", 9L, 5L)
    ).toDF("grp", "id", "len")
    val kept = Sampling.capPerGroup(
        df, Seq("grp"), Seq(col("len").desc, col("id").asc), cap = 2)
      .select("grp", "id").as[(String, Long)].collect().toSet
    assert(kept == Set(("g", 1L), ("g", 3L), ("h", 9L)))
    // deterministic under repartitioning (the order is total)
    val again = Sampling.capPerGroup(
        df.repartition(7), Seq("grp"), Seq(col("len").desc, col("id").asc), 2)
      .select("grp", "id").as[(String, Long)].collect().toSet
    assert(again == kept)
    assert(Sampling.capPerGroup(
      df, Seq("grp"), Seq(col("id").asc), cap = 100).count() == 5)
  }

  test("approxThresholdCut plan: no sort or shuffle of the data rows") {
    val df = (1L to 100L).map(i => ("g", i, i)).toDF("grp", "id", "score")
    val plan = Sampling.approxThresholdCut(df, "grp", "score", 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("SortExec"), plan)
  }

  test("deterministicShuffle is a permutation with contiguous per-shard positions") {
    val df = docs(3000)
    val out = Sampling.deterministicShuffle(df, "id", numShards = 8)
      .select($"id", $"shard", $"pos").as[(Long, Long, Long)].collect()
    // every id exactly once
    assert(out.map(_._1).toSet == (0L until 3000L).toSet)
    // positions within each shard are exactly 0..n_s-1 (dense, no gaps)
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq,
        s"shard $shard positions not dense")
    }
    // shard sizes binomial around 3000/8 (5-sigma)
    val sizes = out.groupBy(_._2).view.mapValues(_.length).toMap
    val p = 1.0 / 8
    sizes.values.foreach(s =>
      assert(math.abs(s - 3000 * p) < 5 * math.sqrt(3000 * p * (1 - p)),
        s"shard sizes skewed: $sizes"))
  }

  test("deterministicShuffle is partitioning-invariant and actually permutes") {
    val a = Sampling.deterministicShuffle(docs(1000), "id", 4)
      .select($"id", $"shard", $"pos").as[(Long, Long, Long)].collect().toSet
    val b = Sampling.deterministicShuffle(docs(1000).repartition(13), "id", 4)
      .select($"id", $"shard", $"pos").as[(Long, Long, Long)].collect().toSet
    assert(a == b, "shuffle coordinates changed under repartitioning")
    // the permutation is not the identity-ish order: within shard 0, ids
    // are not sorted (overwhelming probability for 1000 uniform draws)
    val shard0 = a.filter(_._2 == 0L).toSeq.sortBy(_._3).map(_._1)
    assert(shard0 != shard0.sorted, "shuffle left ids in sorted order")
  }

  test("temperatureTargets: integer alpha=0.5 weights, capped at group size") {
    val df = ((1 to 100).map(i => ("a", i.toLong)) ++
      (1 to 400).map(i => ("b", 1000L + i)) ++
      (1 to 900).map(i => ("c", 10000L + i))).toDF("grp", "id")
    val t = Sampling.temperatureTargets(df, "grp", totalTarget = 120L)
      .select($"grp", $"n", $"weight", $"target_n")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // weights floor(sqrt(n)) = 10/20/30, sum 60; targets 120*w/60 = 2w
    assert(t("a") == ((100L, 10L, 20L)), t.toString)
    assert(t("b") == ((400L, 20L, 40L)), t.toString)
    assert(t("c") == ((900L, 30L, 60L)), t.toString)
    // cap: a tiny group cannot be asked for more rows than it has
    val tiny = ((1 to 4).map(i => ("t", i.toLong)) ++
      (1 to 10000).map(i => ("u", 100L + i))).toDF("grp", "id")
    val t2 = Sampling.temperatureTargets(tiny, "grp", totalTarget = 10200L)
      .select($"grp", $"target_n").as[(String, Long)].collect().toMap
    assert(t2("t") == 4L, s"tiny group target not capped: $t2")
  }

  test("deterministicShuffle shard assignment is stable under corpus growth") {
    // shard derives from the id's md5 alone, so appending new documents
    // never MOVES an existing document's shard — the incremental-ingest
    // property: only positions within affected shards shift
    val small = Sampling.deterministicShuffle(docs(500), "id", 8)
      .select($"id", $"shard").as[(Long, Long)].collect().toMap
    val grown = Sampling.deterministicShuffle(docs(2000), "id", 8)
      .select($"id", $"shard").as[(Long, Long)].collect().toMap
    small.foreach { case (id, shard) =>
      assert(grown(id) == shard, s"doc $id moved shard when the corpus grew")
    }
  }

  test("weightedSampleK equals the reference A-ES computation exactly") {
    // independent reference model: md5 in plain Scala, max of w draws,
    // top-k by (key desc, id)
    def u32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val rows = (1L to 50L).map(i => (i, (i % 7) + 1)) // weights 1..7
    val expected = rows.map { case (id, w) =>
      (id, (1L to w).map(j => u32(s"wsample:$id:$j")).max)
    }.sortBy { case (id, key) => (-key, id) }.take(10).map(_._1).toSet
    val got = Sampling.weightedSampleK(
      rows.toDF("id", "w"), "id", "w", k = 10)
      .select("id").as[Long].collect().toSet
    assert(got == expected, s"got $got expected $expected")
    // stable under repartitioning, k > n keeps everything
    val again = Sampling.weightedSampleK(
      rows.toDF("id", "w").repartition(7), "id", "w", k = 10)
      .select("id").as[Long].collect().toSet
    assert(again == got)
    assert(Sampling.weightedSampleK(rows.toDF("id", "w"), "id", "w", 999)
      .count() == 50)
  }

  test("weightedSampleK favors heavy rows at the expected rate") {
    // one doc with weight 200 among 100 docs of weight 1: P(win) =
    // 200/299 ~ 0.67 per independent salt; over 20 salts, winning < 6
    // times has probability < 1e-4
    val df = ((1L to 100L).map(i => (i, 1L)) :+ (999L, 200L)).toDF("id", "w")
    val wins = (1 to 20).count { s =>
      Sampling.weightedSampleK(df, "id", "w", k = 1, salt = s"trial$s")
        .select("id").as[Long].head() == 999L
    }
    assert(wins >= 6, s"heavy row won only $wins/20 trials")
  }

  test("weightedSampleK rejects out-of-range weights") {
    val bad = Seq((1L, 0L)).toDF("id", "w")
    val ex = intercept[Exception] {
      Sampling.weightedSampleK(bad, "id", "w", 1).collect()
    }
    assert(ex.getMessage.contains("weightedSampleK") ||
      ex.getCause != null, ex.getMessage)
  }

  test("temperatureResample draws exactly the targets, deterministically") {
    val df = ((1 to 100).map(i => ("a", i.toLong)) ++
      (1 to 400).map(i => ("b", 1000L + i)) ++
      (1 to 900).map(i => ("c", 10000L + i))).toDF("grp", "id")
    val out = Sampling.temperatureResample(df, "grp", "id", totalTarget = 120L)
    val counts = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(counts == Map("a" -> 20L, "b" -> 40L, "c" -> 60L), counts.toString)
    // kept rows are a subset of the input, stable under repartitioning
    val a = out.select("id").as[Long].collect().toSet
    val b = Sampling.temperatureResample(df.repartition(7), "grp", "id", 120L)
      .select("id").as[Long].collect().toSet
    assert(a == b, "temperature resample changed under repartitioning")
    assert(a.subsetOf(df.select("id").as[Long].collect().toSet))
  }

  test("tokenBudgetCut keeps the maximal quality-order prefix that fits") {
    // (id, key, tokens): key 9 = 10+20 tokens, key 5 = 30+5+5, key 1 = 50
    val docs = Seq(
      (1L, 9L, 10L), (2L, 9L, 20L),
      (3L, 5L, 30L), (4L, 5L, 5L), (5L, 5L, 5L),
      (6L, 1L, 50L)
    ).toDF("doc_id", "qkey", "nt")
    def kept(budget: Long): Set[Long] =
      Sampling.tokenBudgetCut(docs, "doc_id", "qkey", "nt", budget)
        .select("doc_id").as[Long].collect().toSet
    // order: 1,2 (key 9), then 3,4,5 (key 5, by id), then 6
    // cums:  10,30,       60,65,70,             120
    assert(kept(30L) == Set(1L, 2L))          // whole key 9 exactly fits
    assert(kept(65L) == Set(1L, 2L, 3L, 4L))  // straddles key 5 mid-key
    assert(kept(9L) == Set.empty)             // first doc already overflows
    assert(kept(120L) == Set(1L, 2L, 3L, 4L, 5L, 6L)) // everything fits
  }

  test("tokenBudgetCut fails fast on null keys instead of dropping rows") {
    val bad = Seq(
      (1L, Option(5L), Option(10L)),
      (2L, Option.empty[Long], Option(10L))
    ).toDF("doc_id", "qkey", "nt")
    val ex = intercept[Exception] {
      Sampling.tokenBudgetCut(bad, "doc_id", "qkey", "nt", 100L).collect()
    }
    assert(ex.getMessage.contains("tokenBudgetCut") ||
      Option(ex.getCause).exists(_.getMessage.contains("tokenBudgetCut")),
      ex.toString)
  }

  test("tokenBudgetCut equals the single-window reference; broadcast plan") {
    import org.apache.spark.sql.expressions.Window
    val docs = (1 to 500).map { i =>
      (i.toLong, (i * 37 % 11).toLong, (i * 13 % 50 + 1).toLong)
    }.toDF("doc_id", "qkey", "nt")
    val budget = 3000L
    val reference = docs
      .withColumn("cum", sum($"nt").over(
        Window.orderBy($"qkey".desc, $"doc_id")))
      .filter($"cum" <= budget).select("doc_id")
      .as[Long].collect().toSet
    val cut = Sampling.tokenBudgetCut(
      docs.repartition(7), "doc_id", "qkey", "nt", budget)
    assert(cut.select("doc_id").as[Long].collect().toSet == reference)
    val plan = cut.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("leakageSafeSplit keeps near-dup clusters within one split") {
    val docs = spark.range(0, 500).select(col("id").as("doc_id"))
    // chain 0-1-2 is one cluster; (10,11) another; the rest singletons
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Sampling.leakageSafeSplit(docs, "doc_id", pairs,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val bySplit = out.select(col("doc_id"), col("split"))
      .as[(Long, String)].collect().toMap
    assert(bySplit(0L) === bySplit(1L))
    assert(bySplit(1L) === bySplit(2L))
    assert(bySplit(10L) === bySplit(11L))
    // no cluster straddles: by construction above, but assert globally too
    val straddle = out
      .join(Seq(0L, 1L, 2L).toDF("doc_id"), Seq("doc_id"))
      .select(countDistinct(col("split"))).as[Long].head()
    assert(straddle === 1L)
  }

  test("leakageSafeSplit singletons match plain assignSplit on their own id") {
    val docs = spark.range(0, 300).select(col("id").as("doc_id"))
    val pairs = Seq((5L, 6L)).toDF("id_a", "id_b")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val leak = Sampling.leakageSafeSplit(docs, "doc_id", pairs, splits)
      .filter(!col("doc_id").isin(5L, 6L))
      .select(col("doc_id"), col("split")).as[(Long, String)].collect().toMap
    val plain = Sampling.assignSplit(
        docs.filter(!col("doc_id").isin(5L, 6L)), "doc_id", splits)
      .select(col("doc_id"), col("split")).as[(Long, String)].collect().toMap
    assert(leak === plain)
  }

  test("tokenBudgetPerGroup: per-group quotas, zero budget, absent group") {
    val docs = Seq(
      // group A: key 5 holds ids 1,2 (4+4 tokens), key 3 holds id 3 (4)
      (1L, "A", 5L, 4L), (2L, "A", 5L, 4L), (3L, "A", 3L, 4L),
      // group B: one doc, zero budget
      (4L, "B", 9L, 2L),
      // group C: not in the recipe at all
      (5L, "C", 9L, 2L)
    ).toDF("doc_id", "grp", "qkey", "nt")
    val kept = Sampling.tokenBudgetPerGroup(docs, "doc_id", "grp", "qkey",
        "nt", Seq("A" -> 10L, "B" -> 0L))
      .select("doc_id").as[Long].collect().toSet
    // A: key 5 fits whole (8 <= 10); key 3 would reach 12 > 10 -> dropped
    assert(kept == Set(1L, 2L))
  }

  test("tokenBudgetPerGroup equals tokenBudgetCut applied per group") {
    val rnd = new scala.util.Random(7)
    val docs = (1 to 400).map { i =>
      (i.toLong, s"g${i % 3}", rnd.nextInt(6).toLong, 1L + rnd.nextInt(9))
    }.toDF("doc_id", "grp", "qkey", "nt")
    val budgets = Seq("g0" -> 180L, "g1" -> 95L, "g2" -> 0L)
    val together = Sampling.tokenBudgetPerGroup(
        docs, "doc_id", "grp", "qkey", "nt", budgets)
      .select("doc_id").as[Long].collect().toSet
    val perGroup = budgets.flatMap { case (g, b) =>
      Sampling.tokenBudgetCut(
          docs.filter(col("grp") === g), "doc_id", "qkey", "nt", b)
        .select("doc_id").as[Long].collect()
    }.toSet
    assert(together == perGroup)
  }

  test("epochReplicate: whole-epoch replication with 0-based tags") {
    val d = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c"))
      .toDF("id", "grp")
    val out = Sampling.epochReplicate(d, "grp", Seq("a" -> 2, "b" -> 0))
      .select("id", "epoch").as[(Long, Int)].collect().toSeq.sorted
    // a×2 -> each doc at epochs 0 and 1; b×0 -> gone; c absent -> gone
    assert(out === Seq((1L, 0), (1L, 1), (2L, 0), (2L, 1)))
    intercept[IllegalArgumentException] {
      Sampling.epochReplicate(d, "grp", Seq("a" -> -1))
    }
  }

  test("tokenBudgetPerGroup fails fast on null group/key/tokens") {
    val bad = Seq(
      (1L, Option("A"), Option(5L), Option(10L)),
      (2L, Option.empty[String], Option(5L), Option(10L))
    ).toDF("doc_id", "grp", "qkey", "nt")
    val ex = intercept[Exception] {
      Sampling.tokenBudgetPerGroup(bad, "doc_id", "grp", "qkey", "nt",
        Seq("A" -> 100L)).collect()
    }
    assert(ex.getMessage.contains("tokenBudgetPerGroup") ||
      Option(ex.getCause).exists(_.getMessage.contains("tokenBudgetPerGroup")),
      ex.toString)
    intercept[IllegalArgumentException] {
      Sampling.tokenBudgetPerGroup(bad, "doc_id", "grp", "qkey", "nt",
        Seq("A" -> 1L, "A" -> 2L))
    }
  }
}
