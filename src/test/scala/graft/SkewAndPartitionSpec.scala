package graft

import graft.operators.Skew
import graft.sinks.Sinks
import org.apache.spark.sql.functions._

class SkewAndPartitionSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one hot key
  private def skewed = (1 to 10000).map { i =>
    (if (i % 10 == 0) s"k${i % 7}" else "HOT", i.toLong)
  }.toDF("k", "v")

  test("salted aggregation equals plain aggregation on skewed keys") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("c"), sum(col("v")).as("s"))
      .as[(String, Long, Long)].collect().toSet
    val salted = Skew.saltedAggregate(
      skewed, Seq("k"), 16,
      Map("c" -> count(lit(1)), "s" -> sum(col("v"))),
      Map("c" -> sum(col("c")), "s" -> sum(col("s"))))
      .as[(String, Long, Long)].collect().toSet
    assert(salted === plain)
  }

  test("salted join equals plain join on skewed keys") {
    val dims = Seq(("HOT", 1), ("k0", 2), ("k3", 3)).toDF("k", "tag")
    val plain = skewed.join(dims, Seq("k")).select("k", "v", "tag")
      .as[(String, Long, Int)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(skewed, dims, Seq("k"), 8)
      .select("k", "v", "tag")
      .as[(String, Long, Int)].collect().sorted.toSeq
    assert(salted === plain)
  }

  test("salted join rejects right/full outer joins, allows left-family") {
    val dims = Seq(("HOT", 1)).toDF("k", "tag")
    val e = intercept[IllegalArgumentException] {
      Skew.saltedJoin(skewed, dims, Seq("k"), 8, joinType = "right_outer")
    }
    assert(e.getMessage.contains("salt bucket"))
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(skewed, dims, Seq("k"), 8, joinType = "full")
    }
    // left outer keeps every left row exactly once
    val leftOut = Skew.saltedJoin(skewed, dims, Seq("k"), 8, "left_outer")
    assert(leftOut.count() === 10000)
    // semi: right multiplicity is irrelevant -> same as unsalted semi
    val semi = Skew.saltedJoin(skewed, dims, Seq("k"), 8, "left_semi")
    assert(semi.count() ===
      skewed.join(dims, Seq("k"), "left_semi").count())
  }

  test("partitioned layout prunes directories in the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val events = (1 to 1000).map(i =>
      (i.toLong, f"2026-01-${i % 4 + 1}%02d", i.toDouble))
      .toDF("id", "day", "v")
    Sinks.writePartitioned(events, dir, Seq("day"))
    val q = spark.read.parquet(dir).filter(col("day") === "2026-01-02")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    assert(q.count() === 250)
    // only one of the four day directories is read
    val files = q.select(input_file_name()).distinct().as[String].collect()
    assert(files.forall(_.contains("day=2026-01-02")))
  }

  test("backfill overwrites only the touched partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-backfill").toString
    val events = (1 to 900).map(i =>
      (i.toLong, f"2026-01-${i % 3 + 1}%02d", 1.0))
      .toDF("id", "day", "v")
    Sinks.writePartitioned(events, dir, Seq("day"))
    val day1Files = java.nio.file.Files.list(
      java.nio.file.Paths.get(dir, "day=2026-01-01")).toArray.toSet

    // the corrected day 2: half the rows, new values
    val fixed = (1 to 150).map(i => (10000L + i, "2026-01-02", 2.0))
      .toDF("id", "day", "v")
    Sinks.backfillPartitions(fixed, dir, Seq("day"))

    val back = spark.read.parquet(dir)
    // day 2 REPLACED (not appended), days 1 and 3 untouched
    assert(back.filter(col("day") === "2026-01-02").count() === 150)
    assert(back.filter(col("day") === "2026-01-02")
      .agg(min("id")).as[Long].head() === 10001L)
    assert(back.filter(col("day") =!= "2026-01-02").count() === 600)
    // untouched partitions keep their PHYSICAL files — the property that
    // makes a one-day correction O(day), not O(corpus), at 100 TB
    val day1After = java.nio.file.Files.list(
      java.nio.file.Paths.get(dir, "day=2026-01-01")).toArray.toSet
    assert(day1After === day1Files)

    // contrast: the static-mode writer would have wiped days 1 and 3
    // (pinned so a regression in EITHER mode's semantics fails loudly)
    val dir2 = java.nio.file.Files.createTempDirectory("graft-static").toString
    Sinks.writePartitioned(events, dir2, Seq("day"))
    Sinks.writePartitioned(fixed, dir2, Seq("day"))
    assert(spark.read.parquet(dir2).count() === 150)
  }

  test("deleteRows touches only affected partitions; emptied partitions vanish") {
    val dir = java.nio.file.Files.createTempDirectory("graft-del").toString
    val events = (1 to 900).map(i =>
      (i.toLong, f"2026-01-${i % 3 + 1}%02d", 1.0))
      .toDF("id", "day", "v")
    Sinks.writePartitioned(
      events.repartition(col("day")), dir, Seq("day"))
    val day1Files = java.nio.file.Files.list(
      java.nio.file.Paths.get(dir, "day=2026-01-01")).toArray.toSet
    // doom: every row of day 2 (ids ≡ 1 mod 3) + a slice of day 3
    // (ids ≡ 2 mod 3, id <= 30) + keys absent from the corpus
    val doomed = events.filter(
        col("day") === "2026-01-02" ||
          (col("day") === "2026-01-03" && col("id") <= 30))
      .select(col("id"))
      .unionByName(Seq(99999L, 88888L).toDF("id"))
    val n = Sinks.deleteRows(spark, dir, "day", "id", doomed)
    assert(n === 300 + 10, s"deleted $n") // day2 full (300) + 10 of day3
    val back = spark.read.parquet(dir)
    // the fully-doomed partition is GONE (dynamic overwrite alone would
    // have left its files — and the deleted rows — alive)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "day=2026-01-02")))
    assert(back.filter(col("day") === "2026-01-02").count() === 0)
    // the partially-doomed partition rewrote to its survivors
    assert(back.filter(col("day") === "2026-01-03").count() === 290)
    // the untouched partition keeps its PHYSICAL files
    val day1After = java.nio.file.Files.list(
      java.nio.file.Paths.get(dir, "day=2026-01-01")).toArray.toSet
    assert(day1After === day1Files)
    assert(back.count() === 590)
    // an all-absent key list is a no-op returning 0
    assert(Sinks.deleteRows(
      spark, dir, "day", "id", Seq(77777L).toDF("id")) === 0L)
    assert(spark.read.parquet(dir).count() === 590)
  }

  test("deleteRows resolves escaped and null partition directories") {
    val dir = java.nio.file.Files.createTempDirectory("graft-del-esc").toString
    // partition values Spark must ESCAPE on disk (space, colon, percent)
    // plus a null (the __HIVE_DEFAULT_PARTITION__ directory): the old
    // raw-interpolated path missed every one of these, silently leaving
    // doomed rows alive
    val events = (1 to 400).map { i =>
      val cat = (i % 4) match {
        case 0 => "a b"
        case 1 => "x:y"
        case 2 => "p%q"
        case _ => null
      }
      (i.toLong, cat, 1.0)
    }.toDF("id", "cat", "v")
    Sinks.writePartitioned(events.repartition(col("cat")), dir, Seq("cat"))
    // sanity: the null partition really is the hive default directory
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "cat=__HIVE_DEFAULT_PARTITION__")))
    // doom ALL of "a b" and the null partition (both must vanish), half
    // of "x:y" (must rewrite survivors), none of "p%q" (untouched)
    val doomed = events.filter(
        col("cat") === "a b" || col("cat").isNull ||
          (col("cat") === "x:y" && col("id") <= 200))
      .select(col("id"))
    val pqFiles = java.nio.file.Files.list(
      java.nio.file.Paths.get(dir, "cat=p%25q")).toArray.toSet
    val n = Sinks.deleteRows(spark, dir, "cat", "id", doomed)
    assert(n === 100 + 100 + 50, s"deleted $n")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "cat=a%20b")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "cat=__HIVE_DEFAULT_PARTITION__")))
    val back = spark.read.parquet(dir)
    assert(back.count() === 150)
    assert(back.filter(col("cat") === "x:y").count() === 50)
    assert(back.filter(col("cat").isNull).count() === 0)
    // the untouched escaped partition keeps its physical files
    assert(java.nio.file.Files.list(
      java.nio.file.Paths.get(dir, "cat=p%25q")).toArray.toSet === pqFiles)
  }

  test("clustered layout yields disjoint per-file key ranges and bounded files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-clust").toString
    val rng = new scala.util.Random(3)
    val rows = (1 to 20000).map(_ => (rng.nextLong(1000000L), rng.nextDouble()))
      .toDF("ts", "v")
    Sinks.writeClustered(rows, dir, Seq("ts"),
      targetRecordsPerFile = 2500L, nRanges = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() === 20000)
    // per-file min/max ranges of the cluster key must be pairwise disjoint
    // (range partitioning across files, sorted sequential splits within) —
    // the property parquet footer stats need for file-level skipping
    val ranges = back.groupBy(input_file_name().as("f"))
      .agg(min("ts").as("lo"), max("ts").as("hi"), count(lit(1)).as("n"))
      .as[(String, Long, Long, Long)].collect()
    // maxRecordsPerFile honored
    assert(ranges.forall(_._4 <= 2500), ranges.map(_._4).mkString(","))
    assert(ranges.length >= 8, s"expected >= 8 files, got ${ranges.length}")
    val sorted = ranges.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._2,
        s"overlapping file ranges: ${a._1} [${a._2},${a._3}] vs ${b._1} [${b._2},${b._3}]")
      case _ =>
    }
  }

  test("zValue matches a reference bit-interleave; rejects out-of-range input") {
    def ref(x: Long, y: Long): Long =
      (0 until 31).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    val rng = new scala.util.Random(17)
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), ((1L << 31) - 1, (1L << 31) - 1)) ++
      (1 to 200).map(_ => (rng.nextLong(1L << 31), rng.nextLong(1L << 31)))
    val got = pts.toDF("x", "y")
      .select($"x", $"y", graft.functions.ZOrder.zValue($"x", $"y").as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == ref(x, y), s"zValue($x, $y) = $z != ${ref(x, y)}")
      assert(z >= 0, s"zValue($x, $y) went negative")
    }
    val ex = intercept[Exception] {
      Seq((-1L, 0L)).toDF("x", "y")
        .select(graft.functions.ZOrder.zValue($"x", $"y")).collect()
    }
    assert(ex.getMessage.contains("zValue") || ex.getCause != null)
  }

  test("z-ordered layout is tight in BOTH dimensions where lexicographic is not") {
    // 128x128 grid: a lexicographic sort on x leaves each file spanning
    // the FULL y range; the z-order layout bounds both spans per file
    val grid = for { x <- 0 until 128; y <- 0 until 128 }
      yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    def fileSpans(dir: String): Array[(Long, Long)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
        .select("xs", "ys").as[(Long, Long)].collect()
    val zDir = java.nio.file.Files.createTempDirectory("graft-z").toString
    Sinks.writeZOrdered(df, zDir, "x", "y",
      targetRecordsPerFile = 1024L, nRanges = 16)
    val lexDir = java.nio.file.Files.createTempDirectory("graft-lex").toString
    Sinks.writeClustered(df, lexDir, Seq("x", "y"),
      targetRecordsPerFile = 1024L, nRanges = 16)
    val zSpans = fileSpans(zDir)
    val lexSpans = fileSpans(lexDir)
    assert(zSpans.length >= 16)
    // z-order: every file's span is a bounded rectangle in both dims
    // (a 1024-point z-range covers at most a ~32x32-aligned region plus
    // curve spill; 63 is the aligned bound, double it for split slack)
    zSpans.foreach { case (xs, ys) =>
      assert(xs <= 127 && ys <= 127, s"z file spans full grid: ($xs, $ys)")
      assert(xs <= 63 || ys <= 63, s"z file loose in both dims: ($xs, $ys)")
    }
    // lexicographic: files are x-slabs spanning (nearly) the full y range
    assert(lexSpans.count(_._2 >= 120) >= lexSpans.length / 2,
      s"expected full-height y slabs, got ${lexSpans.toSeq}")
    val avgZy = zSpans.map(_._2).sum.toDouble / zSpans.length
    val avgLexY = lexSpans.map(_._2).sum.toDouble / lexSpans.length
    assert(avgZy < avgLexY / 2,
      s"z-order y-span $avgZy not tighter than lexicographic $avgLexY")
  }
}
