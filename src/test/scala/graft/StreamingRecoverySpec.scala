package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import graft.operators.{TradeRules, Validation}
import graft.streaming.StreamingEtl
import org.apache.spark.sql.functions._

/** Exactly-once delivery demonstrated, not just documented (SURVEY.md §2.7):
  * a checkpointed stream is stopped mid-stream and restarted, and the output
  * shows no duplicates and no gaps. Two mechanisms under test:
  *
  *   - source replay + file-sink commit log: the parquet sink's
  *     _spark_metadata transaction log admits only committed files, and the
  *     checkpoint's source offsets stop the restarted query from
  *     reprocessing inputs the first run already committed;
  *   - keyed-state recovery: flatMapGroupsWithState state is rebuilt from
  *     the state store checkpoint, so indicators converge to the same value
  *     as an unbroken run (and as the batch aggregator).
  *
  * The reference has no recovery story at all — a dropped WebSocket tick is
  * gone (at-most-once, reference src/feed/TickClient.hpp:224-231); this is
  * the upgrade Structured Streaming buys.
  */
class StreamingRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def tick(id: Long, symbol: String, price: Double, volume: Int,
      ts: Long = 1700000000000000000L): String =
    s"""{"trade_id":$id,"order_id":$id,"timestamp":${ts + id},""" +
      s""""price":$price,"volume":$volume,"symbol":"$symbol",""" +
      s""""exchange":"WSS","side":"B","type":"M","is_pro":false}"""

  /** Atomic drop into the watched directory so the file source never lists
    * a half-written file.
    */
  private def drop(dir: Path, name: String, lines: Seq[String]): Unit = {
    val tmp = dir.getParent.resolve(name + ".tmp")
    Files.writeString(tmp, lines.mkString("\n"))
    Files.move(tmp, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
  }

  test("restart from checkpoint: no duplicates, no gaps in the parquet sink") {
    val root = Files.createTempDirectory("graft-eo")
    val in = Files.createDirectories(root.resolve("in"))
    val out = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString

    def startQuery() = {
      val valid = StreamingEtl.decode(spark.readStream.text(in.toString))
        .withColumn("reason", Validation.reasonColumn(TradeRules.rules))
        .filter(col("reason").isNull).drop("reason")
      valid.writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .start()
    }

    // wave 1: 20 valid ticks + 1 invalid (price rule) that must be filtered
    drop(in, "wave1.json",
      (1 to 20).map(i => tick(i, "TCS", 100.0 + i, 10)) :+
        tick(999, "TCS", -5.0, 10))
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop() // mid-stream shutdown
    assert(spark.read.parquet(out).count() === 20)

    // wave 2 lands while the query is DOWN; restart from the checkpoint
    drop(in, "wave2.json", (21 to 35).map(i => tick(i, "TCS", 100.0 + i, 10)))
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val ids = spark.read.parquet(out)
      .select("trade_id").as[Long].collect().sorted
    // exactly once: wave1 not reprocessed (no dupes), wave2 complete (no gaps)
    assert(ids.toSeq === (1L to 35L))
    // the mechanism: the sink's transaction log only exposes committed files
    assert(Files.exists(Paths.get(out, "_spark_metadata")))
  }

  test("keyed indicator state survives restart and converges to batch result") {
    val root = Files.createTempDirectory("graft-eo-state")
    val in = Files.createDirectories(root.resolve("in"))
    val ckpt = root.resolve("ckpt").toString
    val got = scala.collection.mutable.ArrayBuffer
      .empty[graft.operators.IndicatorAggregator.KeyedOut]

    def startQuery() =
      StreamingEtl.statefulIndicators(
          StreamingEtl.decode(spark.readStream.text(in.toString)), period = 5)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (ds: org.apache.spark.sql.Dataset[
             graft.operators.IndicatorAggregator.KeyedOut], _: Long) =>
            got.synchronized { got ++= ds.collect() }
            ()
        }
        .start()

    // worked example (prices 100,102,101,103,105) split across a restart
    drop(in, "b1.json", Seq(tick(1, "TCS", 100.0, 1), tick(2, "TCS", 102.0, 1)))
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    assert(got.synchronized(got.exists(_.n_rows == 2)))

    drop(in, "b2.json", Seq(
      tick(3, "TCS", 101.0, 1), tick(4, "TCS", 103.0, 1),
      tick(5, "TCS", 105.0, 1)))
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    // n_rows = 5 is only reachable if the 2-row state was recovered
    val last = got.synchronized(got.find(_.n_rows == 5)).get
    assert(math.abs(last.sma - 102.2) < 1e-9)
    assert(math.abs(last.rsi - (100.0 - 100.0 / 7.0)) < 1e-9)
  }

  test("session interval state survives restart; late bridge still merges") {
    val root = Files.createTempDirectory("graft-eo-sessions")
    val in = Files.createDirectories(root.resolve("in"))
    val ckpt = root.resolve("ckpt").toString
    val got = scala.collection.mutable.ArrayBuffer
      .empty[graft.operators.Sessionize.SessionSnapshot]

    def startQuery() =
      StreamingEtl.statefulSessions(
          spark.readStream
            .schema("user_id LONG, ts LONG")
            .json(in.toString),
          gap = 100L)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (ds: org.apache.spark.sql.Dataset[
             graft.operators.Sessionize.SessionSnapshot], _: Long) =>
            got.synchronized { got ++= ds.collect() }
            ()
        }
        .start()

    def ev(user: Long, ts: Long) = s"""{"user_id":$user,"ts":$ts}"""

    // before restart: two sessions — {0,50} and {220,300}
    drop(in, "s1.json", Seq(ev(1, 0), ev(1, 50), ev(1, 220), ev(1, 300)))
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    assert(got.synchronized(
      got.exists(s => s.n_events == 4 && s.n_sessions == 2)))

    // after restart: the late bridge at 130 must merge the RECOVERED
    // intervals into one session — only possible if the full interval
    // vector (not just a counter) came back from the state store
    drop(in, "s2.json", Seq(ev(1, 130)))
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val last = got.synchronized(got.find(_.n_events == 5)).get
    assert(last.n_sessions == 1L, last.toString)
  }

  // ---- two-source join gates (q117/q118 machinery) across a restart ----

  private val baseNs = 1700000000000000000L
  private def sec(s: Long): Long = baseNs + s * 1000000000L
  private def row(idCol: String, tsCol: String)(id: Long, tsNs: Long): String =
    s"""{"$idCol":$id,"$tsCol":$tsNs}"""

  /** Two json file sources (one batch per file via maxFilesPerTrigger=1)
    * through streamIntervalJoin into a fault-tolerant parquet sink.
    * Mirrors the q117/q118 replay shape minus the memory sink — the
    * memory sink cannot survive a restart; the parquet sink's
    * _spark_metadata log is the exactly-once mechanism under test.
    */
  private def startJoin(lin: Path, rin: Path, ckpt: String, out: String,
      joinType: String, watermarkDelay: String) = {
    val l = spark.readStream.schema("p_id LONG, p_ts LONG")
      .option("maxFilesPerTrigger", 1).json(lin.toString)
      .select(col("p_id"), StreamingEtl.toEventTime(col("p_ts")).as("p_et"))
    val r = spark.readStream.schema("c_id LONG, c_ts LONG")
      .option("maxFilesPerTrigger", 1).json(rin.toString)
      .select(col("c_id"), StreamingEtl.toEventTime(col("c_ts")).as("c_et"))
    StreamingEtl.streamIntervalJoin(l, "p_et", r, "c_et",
        lowerMicros = 0L, upperMicros = 1000000L,
        watermarkDelay = watermarkDelay, joinType = joinType)
      .select(col("p_id"), col("c_id"))
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt)
      .option("path", out)
      .start()
  }

  test("stream-stream join state survives restart: match across the outage") {
    val root = Files.createTempDirectory("graft-eo-join")
    val lin = Files.createDirectories(root.resolve("lin"))
    val rin = Files.createDirectories(root.resolve("rin"))
    val out = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString

    // wave 1: both purchases and only p2's click arrive, then the query dies
    drop(lin, "a1.json", Seq(row("p_id", "p_ts")(1, sec(0)),
      row("p_id", "p_ts")(2, sec(10))))
    drop(rin, "a1.json", Seq(row("c_id", "c_ts")(20, sec(10))))
    val q1 = startJoin(lin, rin, ckpt, out, "inner", "90 days")
    q1.processAllAvailable()
    q1.stop()

    // p1's click lands while the query is DOWN; the (1, 10) pair can only
    // emit if p1's row came back from the join state store checkpoint
    drop(rin, "a2.json", Seq(row("c_id", "c_ts")(10, sec(0))))
    val q2 = startJoin(lin, rin, ckpt, out, "inner", "90 days")
    q2.processAllAvailable()
    q2.stop()

    val pairs = spark.read.parquet(out)
      .select("p_id", "c_id").as[(Long, Long)].collect().sorted
    // exactly once: the pre-outage (2,20) match is not re-emitted
    assert(pairs.toSeq === Seq((1L, 10L), (2L, 20L)))
  }

  test("outer-join eviction state survives restart: null emitted after outage") {
    val root = Files.createTempDirectory("graft-eo-outer")
    val lin = Files.createDirectories(root.resolve("lin"))
    val rin = Files.createDirectories(root.resolve("rin"))
    val out = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString

    // wave 1: p1 has NO click ever, p2 matches c20; watermark (10 s delay)
    // stays below p1's window end, so p1 sits unmatched in the state store
    // when the query dies
    drop(lin, "a1.json", Seq(row("p_id", "p_ts")(1, sec(0)),
      row("p_id", "p_ts")(2, sec(10))))
    drop(rin, "a1.json", Seq(row("c_id", "c_ts")(20, sec(10))))
    val q1 = startJoin(lin, rin, ckpt, out, "left_outer", "10 seconds")
    q1.processAllAvailable()
    q1.stop()
    val before = spark.read.parquet(out)
      .filter(col("p_id") === 1 && col("c_id").isNull).count()
    assert(before === 0, "p1 must not emit a null row before eviction")

    // wave 2 after restart: far-future sentinels advance the watermark past
    // p1's window on BOTH sides, then two empty spacer batches let the
    // eviction (which lags the watermark by one batch, SPARK-24699) fire.
    // The null-padded p1 row can only emit if the unmatched-row state AND
    // the watermark came back from the checkpoint.
    drop(lin, "a2.json", Seq(row("p_id", "p_ts")(-1, sec(10000))))
    drop(rin, "a2.json", Seq(row("c_id", "c_ts")(-1, sec(10000))))
    drop(lin, "a3.json", Seq.empty); drop(rin, "a3.json", Seq.empty)
    drop(lin, "a4.json", Seq.empty); drop(rin, "a4.json", Seq.empty)
    val q2 = startJoin(lin, rin, ckpt, out, "left_outer", "10 seconds")
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.parquet(out).filter(col("p_id") >= 0)
    // per-purchase aggregate (count ignores the bucket-copy null rows the
    // same way the q118 gate does): p1 -> no clicks, p2 -> exactly c20
    val agg = rows.groupBy("p_id")
      .agg(count(col("c_id")).as("n"),
        coalesce(min(col("c_id")), lit(-1L)).as("min_c"))
      .as[(Long, Long, Long)].collect().sorted
    assert(agg.toSeq === Seq((1L, 0L, -1L), (2L, 1L, 20L)))
    // and the eviction-driven null row for p1 exists in the raw sink output
    assert(rows.filter(col("p_id") === 1 && col("c_id").isNull).count() >= 1)
  }

  test("full-outer join recovery: BOTH eviction arms fire after the outage") {
    val root = Files.createTempDirectory("graft-eo-fouter")
    val lin = Files.createDirectories(root.resolve("lin"))
    val rin = Files.createDirectories(root.resolve("rin"))
    val out = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString

    // wave 1: p1 never matches anything; c30 (sec 50) is a click no
    // purchase precedes; p2 <-> c20 match. The GLOBAL watermark is the
    // min across sources (left max = 10 s -> 0 after delay), so neither
    // unmatched row can evict before the query dies — both sit in the
    // recovered state store.
    drop(lin, "a1.json", Seq(row("p_id", "p_ts")(1, sec(0)),
      row("p_id", "p_ts")(2, sec(10))))
    drop(rin, "a1.json", Seq(row("c_id", "c_ts")(20, sec(10)),
      row("c_id", "c_ts")(30, sec(50))))
    val q1 = startJoin(lin, rin, ckpt, out, "full_outer", "10 seconds")
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(out).filter(col("p_id").isNull).count() === 0,
      "no right-null row may emit before eviction")

    // restart: sentinels advance the watermark past every real window,
    // spacers let the lagging eviction fire (SPARK-24699)
    drop(lin, "a2.json", Seq(row("p_id", "p_ts")(-1, sec(10000))))
    drop(rin, "a2.json", Seq(row("c_id", "c_ts")(-1, sec(10000))))
    drop(lin, "a3.json", Seq.empty); drop(rin, "a3.json", Seq.empty)
    drop(lin, "a4.json", Seq.empty); drop(rin, "a4.json", Seq.empty)
    val q2 = startJoin(lin, rin, ckpt, out, "full_outer", "10 seconds")
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.parquet(out)
    // left arm: p1's eviction-driven no-match row (bucket-copy nulls
    // collapsed by the grouping, the q118/q148 consumer rule)
    val agg = rows.filter(col("p_id") >= 0).groupBy("p_id")
      .agg(count(col("c_id")).as("n"),
        coalesce(min(col("c_id")), lit(-1L)).as("min_c"))
      .as[(Long, Long, Long)].collect().sorted
    assert(agg.toSeq === Seq((1L, 0L, -1L), (2L, 1L, 20L)))
    // right arm: c30's null-left row, EXACT without grouping — right
    // rows are never bucket-exploded; it can only exist if the
    // unmatched-right state survived the restart
    assert(rows.filter(col("p_id").isNull && col("c_id") === 30).count() === 1)
  }

  test("outer-join eviction restart under RocksDB: recovery on the production backend") {
    // The two claims composed: checkpoint recovery (above) AND provider
    // parity (RocksDbStateSpec) could each hold while their COMBINATION
    // breaks — RocksDB snapshots/restores its own files on restart, a
    // different code path from the HDFS-backed provider's delta replay.
    // Same scenario as the previous test, entirely under RocksDB.
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = Files.createTempDirectory("graft-eo-rocks")
      val lin = Files.createDirectories(root.resolve("lin"))
      val rin = Files.createDirectories(root.resolve("rin"))
      val out = root.resolve("out").toString
      val ckpt = root.resolve("ckpt").toString

      drop(lin, "a1.json", Seq(row("p_id", "p_ts")(1, sec(0)),
        row("p_id", "p_ts")(2, sec(10))))
      drop(rin, "a1.json", Seq(row("c_id", "c_ts")(20, sec(10))))
      val q1 = startJoin(lin, rin, ckpt, out, "left_outer", "10 seconds")
      q1.processAllAvailable()
      q1.stop()

      drop(lin, "a2.json", Seq(row("p_id", "p_ts")(-1, sec(10000))))
      drop(rin, "a2.json", Seq(row("c_id", "c_ts")(-1, sec(10000))))
      drop(lin, "a3.json", Seq.empty); drop(rin, "a3.json", Seq.empty)
      drop(lin, "a4.json", Seq.empty); drop(rin, "a4.json", Seq.empty)
      val q2 = startJoin(lin, rin, ckpt, out, "left_outer", "10 seconds")
      q2.processAllAvailable()
      q2.stop()

      val agg = spark.read.parquet(out).filter(col("p_id") >= 0)
        .groupBy("p_id")
        .agg(count(col("c_id")).as("n"),
          coalesce(min(col("c_id")), lit(-1L)).as("min_c"))
        .as[(Long, Long, Long)].collect().sorted
      assert(agg.toSeq === Seq((1L, 0L, -1L), (2L, 1L, 20L)))
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }
}
