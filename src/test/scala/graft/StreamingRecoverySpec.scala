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
}
