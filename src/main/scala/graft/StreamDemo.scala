package graft

import graft.streaming.StreamingEtl
import org.apache.spark.sql.streaming.Trigger

/** Runnable streaming demo — the reference's websocket_demo re-expressed
  * (reference src/tools/websocket_demo.cpp:130-220): synthetic tick feed ->
  * sanity filter -> per-symbol counts + windowed OHLC, run for a few
  * seconds, final stats printed. Usage:
  *
  *   sbt "runMain graft.StreamDemo [seconds] [ticksPerSec]"
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(5)
    val rate = args.lift(1).map(_.toInt).getOrElse(5000)
    val spark = Tables.localSession("graft-stream-demo", 8)
    spark.sparkContext.setLogLevel("WARN")

    val ticks = StreamingEtl.rateSource(spark, rate)
    val valid = StreamingEtl.sanityFilter(ticks)

    val counts = StreamingEtl.perSymbolCounts(valid)
      .writeStream.format("memory").queryName("counts")
      .outputMode("complete")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    val ohlc = StreamingEtl.windowedStats(valid, "10 seconds", "5 seconds")
      .writeStream.format("memory").queryName("ohlc")
      .outputMode("complete")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    val indicators = StreamingEtl.statefulIndicators(valid, period = 14)
      .writeStream.format("memory").queryName("live_ind")
      .outputMode("update")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()

    // plain stop after the run window — processAllAvailable would chase a
    // live unbounded source across three queries
    Thread.sleep(seconds * 1000L)
    counts.stop(); ohlc.stop(); indicators.stop()

    println(s"[stream-demo] ran ${seconds}s at ~$rate ticks/s")
    println("[stream-demo] --- per-symbol counts ---")
    spark.table("counts")
      .orderBy(org.apache.spark.sql.functions.col("n_ticks").desc)
      .show(12, truncate = false)
    println("[stream-demo] --- windowed OHLC/VWAP ---")
    spark.table("ohlc").orderBy("window", "symbol").show(12, truncate = false)
    println("[stream-demo] --- live indicators (custom keyed state) ---")
    spark.table("live_ind")
      .groupBy("symbol").agg(
        org.apache.spark.sql.functions.last("sma").as("sma"),
        org.apache.spark.sql.functions.last("rsi").as("rsi"),
        org.apache.spark.sql.functions.last("vwap").as("vwap"),
        org.apache.spark.sql.functions.max("n_rows").as("n_rows"))
      .orderBy("symbol").show(12, truncate = false)
    val total = spark.table("counts")
      .agg(org.apache.spark.sql.functions.sum("n_ticks")).head().getLong(0)
    println(s"[stream-demo] total ticks processed: $total")
    spark.stop()
  }
}
