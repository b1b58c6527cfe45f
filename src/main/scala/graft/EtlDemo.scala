package graft

import graft.pipeline.BatchEtl
import graft.sources.TradeGenerator
import graft.streaming.StreamingEtl

/** Runnable demo of the domain pipeline: generate trades -> CSV -> the
  * 6-stage batch ETL -> analytics queries, printed. Usage:
  *
  *   sbt "runMain graft.EtlDemo [nTrades] [outDir]"
  */
object EtlDemo {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-demo").toString)
    val spark = Tables.localSession("graft-etl-demo",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")

    // stage 0: synthesize a CSV the way the reference's generator tool does.
    // The CSV wire format is positional 9-column order WITHOUT exchange
    // (reference src/parser/CsvParser.cpp:167) — select exactly that.
    val csvDir = s"$outDir/input_csv"
    graft.sources.TradeCsv.write(TradeGenerator.generate(spark, n), csvDir)

    val t0 = System.nanoTime()
    val res = BatchEtl.run(spark, csvDir, outDir)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[demo] batch etl: ${res.validCount} valid, " +
      f"${res.rejectedByReason.values.sum} rejected, " +
      f"${res.indicatorRows} indicator rows in $secs%.2f s")
    println(s"[demo] trades -> ${res.tradesPath}")
    println(s"[demo] indicators -> ${res.indicatorsPath}")

    val trades = spark.read.parquet(res.tradesPath)
    val indicators = spark.read.parquet(res.indicatorsPath)
    BatchEtl.analytics(trades, indicators).foreach { case (name, df) =>
      println(s"[demo] --- $name ---")
      df.show(5, truncate = false)
    }

    // streaming lens over the same data: encode to JSON, decode, count
    val counts = StreamingEtl.perSymbolCounts(
      StreamingEtl.decode(StreamingEtl.encode(trades)))
    println("[demo] --- streaming-lens per-symbol counts (batch mode) ---")
    counts.orderBy(org.apache.spark.sql.functions.col("n_ticks").desc)
      .show(5, truncate = false)
    spark.stop()
  }
}
