package graft

import graft.model.Trade
import graft.operators.{TradeRules, Validation}
import graft.sources.TradeCsv
import org.apache.spark.sql.DataFrame

/** The 6 ordered validation rules with first-failure reasons
  * (reference src/validator/TradeValidator.hpp:98-182) and the golden
  * 10-valid/3-malformed fixture (reference sample_data.csv / README.md:176).
  */
class ValidationSpec extends SparkSpec {
  import spark.implicits._

  private def trade(
      id: Long = 1, symbol: String = "ABC", price: Double = 100.0,
      volume: Int = 10, side: String = "B", typ: String = "M",
      ts: Long = 1L): Trade =
    Trade(id, id, ts, price, volume, symbol, "", side, typ, is_pro = false)

  private def reasons(ts: Trade*): Map[Long, String] =
    Validation.withReason(ts.toDF(), TradeRules.rules)
      .select("trade_id", "reason").as[(Long, Option[String])]
      .collect().toMap.collect { case (k, Some(v)) => k -> v }

  test("each rule fires with its own reason") {
    val m = reasons(
      trade(1, symbol = "lower"),
      trade(2, symbol = "TOOLONGSYMBOL"),
      trade(3, price = 0.0),
      trade(4, price = 1000000.0), // exclusive upper bound
      trade(5, volume = 0),
      trade(6, side = "X"),
      trade(7, typ = "Z"),
      trade(8, ts = 0L),
      trade(9)) // valid
    assert(m === Map(
      1L -> "invalid_symbol", 2L -> "invalid_symbol",
      3L -> "invalid_price", 4L -> "invalid_price",
      5L -> "invalid_volume", 6L -> "invalid_side",
      7L -> "invalid_type", 8L -> "invalid_timestamp"))
  }

  test("first failing rule wins (declaration order)") {
    // violates symbol AND price AND volume -> symbol reason
    val m = reasons(trade(1, symbol = "bad", price = -1, volume = 0))
    assert(m(1L) === "invalid_symbol")
    // violates price AND side -> price reason
    val m2 = reasons(trade(2, price = -1, side = "Q"))
    assert(m2(2L) === "invalid_price")
  }

  test("rlike is anchored: substring uppercase does not pass") {
    val m = reasons(trade(1, symbol = "AB1"), trade(2, symbol = " ABC"))
    assert(m.keySet === Set(1L, 2L))
  }

  test("golden fixture: 10 valid, 3 rejected with exact reasons") {
    val path = getClass.getResource("/sample_trades.csv").getPath
    val split = Validation.split(TradeCsv.read(spark, path), TradeRules.rules)
    assert(split.valid.count() === 10)
    val rej = split.rejected.select("trade_id", "reason")
      .as[(Long, String)].collect().toMap
    assert(rej === Map(
      1000011L -> "invalid_symbol",
      1000012L -> "invalid_price",
      1000013L -> "invalid_volume"))
  }

  test("silent-default parse: malformed numerics become zero then rejected") {
    // Parser-never-fails contract (reference CsvParser.cpp:171 +
    // TradeValidator.hpp:138-141): garbage numeric -> null -> 0 -> validator.
    val csv = Seq(
      "trade_id,order_id,timestamp,symbol,price,volume,side,type,is_pro",
      "1,1,100,ABC,garbage,10,B,M,false", // price -> 0.0 -> invalid_price
      "2,2,100,ABC,5.0,NaNv,B,M,false", // volume -> 0 -> invalid_volume
      "3,3,100,ABC,5.0,10,,,false" // empty side/type -> N/M defaults -> valid
    ).mkString("\n")
    val dir = java.nio.file.Files.createTempDirectory("graft-csv")
    val f = dir.resolve("t.csv")
    java.nio.file.Files.writeString(f, csv)
    val parsed = TradeCsv.read(spark, f.toString)
    val m = Validation.withReason(parsed, TradeRules.rules)
      .select("trade_id", "reason").as[(Long, Option[String])]
      .collect().toMap
    assert(m(1L) === Some("invalid_price"))
    assert(m(2L) === Some("invalid_volume"))
    assert(m(3L) === None)
    val defaults = parsed.filter($"trade_id" === 3)
      .select("side", "type").as[(String, String)].head()
    assert(defaults === ("N", "M"))
  }

  test("is_pro wire format: reads reference 0/1 and legacy true/false, writes 0/1") {
    // The reference writes is_pro as 0/1 (reference DataGenerator.hpp:207)
    // and parses it with an integer from_chars; Spark's boolean CSV parser
    // only accepts true/false. Both spellings must parse, and our writer
    // must emit the reference's 0/1 so its tooling round-trips the flag.
    val csv = Seq(
      "trade_id,order_id,timestamp,symbol,price,volume,side,type,is_pro",
      "1,1,100,ABC,5.0,10,B,M,1",
      "2,2,100,ABC,5.0,10,B,M,0",
      "3,3,100,ABC,5.0,10,B,M,true",
      "4,4,100,ABC,5.0,10,B,M,false",
      "5,5,100,ABC,5.0,10,B,M,garbage",
      "6,6,100,ABC,5.0,10,B,M,"
    ).mkString("\n")
    val dir = java.nio.file.Files.createTempDirectory("graft-ispro")
    java.nio.file.Files.writeString(dir.resolve("t.csv"), csv)
    val parsed = TradeCsv.read(spark, dir.toString)
    val flags = parsed.select("trade_id", "is_pro")
      .as[(Long, Boolean)].collect().toMap
    assert(flags === Map(1L -> true, 2L -> false, 3L -> true,
      4L -> false, 5L -> false, 6L -> false))

    // writer emits 0/1 tokens and the round trip preserves every flag
    val outDir = dir.resolve("out").toString
    TradeCsv.write(parsed, outDir)
    val rawTokens = spark.read.option("header", "true").csv(outDir)
      .select("is_pro").as[String].collect().toSet
    assert(rawTokens === Set("0", "1"))
    val back = TradeCsv.read(spark, outDir)
      .select("trade_id", "is_pro").as[(Long, Boolean)].collect().toMap
    assert(back === flags)
  }

  test("observed metrics piggyback on the action without an extra pass") {
    val df = Seq(trade(1), trade(2), trade(3, price = -1)).toDF()
    val obs = Validation.observed(df, TradeRules.rules)
    obs.collect()
    val metrics = obs.queryExecution.observedMetrics("validation")
    assert(metrics.getAs[Long]("n_total") === 3L)
    assert(metrics.getAs[Long]("n_valid") === 2L)
    assert(metrics.getAs[Long]("n_rejected") === 1L)
  }

  test("report aggregates per-reason counts plus valid bucket") {
    val df: DataFrame = Seq(
      trade(1), trade(2), trade(3, price = -1), trade(4, volume = 0),
      trade(5, volume = 0)).toDF()
    val rep = Validation.report(df, TradeRules.rules)
      .as[(String, Long)].collect().toMap
    assert(rep === Map(
      "valid" -> 2L, "invalid_price" -> 1L, "invalid_volume" -> 2L))
  }
}
