package graft

import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("custom expressions callable from SQL after registration") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
           minhash_sig(array('a','b','c'), 16) AS sig,
           simhash64(array('a','b','c')) AS fp,
           word_shingles(array('a','b','c'), 2) AS sh""")
      .as[(Seq[Long], Long, Seq[String])].head()
    assert(row._1.length === 16)
    assert(row._3 === Seq("a b", "b c"))
    // SQL path and Column path agree
    val viaCol = Seq("a b c").toDF("text")
      .select(graft.operators.Dedup.simhash64(col("text"))).as[Long].head()
    assert(row._2 === viaCol)
  }

  test("sql cosine_sim matches column-api cosine") {
    GraftExtensions.register(spark)
    val sql = spark.sql(
      "SELECT cosine_sim(array(1.0d, 2.0d), array(2.0d, 1.0d)) AS s")
      .as[Double].head()
    val viaCol = Seq((Seq(1.0, 2.0), Seq(2.0, 1.0))).toDF("a", "b")
      .select(graft.operators.Similarity.cosine(col("a"), col("b")))
      .as[Double].head()
    assert(sql === viaCol)
    assert(math.abs(sql - 0.8) < 1e-12) // 4 / (sqrt(5)*sqrt(5))
  }

  test("sql minhash matches column-api minhash") {
    GraftExtensions.register(spark)
    val sql = spark.sql("SELECT minhash_sig(array('x','y'), 8) AS s")
      .as[Seq[Long]].head()
    val col_ = Seq(Seq("x", "y")).toDF("t")
      .select(graft.functions.HashExprs.minhashSig(col("t"), 8)).as[Seq[Long]].head()
    assert(sql === col_)
  }

  test("rate source produces valid decodable trades") {
    val df = graft.streaming.StreamingEtl.rateSource(spark, 100)
    assert(df.isStreaming)
    assert(df.schema.fieldNames.toSeq === graft.model.Trade.schema.fieldNames.toSeq)
    val q = df.writeStream.format("memory").queryName("rate_ticks")
      .trigger(org.apache.spark.sql.streaming.Trigger.Once()).start()
    q.awaitTermination(30000)
    val rows = spark.table("rate_ticks")
    val split = graft.operators.Validation.split(
      rows, graft.operators.TradeRules.rules)
    assert(split.rejected.count() === 0)
  }

  test("sql indicator_summary aggregate matches the operator API") {
    GraftExtensions.register(spark)
    val trades = graft.sources.TradeGenerator.generate(spark, 5000)
    trades.createOrReplaceTempView("ext_trades")
    val viaSql = spark.sql(
      """SELECT symbol, out.sma, out.rsi, out.vwap, out.period, out.n_rows
         FROM (SELECT symbol,
                 indicator_summary(CAST(timestamp AS LONG),
                   CAST(trade_id AS LONG), CAST(price AS DOUBLE),
                   CAST(volume AS DOUBLE), 14) AS out
               FROM ext_trades GROUP BY symbol)""")
      .as[(String, Double, Double, Double, Int, Long)].collect()
      .map(r => r._1 -> r).toMap
    val viaApi = graft.operators.IndicatorAggregator.summary(
      trades, "symbol", "price", Some("volume"), "timestamp", "trade_id", 14)
      .select("symbol", "sma", "rsi", "vwap", "period", "n_rows")
      .as[(String, Double, Double, Double, Int, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(viaSql == viaApi)
    assert(viaSql.nonEmpty)
  }

  test("sql nfc/nfkc_normalize match the column API") {
    GraftExtensions.register(spark)
    // escapes, not glyphs: composed and decomposed render identically
    val dec = "cafe\u0301"  // decomposed e + combining acute
    val comp = "caf\u00E9"  // precomposed
    val lig = "\uFB01le"    // fi-ligature, folds under NFKC only
    val got = spark.sql(
      s"SELECT nfc_normalize('$dec'), nfkc_normalize('$lig'), " +
        s"nfc_normalize('$lig')")
      .as[(String, String, String)].head()
    assert(got == ((comp, "file", lig)))
  }

  test("sql positional_gram_hashes matches the column API") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT positional_gram_hashes(array('a','b','c','d'), 2)")
      .as[Seq[Long]].head()
    val viaCol = Seq(Tuple1(Seq("a", "b", "c", "d"))).toDF("tk")
      .select(graft.functions.HashExprs.positionalGramHashes(col("tk"), 2))
      .as[Seq[Long]].head()
    assert(viaSql === viaCol && viaSql.length === 3)
  }

  test("sql ohlc_bar aggregate matches the operator API") {
    GraftExtensions.register(spark)
    val ticks = Seq(
      ("A", 10L, 1L, 5.0, 2L), ("A", 30L, 2L, 9.0, 1L),
      ("A", 20L, 3L, 1.0, 3L), ("B", 10L, 4L, 2.0, 5L)
    ).toDF("symbol", "ts", "id", "price", "volume")
    ticks.createOrReplaceTempView("ext_ticks")
    val viaSql = spark.sql(
      """SELECT symbol, b.open, b.high, b.low, b.close
         FROM (SELECT symbol, ohlc_bar(ts, id, price) AS b
               FROM ext_ticks GROUP BY symbol)""")
      .as[(String, Double, Double, Double, Double)].collect().toSet
    val viaApi = graft.operators.Ohlc.bars(
        ticks.withColumn("bucket", lit("all")),
        Seq("symbol"), "bucket", "price", "volume", Seq("ts", "id"))
      .select("symbol", "open", "high", "low", "close")
      .as[(String, Double, Double, Double, Double)].collect().toSet
    assert(viaSql == viaApi)
    assert(viaSql == Set(("A", 5.0, 9.0, 1.0, 9.0), ("B", 2.0, 2.0, 2.0, 2.0)))
  }
}
