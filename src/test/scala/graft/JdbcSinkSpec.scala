package graft

import graft.sinks.Sinks
import graft.sources.TradeGenerator
import org.apache.spark.sql.functions._

/** End-to-end exercise of the JDBC bulk sink (SURVEY.md §2.1 S4/S5/S8)
  * against embedded Derby — the one JDBC engine on the Spark classpath
  * (it ships with Spark for the Hive metastore). Covers the reference's
  * drop-index -> multi-connection load -> rebuild-index pattern
  * (reference src/database/DatabaseLoader.cpp:187-269,
  * src/threading/ParallelLoader.hpp:71-275): Spark's JDBC writer opens one
  * connection per partition, so numPartitions = 4 IS the reference's
  * 4-connection fan-out.
  */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dbDir = {
    val d = java.nio.file.Files.createTempDirectory("graft-derby")
    System.setProperty("derby.system.home", d.toString)
    d
  }
  private def url(name: String) = s"jdbc:derby:$dbDir/$name;create=true"
  private def props = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  private def withConn[A](u: String)(f: java.sql.Connection => A): A = {
    val c = java.sql.DriverManager.getConnection(u, props)
    try f(c) finally c.close()
  }

  test("jdbc sink: pre/post DDL + 4-connection parallel load round-trips") {
    val u = url("trades")
    // schema DDL (S8): target table + the (symbol, timestamp) index the
    // reference maintains (DatabaseLoader.cpp:122-125)
    withConn(u) { c =>
      val st = c.createStatement()
      st.execute("""CREATE TABLE trades_t (
        trade_id BIGINT, order_id BIGINT, ts BIGINT,
        price DOUBLE, volume INTEGER, symbol VARCHAR(16),
        exchange VARCHAR(16), side VARCHAR(1), typ VARCHAR(1),
        is_pro BOOLEAN)""")
      st.execute("CREATE INDEX idx_sym_ts ON trades_t (symbol, ts)")
      st.close()
    }

    val trades = TradeGenerator.generate(spark, 2000)
      .withColumnRenamed("timestamp", "ts")
      .withColumnRenamed("type", "typ")
    val target = Sinks.JdbcTarget(u, "trades_t", props)
    // the reference's optimization story: drop index, bulk-load over 4
    // connections, rebuild index after
    Sinks.writeJdbc(
      trades, target, numPartitions = 4, batchSize = 500,
      preSql = Seq("DROP INDEX idx_sym_ts"),
      postSql = Seq("CREATE INDEX idx_sym_ts ON trades_t (symbol, ts)"))

    // index was rebuilt by postSql
    val idxNames = withConn(u) { c =>
      val rs = c.getMetaData.getIndexInfo(null, null, "TRADES_T", false, false)
      val b = Seq.newBuilder[String]
      while (rs.next()) Option(rs.getString("INDEX_NAME")).foreach(b += _)
      b.result().toSet
    }
    assert(idxNames.contains("IDX_SYM_TS"))

    // full round trip: read back through spark.read.jdbc and compare
    val back = spark.read.jdbc(u, "trades_t", props)
    assert(back.count() === 2000)
    val srcSum = trades.agg(
      sum(col("trade_id")), sum(col("volume")),
      round(sum(col("price")), 4)).as[(Long, Long, Double)].head()
    val dstSum = back.agg(
      sum(col("trade_id")), sum(col("volume")),
      round(sum(col("price")), 4)).as[(Long, Long, Double)].head()
    assert(dstSum === srcSum)
    // every trade_id exactly once (no partition dropped or doubled)
    assert(back.select("trade_id").distinct().count() === 2000)
  }

  test("q120 gate self-heals a dropped index from a partially-failed run") {
    // simulate a prior invocation dying between its preSql DROP INDEX and
    // its postSql rebuild: the index is gone; the gate must recreate it
    // (ensureJdbcGateIndex) instead of failing on DROP INDEX forever
    val dir = "/root/testdata/sf0.001"
    graft.SparkEntry.queries("q120_jdbc_sink_roundtrip")(spark, dir).count()
    val u = graft.queries.MarketAnalytics.jdbcGateUrl
    withConn(u) { c =>
      val st = c.createStatement()
      try st.execute("DROP INDEX idx_cust_nat") finally st.close()
    }
    val out = graft.SparkEntry.queries("q120_jdbc_sink_roundtrip")(spark, dir)
    assert(out.count() > 0)
    val idxNames = withConn(u) { c =>
      val rs = c.getMetaData.getIndexInfo(null, null, "CUSTOMER_T", false, false)
      val b = Seq.newBuilder[String]
      while (rs.next()) Option(rs.getString("INDEX_NAME")).foreach(b += _)
      b.result().toSet
    }
    assert(idxNames.contains("IDX_CUST_NAT"))
  }

  test("jdbc sink: truncate mode replaces content, keeps table") {
    val u = url("trunc")
    withConn(u) { c =>
      val st = c.createStatement()
      st.execute("CREATE TABLE t2 (k BIGINT, v VARCHAR(8))")
      st.close()
    }
    val target = Sinks.JdbcTarget(u, "t2", props)
    Sinks.writeJdbc(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), target,
      numPartitions = 2)
    Sinks.writeJdbc(Seq((9L, "z")).toDF("k", "v"), target,
      numPartitions = 2, truncate = true)
    val rows = spark.read.jdbc(u, "t2", props)
      .as[(Long, String)].collect().toSet
    assert(rows === Set((9L, "z")))
  }

  test("streaming jdbc sink: exactly-once across replay and crash windows") {
    val u = url("stream_eo")
    withConn(u) { c =>
      val st = c.createStatement()
      st.execute(
        "CREATE TABLE ticks_t (id BIGINT, sym VARCHAR(8), batch_id BIGINT)")
      st.close()
    }
    val target = Sinks.JdbcTarget(u, "ticks_t", props)
    val writer = Sinks.jdbcBatchWriter(target, "q_eo", numPartitions = 2,
      batchSize = 100)

    def rows(): Seq[(Long, String, Long)] = withConn(u) { c =>
      val st = c.createStatement()
      try {
        val rs = st.executeQuery("SELECT id, sym, batch_id FROM ticks_t")
        val b = Seq.newBuilder[(Long, String, Long)]
        while (rs.next()) b += ((rs.getLong(1), rs.getString(2), rs.getLong(3)))
        rs.close(); b.result()
      } finally st.close()
    }
    def insert(c: java.sql.Connection, vals: String): Unit = {
      val st = c.createStatement()
      try st.execute(s"INSERT INTO ticks_t VALUES $vals") finally st.close()
    }

    // a REAL micro-batch stream through foreachBatch: two batches
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-eo-jdbc")
    val q = input.toDF().toDF("id", "sym")
      .writeStream.foreachBatch(writer(_, _))
      .option("checkpointLocation", ckpt.toString)
      .start()
    input.addData((1L, "A"), (2L, "B"))
    q.processAllAvailable()
    input.addData((3L, "C"))
    q.processAllAvailable()
    q.stop()
    assert(rows().map(r => (r._1, r._2)).sorted ===
      Seq((1L, "A"), (2L, "B"), (3L, "C")))
    val batchOf = rows().map(r => r._1 -> r._3).toMap
    def batch(vs: (Long, String)*) = vs.toSeq.toDF("id", "sym")

    // crash window 4 (log row committed): replaying a logged batch is a
    // no-op — the foreachBatch contract re-delivers identical data, and
    // the log row makes the whole batch skip
    writer(batch((1L, "A"), (2L, "B")), batchOf(1L))
    assert(rows().size === 3, "logged batch replay must not duplicate")

    // crash window 2 (mid-write): a PARTIAL slice of batch 7 on disk,
    // unlogged — replay wipes it and writes the full batch exactly once
    withConn(u)(insert(_, "(10, 'X', 7)"))
    writer(batch((10L, "X"), (11L, "Y")), 7L)
    assert(rows().filter(_._3 == 7L).map(r => (r._1, r._2)).sorted ===
      Seq((10L, "X"), (11L, "Y")))

    // crash window 3 (write complete, log row lost): the COMPLETE batch 8
    // on disk, unlogged — replay must not double it
    withConn(u)(insert(_, "(20, 'P', 8), (21, 'Q', 8)"))
    writer(batch((20L, "P"), (21L, "Q")), 8L)
    assert(rows().filter(_._3 == 8L).map(r => (r._1, r._2)).sorted ===
      Seq((20L, "P"), (21L, "Q")))

    // total table state: every batch exactly once
    assert(rows().map(r => (r._1, r._2)).sorted ===
      Seq((1L, "A"), (2L, "B"), (3L, "C"), (10L, "X"), (11L, "Y"),
        (20L, "P"), (21L, "Q")))
  }
}
