package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Pins the type-adaptive events ingestion contract (the round-7 incident:
  * the corpus regenerated from TIMESTAMP(NANOS) to TIMESTAMP(MICROS, NTZ)
  * parquet and 11 queries broke — one silently). The engine's contract is
  * the reference's ns-epoch-long model (reference src/model/Trade.hpp:21);
  * this spec writes the SAME events three physically different ways —
  *   (a) plain INT64 ns longs,
  *   (b) TIMESTAMP(NANOS) (rounds 1–6's encoding, read via nanosAsLong),
  *   (c) TIMESTAMP(MICROS, isAdjustedToUTC=false) (round 7+'s encoding,
  *       read as TIMESTAMP_NTZ),
  *   (d) TIMESTAMP(MICROS, isAdjustedToUTC=true) (read as TIMESTAMP)
  * — and asserts Tables.load yields the identical ns-long relation for all
  * four, through q14/q17/q19-shaped pipelines. An unknown physical type
  * must fail loudly, never flex (q31's INTERVAL trap).
  */
class TablesSpec extends SparkSpec {

  // µs-aligned ns epochs (sub-µs tails cannot survive a MICROS encoding;
  // the corpus is µs-aligned at every SF) spanning several hours and users
  private val rows: Seq[(Long, Long, Long, String, Double, String)] =
    (0 until 48).map { i =>
      val ns = 1704067200000000000L + // 2024-01-01T00:00:00Z
        i.toLong * 7 * 60 * 1000000000L + i.toLong * 1000L * (i % 3)
      (i.toLong, ns / 1000L * 1000L, (i % 5 + 1).toLong,
        Seq("click", "view", "purchase")(i % 3), (i * 13 % 480).toDouble + 1.0,
        s"""{"k":${i % 7}}""")
    }

  /** Write an events file whose ts column uses the given logical annotation
    * (None = plain INT64) and value transform (ns -> stored long).
    */
  private def writeEvents(
      file: java.io.File,
      tsAnnotation: Option[LogicalTypeAnnotation],
      storeTs: Long => Long): Unit = {
    val tsBuilder = Types.optional(INT64)
    val tsType = tsAnnotation.fold(tsBuilder.named("ts"))(a => tsBuilder.as(a).named("ts"))
    val schema = new MessageType("events",
      Types.optional(INT64).named("event_id"),
      tsType,
      Types.optional(INT64).named("user_id"),
      Types.optional(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type"),
      Types.optional(DOUBLE).named("value"),
      Types.optional(BINARY).as(LogicalTypeAnnotation.stringType()).named("props"))
    val conf = new Configuration()
    val writer = ExampleParquetWriter.builder(new Path(file.getAbsolutePath))
      .withConf(conf).withType(schema).build()
    val factory = new SimpleGroupFactory(schema)
    try rows.foreach { case (id, ns, uid, et, v, props) =>
      val g = factory.newGroup()
      g.append("event_id", id)
      g.append("ts", storeTs(ns))
      g.append("user_id", uid)
      g.append("event_type", et)
      g.append("value", v)
      g.append("props", props)
      writer.write(g)
    } finally writer.close()
  }

  private def variantDir(name: String, ann: Option[LogicalTypeAnnotation],
      storeTs: Long => Long): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-ts-$name").toFile
    writeEvents(new java.io.File(dir, "events.parquet"), ann, storeTs)
    dir.getAbsolutePath
  }

  private lazy val dirs: Map[String, String] = Map(
    "int64_ns" -> variantDir("int64", None, identity),
    "ts_nanos" -> variantDir("nanos",
      Some(LogicalTypeAnnotation.timestampType(true, TimeUnit.NANOS)), identity),
    "ts_micros_ntz" -> variantDir("ntz",
      Some(LogicalTypeAnnotation.timestampType(false, TimeUnit.MICROS)), _ / 1000L),
    "ts_micros_utc" -> variantDir("utc",
      Some(LogicalTypeAnnotation.timestampType(true, TimeUnit.MICROS)), _ / 1000L))

  test("all physical encodings load to the identical ns-long relation") {
    val loaded = dirs.map { case (n, d) => n -> Tables.load(spark, d, "events") }
    loaded.foreach { case (n, df) =>
      assert(df.schema("ts").dataType == LongType, s"$n: ts must load as LongType")
    }
    val collected = loaded.map { case (n, df) =>
      n -> df.orderBy("event_id").collect().map(_.toSeq).toSeq
    }
    val (refName, ref) = collected.head
    collected.tail.foreach { case (n, rows) =>
      assert(rows == ref, s"$n differs from $refName")
    }
    // and the values are the exact ns epochs we wrote
    val got = loaded("ts_micros_ntz").orderBy("event_id")
      .select("ts").collect().map(_.getLong(0)).toSeq
    assert(got == rows.map(_._2))
  }

  test("q14/q17/q19-shaped pipelines agree across encodings") {
    import graft.operators.{Sessionize, Validation}
    def pipelines(dir: String): Seq[Seq[Seq[Any]]] = {
      val ev = Tables.load(spark, dir, "events")
      val validate = Validation
        .report(ev, graft.queries.MarketAnalytics.eventRules)
        .orderBy("outcome")
      val sessions = Sessionize.stats(ev, "user_id", "ts",
          Seq("ts", "event_id"), gap = 1800000000000L)
        .orderBy("user_id")
      val hourly = ev
        .withColumn("hour", date_format(
          graft.streaming.StreamingEtl.toEventTime(col("ts")), "yyyy-MM-dd HH:00"))
        .groupBy("hour").agg(count(lit(1)).as("n"))
        .orderBy("hour")
      Seq(validate, sessions, hourly).map(_.collect().map(_.toSeq).toSeq)
    }
    val all = dirs.map { case (n, d) => n -> pipelines(d) }
    val (refName, ref) = all.head
    all.tail.foreach { case (n, res) =>
      assert(res == ref, s"$n pipeline output differs from $refName")
    }
  }

  test("an unrecognized ts type fails loudly instead of flexing") {
    import spark.implicits._
    val df = Seq(("1", 1L)).toDF("ts", "event_id")
    val e = intercept[IllegalArgumentException] {
      Tables.normalizeNsTs(df, "ts")
    }
    assert(e.getMessage.contains("refusing to guess"))
  }

  test("requireNsLong rejects timestamp-typed time columns") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("ts", "click_ts")
      .withColumn("ts", timestamp_micros(col("ts")))
    intercept[IllegalArgumentException] {
      Tables.requireNsLong(df, "ts", "click_ts")
    }
    // and passes when the contract holds
    Tables.requireNsLong(df.withColumn("ts", lit(1L)), "ts", "click_ts")
  }
}
