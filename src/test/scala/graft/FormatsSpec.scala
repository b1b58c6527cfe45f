package graft

import org.apache.spark.sql.functions._

/** At-rest format coverage beyond parquet: ORC round-trip with predicate
  * pushdown. (spark-avro's DataSource jar is not in this environment —
  * parquet/ORC/CSV/JSON are the supported interchange formats.)
  */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  test("orc round-trips trades and pushes filters to the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val trades = graft.sources.TradeGenerator.generate(spark, 5000)
    trades.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() === 5000)
    assert(back.agg(sum("volume")).as[Long].head() ===
      trades.agg(sum("volume")).as[Long].head())
    val q = back.filter(col("symbol") === "TCS").select("symbol", "price")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("TCS"), scan)
    // column pruning reaches the ORC reader too
    assert(scan.contains("ReadSchema") && !scan.contains("is_pro"), scan)
  }

  test("jsonl round-trips docs exactly and dead-letters broken lines with raw bytes") {
    import graft.sources.DocJsonl
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-spec").toString
    val docs = Seq(
      (1L, "the quick \"quoted\" fox", "en"),
      (2L, "unicode snowman ☃ and tab\\t literal", "de"),
      (3L, "", "fr")
    ).toDF("doc_id", "text", "lang")
    DocJsonl.write(docs, dir)
    // "null" IS valid JSON — it must dead-letter, not become a phantom
    // all-null document
    Seq("{broken", "also broken}", "null").toDF("value")
      .write.mode("append").text(dir)
    val back = DocJsonl.read(spark, dir, docs.schema)
    // valid rows round-trip exactly, including quotes/unicode/empty text
    val valid = DocJsonl.valid(back)
      .as[(Long, String, String)].collect().toSet
    assert(valid == docs.as[(Long, String, String)].collect().toSet)
    // dead letter carries exactly the raw broken lines
    val dead = DocJsonl.deadLetter(back).as[String].collect().toSet
    assert(dead == Set("{broken", "also broken}", "null"), dead.toString)
    // strict schema: no inference pass, declared types honored
    assert(back.schema.fieldNames.toSeq ==
      Seq("doc_id", "text", "lang", DocJsonl.corruptCol))
  }

  test("compactParquet merges small files, preserves rows and schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    val df = (0L until 1000L).map(i => (i, s"row $i")).toDF("id", "payload")
    // simulate a micro-batch sink's fragmentation: many tiny files
    df.repartition(40).write.parquet(dir)
    def parquetFiles() = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles() >= 30, "fixture not fragmented enough")
    graft.sinks.Sinks.compactParquet(spark, dir, targetRecordsPerFile = 400L)
    // ceil(1000/400) = 3 bins; coalesce imbalance may split one or two
    // (documented bound: < 2x ceil), never anywhere near the original 40
    assert(parquetFiles() >= 3 && parquetFiles() <= 5,
      s"got ${parquetFiles()} files")
    val back = spark.read.parquet(dir)
    assert(back.schema.fieldNames.toSeq == Seq("id", "payload"))
    assert(back.as[(Long, String)].collect().toSet ==
      df.as[(Long, String)].collect().toSet)
    // no leftover temp/backup siblings
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(n => n.contains("compact-tmp") || n.contains("compact-old")),
      parent.mkString(","))
  }
}
