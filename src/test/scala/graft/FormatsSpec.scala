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
}
