package graft

import graft.operators.CurationFilters
import org.apache.spark.sql.functions._

class CurationFiltersSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats on hand-computable documents") {
    val df = Seq(
      (1L, "a a a b"),        // words: a=3,b=1; bigrams: "a a"x2, "a b"
      (2L, "x y z"),          // all distinct
      (3L, "w")               // single token: no bigrams
    ).toDF("doc_id", "text")
    val got = CurationFilters.repetitionStats(df, "doc_id", "text")
      .orderBy("id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 2L, 3L, 3L, 2L),
      (2L, 3L, 3L, 1L, 2L, 2L),
      (3L, 1L, 1L, 1L, 0L, 0L)))
  }

  test("repetitionFlag: integer thresholds, both arms") {
    val df = Seq(
      (1L, "a a a b"),                  // top word 3/4 = 75% > 20% -> flag
      (2L, "a b c d e f g h i j k l"),  // clean
      (3L, "a b a b a b a b c d")       // dup bigrams: 9 bigrams, 3 distinct -> 66% > 20%
    ).toDF("doc_id", "text")
    val flagged = CurationFilters.repetitionStats(df, "doc_id", "text")
      .filter(CurationFilters.repetitionFlag(20, 20))
      .select("id").as[Long].collect().toSet
    assert(flagged == Set(1L, 3L))
  }

  test("heavyNgrams finds planted boilerplate with deterministic order") {
    val boiler = "terms of service apply here"
    val df = (1 to 10).map(i => (i.toLong, s"doc $i unique${i}a unique${i}b $boiler"))
      .toDF("doc_id", "text")
    val top = CurationFilters.heavyNgrams(df, "text", n = 3, minCount = 5L, k = 3)
      .as[(String, Long)].collect().toSeq
    // every doc contributes the 3 boilerplate trigrams exactly once
    assert(top == Seq(
      ("of service apply", 10L),
      ("service apply here", 10L),
      ("terms of service", 10L)))
  }

  test("decontaminate flags overlap and only overlap") {
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix the quick brown fox suffix"), // shares 4-gram
      (2L, "the quick red fox jumps high"),      // no shared 4-gram
      (3L, "quick brown fox jumps again")        // shares 4-gram
    ).toDF("doc_id", "text")
    val got = CurationFilters.decontaminate(corpus, bench, "doc_id", "text", 4)
      .as[Long].collect().toSet
    assert(got == Set(1L, 3L))
  }

  test("decontaminate plan: hashed longs through the join, no nested loop") {
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val plan = CurationFilters.decontaminate(df, df, "doc_id", "text", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("LeftSemi"), plan)
  }
}
