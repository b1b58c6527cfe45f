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

  test("bloomDecontaminate never misses and the exact composition agrees") {
    val rng = new scala.util.Random(11)
    def words(n: Int, vocab: String) =
      Seq.fill(n)(vocab + rng.nextInt(500)).mkString(" ")
    val bench = (0L until 20L).map(i => (i, words(30, "b"))).toDF("doc_id", "text")
    val benchTexts = bench.as[(Long, String)].collect().toMap
    // corpus: 30 clean docs (disjoint vocab) + 10 with a copied benchmark run
    val corpus = (
      (100L until 130L).map(i => (i, words(40, "c"))) ++
      (200L until 210L).map { i =>
        val src = benchTexts(i % 20).split(" ").slice(3, 9).mkString(" ")
        (i, words(10, "c") + " " + src + " " + words(10, "d"))
      }).toDF("doc_id", "text")
    val exact = CurationFilters
      .decontaminate(corpus, bench, "doc_id", "text", 4)
      .as[Long].collect().toSet
    val bloom = CurationFilters
      .bloomDecontaminate(corpus, bench, "doc_id", "text", 4, fpp = 0.01)
      .as[Long].collect().toSet
    val composed = CurationFilters
      .bloomDecontaminateExact(corpus, bench, "doc_id", "text", 4, fpp = 0.01)
      .as[Long].collect().toSet
    assert((200L until 210L).toSet.subsetOf(exact), s"planted not flagged: $exact")
    assert(exact.subsetOf(bloom), "bloom missed a truly contaminated id")
    assert(composed == exact, "bloom+exact composition diverged from exact join")
  }

  test("bloomDecontaminate plan: map-side probe, no gram exchange or join") {
    val df = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val plan = CurationFilters
      .bloomDecontaminate(df, df, "doc_id", "text", 4)
      .queryExecution.executedPlan.toString
    // the corpus side must not join at all — the only operators are the
    // scan, the shingle projection, the codegen'd bloom filter probe, and
    // the distinct over flagged ids
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("bloom_might_contain_long"), plan)
  }
}
