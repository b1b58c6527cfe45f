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

  test("contaminationOverlap counts shared distinct grams exactly") {
    // benchmark doc: tokens b0..b9 => 4-grams b0..b3 ... b6..b9 (7 grams)
    val bench = Seq((0L, (0 to 9).map("b" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // copies tokens b2..b7 => shares grams b2..b5, b3..b6, b4..b7 (3)
      // of its own 9 distinct grams (12 tokens)
      (1L, "x1 x2 x3 " + (2 to 7).map("b" + _).mkString(" ") + " y1 y2 y3"),
      // clean doc: no shared grams => absent from the output
      (2L, (0 to 11).map("c" + _).mkString(" ")),
      // full copy: all 7 grams shared, 7 of 7
      (3L, (0 to 9).map("b" + _).mkString(" "))
    ).toDF("doc_id", "text")
    val out = CurationFilters
      .contaminationOverlap(corpus, bench, "doc_id", "text", 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(1L -> ((9L, 3L)), 3L -> ((7L, 7L))), out.toString)
  }

  test("piiScan counts and redacts every planted pattern; redaction is idempotent") {
    val df = Seq(
      (1L, "write to alice.b+spam@mail-host.example.com or bob@x.io today"),
      (2L, "server 10.0.255.3 and 192.168.1.17 up"),
      (3L, "call 555-123-4567 or +33-444-0000 now"), // 2nd: +333-444-0000 would match; +33- does not
      (4L, "clean text with no pii at all"),
      (5L, "mixed: c@d.org on 8.8.8.8 dial 111-222-3333")
    ).toDF("doc_id", "text")
    val out = CurationFilters.piiScan(df, "doc_id", "text")
      .select($"id", $"n_emails", $"n_ips", $"n_phones", $"redacted")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 2 && out(1L)._3 == 0 && out(1L)._4 == 0)
    assert(out(2L)._3 == 2, out(2L).toString)
    assert(out(3L)._4 == 1, out(3L).toString)
    assert(out(4L)._2 + out(4L)._3 + out(4L)._4 == 0)
    assert(out(5L)._2 == 1 && out(5L)._3 == 1 && out(5L)._4 == 1)
    assert(out(5L)._5 == "mixed: <EMAIL> on <IP> dial <PHONE>", out(5L)._5)
    // no residual matches in redacted text; redact(redact(x)) == redact(x)
    import org.apache.spark.sql.Row
    val redacted = CurationFilters.piiScan(
      CurationFilters.piiScan(df, "doc_id", "text")
        .select($"id".as("doc_id"), $"redacted".as("text")),
      "doc_id", "text")
    assert(redacted.filter($"n_emails" + $"n_ips" + $"n_phones" > 0).count() == 0)
    val twice = redacted.select($"id", $"redacted").as[(Long, String)].collect().toMap
    out.foreach { case (id, r) => assert(twice(id) == r._5, s"not idempotent on $id") }
  }

  test("piiScan counts categories independently; redaction order resolves overlaps") {
    // an email whose domain embeds a dotted quad: BOTH raw counts fire
    // (counts are independent scans of the raw text), but redaction
    // replaces the email first, so no IP placeholder appears
    val df = Seq((1L, "u@10.0.0.99.example.com is odd but an email"))
      .toDF("doc_id", "text")
    val r = CurationFilters.piiScan(df, "doc_id", "text")
      .select($"n_emails", $"n_ips", $"redacted")
      .as[(Long, Long, String)].collect().head
    assert(r._1 == 1 && r._2 == 1, r.toString)
    assert(r._3 == "<EMAIL> is odd but an email", r._3)
  }
}
