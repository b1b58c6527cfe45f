package graft

import graft.operators.SnapshotDiff
import org.apache.spark.sql.functions._

/** Snapshot diff: planted add/remove/change/unchange classification and
  * the digest-only exchange contract (text never shuffles).
  */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private val old = Seq(
    (1L, "alpha"), (2L, "bravo"), (3L, "charlie"), (4L, "delta")
  ).toDF("doc_id", "text")
  // 1 unchanged, 2 changed, 3 removed, 5 added
  private val cur = Seq(
    (1L, "alpha"), (2L, "bravo v2"), (4L, "delta"), (5L, "echo")
  ).toDF("doc_id", "text")

  test("per-id statuses are exact") {
    val got = SnapshotDiff.diff(old, cur, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added"))
  }

  test("report counts sum to the id-universe size") {
    val rep = SnapshotDiff.report(old, cur, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    assert(rep == Map(
      "unchanged" -> 2L, "changed" -> 1L, "removed" -> 1L, "added" -> 1L))
  }

  test("null text classifies by PRESENCE, not digest nullness") {
    val o = Seq((1L, Option("a")), (2L, Option.empty[String]),
      (3L, Option.empty[String]), (4L, Option("x")))
      .toDF("doc_id", "text")
    val c = Seq((2L, Option.empty[String]), (3L, Option("b")),
      (4L, Option.empty[String]), (5L, Option.empty[String]))
      .toDF("doc_id", "text")
    val got = SnapshotDiff.diff(o, c, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "removed",   // null-free doc gone from cur
      2L -> "unchanged", // null text on both sides IS equal content
      3L -> "changed",   // null -> "b"
      4L -> "changed",   // "x" -> null
      5L -> "added"))    // null-text doc new in cur
  }

  test("exchanges carry (id, digest) only — raw text never shuffles") {
    val plan = SnapshotDiff.diff(old, cur, "doc_id", "text")
      .queryExecution.executedPlan.toString
    val exchanges = plan.split("Exchange").drop(1)
    assert(exchanges.nonEmpty || plan.contains("BroadcastHashJoin"))
    assert(!exchanges.exists(_.takeWhile(_ != '\n').contains("text#")),
      "an exchange carries raw document text:\n" + plan)
  }

  test("applyChangeset: delete drops, upsert replaces, fresh upsert inserts, rest untouched") {
    val corpus = Seq(
      (1L, "alpha"), (2L, "bravo"), (3L, "charlie"), (4L, "delta")
    ).toDF("doc_id", "text")
    val changes = Seq(
      (2L, "bravo v2", "upsert"), // replace
      (3L, "ignored", "delete"), // drop
      (9L, "iota", "upsert"), // insert (absent id)
      (10L, "ignored", "delete") // delete of an absent id: a no-op
    ).toDF("doc_id", "text", "op")
    val got = SnapshotDiff.applyChangeset(corpus, changes, "doc_id")
      .as[(Long, String)].collect().toSeq.sorted
    assert(got === Seq(
      (1L, "alpha"), (2L, "bravo v2"), (4L, "delta"), (9L, "iota")))
  }

  test("applyChangeset fails loudly on duplicate ids, unknown ops, missing columns") {
    val corpus = Seq((1L, "alpha")).toDF("doc_id", "text")
    val dup = Seq((2L, "x", "upsert"), (2L, "y", "delete"))
      .toDF("doc_id", "text", "op")
    assert(intercept[IllegalArgumentException](
      SnapshotDiff.applyChangeset(corpus, dup, "doc_id"))
      .getMessage.contains("duplicate"))
    val badOp = Seq((2L, "x", "merge")).toDF("doc_id", "text", "op")
    assert(intercept[IllegalArgumentException](
      SnapshotDiff.applyChangeset(corpus, badOp, "doc_id"))
      .getMessage.contains("ops outside"))
    val missing = Seq((2L, "upsert")).toDF("doc_id", "op")
    assert(intercept[IllegalArgumentException](
      SnapshotDiff.applyChangeset(corpus, missing, "doc_id"))
      .getMessage.contains("every corpus column"))
  }

  test("vocabDrift classifies added/removed/grown/shrunk/stable by hand") {
    val o = Seq(1L -> "The cat", 2L -> "the dog dog x",
      3L -> "gone gone").toDF("doc_id", "text")
    val c = Seq(4L -> "the THE cat bird", 5L -> "dog x x").toDF("doc_id", "text")
    val got = SnapshotDiff.vocabDrift(o, c, "text")
      .select("token", "old_n", "new_n").as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      "the" -> ((2L, 2L)),    // "The"/"THE" case-fold in; equal -> stable
      "cat" -> ((1L, 1L)),    // equal -> stable
      "dog" -> ((2L, 1L)),    // 2*1 <= 2 -> shrunk
      "x" -> ((1L, 2L)),      // 2 >= 2*1 -> grown
      "gone" -> ((2L, 0L)),   // removed
      "bird" -> ((0L, 1L))))  // added
    val byToken = SnapshotDiff.vocabDrift(o, c, "text")
      .select("token", "status").as[(String, String)].collect().toMap
    assert(byToken == Map("the" -> "stable", "cat" -> "stable",
      "dog" -> "shrunk", "x" -> "grown", "gone" -> "removed",
      "bird" -> "added"))
  }

  test("vocabDrift minCount floors on the LARGER side, after classification") {
    val o = Seq(1L -> "solo twice twice").toDF("doc_id", "text")
    val c = Seq(2L -> "fresh fresh").toDF("doc_id", "text")
    val got = SnapshotDiff.vocabDrift(o, c, "text", minCount = 2)
      .select("token", "status").as[(String, String)].collect().toMap
    // "solo" (1 old, 0 new) is hapax noise and drops; "twice" (removed,
    // old=2) and "fresh" (added, new=2) clear the floor on their side
    assert(got == Map("twice" -> "removed", "fresh" -> "added"))
  }
}
