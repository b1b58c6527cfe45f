package graft

import graft.functions.NormalizeExprs
import org.apache.spark.sql.functions._

/** Unicode normalization: canonical folding, idempotence, dedup-key
  * unification, NFKC compatibility folding, and codegen'd plan shape.
  * All non-ASCII is written as \u escapes — composed vs decomposed forms
  * render identically, so raw glyphs in source would hide which one a
  * fixture actually is.
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val eAcuteComposed = "caf\u00E9"
  private val eAcuteDecomposed = "cafe\u0301"

  private def nfcOf(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(NormalizeExprs.nfc($"t")).as[String].head()

  test("decomposed combining sequences fold to precomposed forms") {
    assert(nfcOf(eAcuteDecomposed) == eAcuteComposed)
    assert(nfcOf("A\u030Angstro\u0308m") == "\u00C5ngstr\u00F6m")
  }

  test("idempotent on already-normalized and plain-ASCII text") {
    assert(nfcOf(eAcuteComposed) == eAcuteComposed)
    assert(nfcOf("plain ascii") == "plain ascii")
    assert(nfcOf("") == "")
  }

  test("null propagates, no NPE") {
    val out = Seq[Option[String]](None).toDF("t")
      .select(NormalizeExprs.nfc($"t")).as[Option[String]].head()
    assert(out.isEmpty)
  }

  test("NFC unifies dedup keys for visually-identical encodings") {
    val df = Seq(
      (1L, eAcuteComposed + " menu"),
      (2L, eAcuteDecomposed + " menu") // same visible string
    ).toDF("id", "text")
    val rawKeys = df.select(md5($"text")).distinct().count()
    val nfcKeys = df.select(md5(NormalizeExprs.nfc($"text")))
      .distinct().count()
    assert(rawKeys == 2L && nfcKeys == 1L)
  }

  test("NFKC additionally folds compatibility forms") {
    // U+FB01 fi-ligature -> "fi"; U+FF21 full-width A -> "A"
    val out = Seq(Tuple1("\uFB01le \uFF2122")).toDF("t")
      .select(NormalizeExprs.nfkc($"t")).as[String].head()
    assert(out == "file A22")
    // NFC leaves compatibility forms alone
    assert(nfcOf("\uFB01le") == "\uFB01le")
  }

  test("plan is a codegen'd projection — no shuffle, no UDF node") {
    val plan = Seq(Tuple1("x")).toDF("t")
      .select(NormalizeExprs.nfc($"t"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      plan)
  }
}
