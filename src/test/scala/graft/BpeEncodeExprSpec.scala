package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** The single-expression BPE encode (graft.functions.BpeExprs) against
  * two independent models: the chained-fold form it replaced
  * (TextAnalysis.bpeEncodeChained — the pre-round-15 production path,
  * kept as the semantic anchor) and a plain Scala loop implementing
  * sequential left-to-right non-overlapping passes. Equality on random
  * corpora, trained chains, hand-walked overlap cases, and a
  * 500-merge table far past the chained form's 64-round codegen cap.
  */
class BpeEncodeExprSpec extends SparkSpec {
  import spark.implicits._

  /** Reference model: one LTR non-overlapping pass per merge, in
    * training order — plain driver-side loops, no Spark.
    */
  private def refEncode(
      toks: Seq[String], merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(toks.toVector) { case (l, (a, b)) =>
      val buf = Vector.newBuilder[String]
      var i = 0
      while (i < l.length) {
        if (i < l.length - 1 && l(i) == a && l(i + 1) == b) {
          buf += (a + "_" + b); i += 2
        } else { buf += l(i); i += 1 }
      }
      buf.result()
    }

  private def encode(
      docs: Seq[(Long, String)],
      merges: Seq[(String, String)]): Seq[(Long, Seq[String])] =
    TextAnalysis.bpeEncode(docs.toDF("id", "text"), "id", "text", merges)
      .orderBy("id").as[(Long, Seq[String])].collect().toSeq

  test("expression == chained form == Scala model on random corpora with trained merges") {
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("a", "b", "c", "d", "e", "f")
    val docs = (0L until 200L).map { i =>
      val len = rnd.nextInt(13)
      (i, Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString(" "))
    }
    // trained table: real chains (later merges consume earlier outputs)
    val trained = TextAnalysis
      .bpeMerges(docs.toDF("id", "text"), "text", rounds = 8)
      .orderBy("round").select("pair_a", "pair_b")
      .as[(String, String)].collect().toSeq
    val got = encode(docs, trained)
    val chained = TextAnalysis
      .bpeEncodeChained(docs.toDF("id", "text"), "id", "text", trained)
      .orderBy("id").as[(Long, Seq[String])].collect().toSeq
    assert(got === chained, "expression diverged from the chained form")
    docs.zip(got).foreach { case ((id, text), (gid, toks)) =>
      assert(id === gid)
      val want = refEncode(
        text.split("\\s+").toSeq.filter(_.nonEmpty), trained)
      assert(toks === want, s"doc $id ('$text') diverged from the model")
    }
  }

  test("hand cases: overlap collapse, rank order beats string position, chains") {
    // overlap: one LTR pass of (a,a) on "a a a" merges once, not twice
    assert(encode(Seq((1L, "a a a")), Seq(("a", "a"))) ===
      Seq((1L, Seq("a_a", "a"))))
    // rank order: (a,b) trained FIRST must apply before (a,a) even
    // though (a,a) sits earlier in the string — the chained form's
    // round order, which the min-rank loop must reproduce
    assert(encode(Seq((1L, "a a b")), Seq(("a", "b"), ("a", "a"))) ===
      Seq((1L, Seq("a", "a_b"))))
    // chain: merge 2 consumes merge 1's output symbol
    assert(encode(Seq((1L, "a a a")), Seq(("a", "a"), ("a_a", "a"))) ===
      Seq((1L, Seq("a_a_a"))))
    // duplicate pair later in the table is a no-op (first election wins)
    assert(encode(Seq((1L, "a a a a")), Seq(("a", "a"), ("a", "a"))) ===
      Seq((1L, Seq("a_a", "a_a"))))
    // degenerates: empty text -> empty array, singleton untouched
    assert(encode(Seq((1L, ""), (2L, "x")), Seq(("a", "b"))) ===
      Seq((1L, Seq.empty[String]), (2L, Seq("x"))))
  }

  test("500-merge table (8x past the chained cap): one plan node, model-equal") {
    // a long dependency chain: t0_t1, t0_t1_t2, ... — every merge
    // consumes the previous output, the worst case for any shortcut
    val n = 500
    val toks = (0 until (n + 1)).map(i => s"t$i")
    val merges = (1 to n).scanLeft(("t0", "t1")) { case ((a, b), i) =>
      (a + "_" + b, s"t${i + 1}")
    }.take(n)
    val doc = Seq((1L, toks.mkString(" ")), (2L, "t5 t6 zzz t0 t1"))
    val got = encode(doc, merges)
    doc.zip(got).foreach { case ((id, text), (gid, out)) =>
      assert(id === gid)
      assert(out === refEncode(
        text.split("\\s+").toSeq.filter(_.nonEmpty), merges))
    }
    // the full chain collapses to ONE symbol
    assert(got.head._2 === Seq(toks.mkString("_")))
    // the chained form refuses this table size — the cap the expression
    // removes
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeEncodeChained(
        doc.toDF("id", "text"), "id", "text", merges)
    }
  }

  test("null text encodes to null; q146-shape round trip holds") {
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, "a a"))
      .toDF("id", "text")
    val out = TextAnalysis.bpeEncode(docs, "id", "text", Seq(("a", "a")))
      .orderBy("id").select("tokens").as[Option[Seq[String]]].collect().toSeq
    assert(out === Seq(None, Some(Seq("a_a"))))
  }
}
