package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Production-shape BPE ENCODING: the whole trained merge table applied
  * in ONE codegen'd expression per document, replacing the
  * one-chained-fold-per-merge plan the chained form builds
  * ([[graft.operators.TextAnalysis.bpeEncode]]'s history). The chained
  * plan is linear in the merge count — at a real tokenizer's ~32k
  * merges that is 32k nested expressions, past codegen's 64KB method
  * limit and quadratic in the analyzer — where this expression is ONE
  * plan node whatever the table size, with the ranks held in a
  * reference object (broadcast with the task binary, vocabulary-sized).
  *
  * Semantics are EXACTLY the chained form's (spec-pinned equal): merges
  * apply in training order, each as a LEFT-TO-RIGHT NON-OVERLAPPING
  * corpus-wide pass (Sennrich et al. 2016). The single-pass algorithm
  * is the standard tokenizer-service form — repeatedly merge the
  * LOWEST-RANK pair present, all its occurrences left-to-right — which
  * equals sequential per-rank passes because merging rank k can never
  * create an occurrence of a rank j < k: rank j was elected before
  * rank k's symbol existed, so no earlier pair references it (the same
  * readable-merge-name collision caveat as training: a raw corpus
  * token that equals a merged symbol's "a_b" name breaks the argument
  * for BOTH forms identically, documented in
  * [[graft.operators.TextAnalysis.bpeMerges]]).
  *
  * Cost: per doc O(distinct-ranks-present × length) with zero lookups
  * proportional to the table size — a doc touches only the ranks its
  * own adjacencies hit. No shuffle, no UDF, inside whole-stage codegen
  * (doGenCode emits a call on the bound reference object, the
  * NormalizeExprs pattern).
  */
object BpeExprs {

  // U+001F, the library's BPE fold separator (TextAnalysis.BpeSep):
  // cannot occur in tokens because every caller folds it to ' ' before
  // tokenizing (the bpeMerges guarantee), so a+Sep+b keys (a, b)
  // unambiguously
  private val Sep = "\u001f"

  case class BpeEncodeApply(
      child: Expression,
      merges: IndexedSeq[(String, String)])
      extends UnaryExpression {
    require(merges.nonEmpty, "bpe_encode: empty merge table")

    override def dataType: DataType = child.dataType
    override def prettyName: String = "bpe_encode"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string> tokens, got $other")
      }

    // rank lookup (a U+001F b -> rank) plus rank-indexed pair/merged-name
    // tables for the merge pass — built once per task from the reference
    // object, never per row
    @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](merges.length * 2)
      merges.zipWithIndex.foreach { case ((a, b), r) =>
        // first election wins, as the chained form's earlier pass would
        // have consumed the pair before a duplicate later round saw it
        m.putIfAbsent(a + Sep + b, r)
      }
      m
    }
    @transient private lazy val pairA: Array[String] = merges.map(_._1).toArray
    @transient private lazy val pairB: Array[String] = merges.map(_._2).toArray
    @transient private lazy val mergedName: Array[String] =
      merges.map { case (a, b) => a + "_" + b }.toArray

    def encode(in: ArrayData): ArrayData = {
      val n = in.numElements()
      if (n <= 1) return in
      val syms = new Array[String](n)
      var i = 0
      while (i < n) {
        syms(i) = if (in.isNullAt(i)) null else in.getUTF8String(i).toString
        i += 1
      }
      var len = n
      var done = false
      while (!done) {
        // lowest rank present among current adjacencies
        var best = Int.MaxValue
        i = 0
        while (i < len - 1) {
          if (syms(i) != null && syms(i + 1) != null) {
            val r = ranks.get(syms(i) + Sep + syms(i + 1))
            if (r != null && r < best) best = r
          }
          i += 1
        }
        if (best == Int.MaxValue) done = true
        else {
          // merge every left-to-right non-overlapping occurrence of it
          val a = pairA(best); val b = pairB(best); val m = mergedName(best)
          var w = 0; var rd = 0
          while (rd < len) {
            if (rd < len - 1 && a == syms(rd) && b == syms(rd + 1)) {
              syms(w) = m; rd += 2
            } else { syms(w) = syms(rd); rd += 1 }
            w += 1
          }
          len = w
        }
      }
      val out = new Array[Any](len)
      i = 0
      while (i < len) {
        out(i) = if (syms(i) == null) null else UTF8String.fromString(syms(i))
        i += 1
      }
      new GenericArrayData(out)
    }

    override def nullSafeEval(input: Any): Any =
      encode(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bpeEncode", this,
        classOf[BpeEncodeApply].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
    }

    override protected def withNewChildInternal(
        newChild: Expression): BpeEncodeApply =
      copy(child = newChild)
  }

  /** Column form over a token array column. */
  def bpeEncode(tokens: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(
      BpeEncodeApply(ColumnBridge.expression(tokens), merges.toIndexedSeq))
}
