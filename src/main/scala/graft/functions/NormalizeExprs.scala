package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical/compatibility normalization as a codegen'd Catalyst
  * expression. Spark has no builtin for this, yet it is the FIRST
  * transform of any serious text pipeline: the same visible string has
  * many code-point encodings ("é" as U+00E9 vs e+U+0301), and without a
  * canonical form exact dedup, n-gram decontamination, and tokenizers all
  * silently treat equal texts as different. NFC is the web norm; NFKC
  * additionally folds compatibility forms (ligatures, full-width latin) —
  * the choice most LLM tokenizer stacks make.
  *
  * Per-row projection via the JDK's `java.text.Normalizer` (stable across
  * JVMs for a given Unicode version), inside whole-stage codegen; no
  * shuffle, composes with every downstream dedup/fingerprint operator.
  * Already-normalized text (the overwhelming common case) is detected
  * with the quick-check `isNormalized` — an O(n) scan that skips the
  * allocation-heavy decompose/recompose path.
  */
object NormalizeExprs {

  case class UnicodeNormalize(child: Expression, formName: String)
      extends UnaryExpression {
    require(Set("NFC", "NFD", "NFKC", "NFKD")(formName),
      s"unknown normalization form $formName")

    override def dataType: DataType = StringType
    override def prettyName: String = s"${formName.toLowerCase}_normalize"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case _: StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got $other")
      }

    @transient private lazy val form = Normalizer.Form.valueOf(formName)

    def normalize(v: UTF8String): UTF8String = {
      val s = v.toString
      if (Normalizer.isNormalized(s, form)) v
      else UTF8String.fromString(Normalizer.normalize(s, form))
    }

    override def nullSafeEval(input: Any): Any =
      normalize(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("unicodeNorm", this,
        classOf[UnicodeNormalize].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.normalize($c);")
    }

    override protected def withNewChildInternal(
        newChild: Expression): UnicodeNormalize =
      copy(child = newChild)
  }

  /** Column forms. */
  def nfc(value: Column): Column =
    ColumnBridge.column(
      UnicodeNormalize(ColumnBridge.expression(value), "NFC"))
  def nfkc(value: Column): Column =
    ColumnBridge.column(
      UnicodeNormalize(ColumnBridge.expression(value), "NFKC"))
}
