package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a codegen'd Catalyst expression.
  *
  * Scale rationale: the exact n-gram decontamination join
  * (CurationFilters.decontaminate, q50) shuffles every corpus
  * (id, gram-hash) pair into a semi-join — correct, but at 100 TB the
  * corpus side dominates the exchange. With the benchmark side compiled
  * into a Bloom filter that ships inside this expression, the corpus
  * side never shuffles grams at all: scan → shingle → map-side probe →
  * distinct over the (tiny) flagged id set. The filter costs ~14.4 bits
  * per entry at fpp=1e-3 (a 10^5-gram benchmark ≈ 180 KB), and a Bloom
  * filter has no false negatives by construction, so the flagged set is
  * always a superset of the exact join's — soundness is one-directional
  * and gate-checkable (q60).
  */
object BloomExprs {

  /** might-contain over Spark's own `org.apache.spark.util.sketch
    * .BloomFilter` (the public sketch `df.stat.bloomFilter` builds, so
    * build and probe share one hashing scheme). `filterBytes` is the
    * sketch's `writeTo` serialization — it rides the serialized plan to
    * executors; the filter is deserialized once per task via
    * `addReferenceObj` and probed per row with `mightContainLong`. Held
    * as an IndexedSeq, not Array: a case-class Array field compares by
    * reference, which would defeat semanticEquals/common-subexpression
    * elimination for two probes of the same filter.
    */
  case class BloomMightContainLong(
      child: Expression, filterBytes: IndexedSeq[Byte])
      extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "bloom_might_contain_long"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case LongType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain_long requires bigint, got $other")
      }

    @transient private lazy val filter: BloomFilter =
      BloomFilter.readFrom(new ByteArrayInputStream(filterBytes.toArray))

    def test(v: Long): Boolean = filter.mightContainLong(v)

    override def nullSafeEval(input: Any): Any =
      test(input.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloomProbe", this,
        classOf[BloomMightContainLong].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.test($c);")
    }

    override protected def withNewChildInternal(
        newChild: Expression): BloomMightContainLong =
      copy(child = newChild)
  }

  /** Column form: true when `value` might be in `filter` (never a false
    * negative). Serializes the filter once at plan-construction time.
    */
  def bloomMightContain(value: Column, filter: BloomFilter): Column = {
    val os = new ByteArrayOutputStream()
    filter.writeTo(os)
    ColumnBridge.column(
      BloomMightContainLong(
        ColumnBridge.expression(value),
        scala.collection.immutable.ArraySeq.unsafeWrapArray(os.toByteArray)))
  }
}
