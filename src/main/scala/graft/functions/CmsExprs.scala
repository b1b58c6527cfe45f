package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.CountMinSketch

/** Count-Min-Sketch point-estimate probe as a codegen'd Catalyst
  * expression — the frequency sibling of [[BloomExprs]].
  *
  * Scale rationale: exact token frequencies need a groupBy over the full
  * token stream (10^13+ rows at 100 TB). A CMS of depth d × width w
  * absorbs the whole stream through map-side merges into d*w longs, and
  * probing it is a map-side lookup — so heavy-hitter detection touches
  * only the (vocabulary-sized) distinct token set, never re-shuffling
  * the stream. Spark's CountMinSketchImpl sizes w = ceil(2/eps) and
  * d = ceil(log2(1/delta)) — the Markov form of the guarantee (each row
  * overshoots by >= eps*N with probability <= 1/2, so the min over d
  * rows fails with probability <= 2^-d = delta), NOT the textbook
  * w = ceil(e/eps)/P<=e^-d variant; size memory from 2/eps. The
  * estimate is one-sided: never below the true count, above it by at
  * most eps*N with probability 1-delta per probe (q82 gates both
  * directions).
  */
object CmsExprs {

  /** Point estimate over Spark's own `org.apache.spark.util.sketch
    * .CountMinSketch` (the public sketch `df.stat.countMinSketch`
    * builds, so build and probe share one hashing scheme). The sketch's
    * `writeTo` bytes ride the serialized plan; executors deserialize once
    * per task via `addReferenceObj` and probe per row. The bytes are held
    * as an IndexedSeq, not Array: a case-class Array field compares by
    * reference, which would defeat semanticEquals/common-subexpression
    * elimination for two probes of the same sketch.
    */
  case class CmsEstimateLong(child: Expression, sketchBytes: IndexedSeq[Byte])
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "cms_estimate_long"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case LongType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"cms_estimate_long requires bigint, got $other")
      }

    @transient private lazy val sketch: CountMinSketch =
      CountMinSketch.readFrom(new ByteArrayInputStream(sketchBytes.toArray))

    def estimate(v: Long): Long = sketch.estimateCount(v)

    override def nullSafeEval(input: Any): Any =
      estimate(input.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("cmsProbe", this,
        classOf[CmsEstimateLong].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.estimate($c);")
    }

    override protected def withNewChildInternal(
        newChild: Expression): CmsEstimateLong =
      copy(child = newChild)
  }

  /** Column form: the CMS frequency estimate for `value` (never an
    * underestimate). Serializes the sketch once at plan-construction time.
    */
  def cmsEstimate(value: Column, sketch: CountMinSketch): Column = {
    val os = new ByteArrayOutputStream()
    sketch.writeTo(os)
    ColumnBridge.column(
      CmsEstimateLong(
        ColumnBridge.expression(value),
        scala.collection.immutable.ArraySeq.unsafeWrapArray(os.toByteArray)))
  }
}
