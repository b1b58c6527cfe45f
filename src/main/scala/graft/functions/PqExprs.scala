package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Product-quantization expressions (round 19 — the PQ/ADC codec for
  * the IVF estate): int8 scalar quantization ([[graft.operators.Similarity.quantizeEmbeddings]])
  * stores one byte PER DIMENSION (~4x vs float32); PQ stores one byte
  * per SUBSPACE — m bytes for a d-dim vector, d/m bytes-per-byte better
  * (dim 64 at m=8: 8 bytes/vector, 32x vs float32, 64x vs the float64
  * arrays the estate serves) — which at a 100 TB embedding estate is
  * the difference between an in-RAM stage-1 working set and a disk-bound
  * one. Scoring is ADC (asymmetric distance computation): the QUERY
  * stays exact; per query one lookup table of <q_sub, codeword> partial
  * inner products is built driver-side (m x ksub doubles — KBs), and a
  * candidate's approximate score is m table lookups, no arithmetic on
  * the vector at all. After Jegou/Douze/Schmid, "Product Quantization
  * for Nearest Neighbor Search" (TPAMI 2011).
  *
  * Both expressions follow the [[VecExprs.NearestCentroids]] pattern:
  * the trained model rides INSIDE one plan node (one compiled loop per
  * row), codegen via the compute-method reference — never a UDF, never
  * ksub x m literal subtrees.
  */
object PqExprs {

  private def toVec(arr: ArrayData): Array[Double] = {
    val n = arr.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      out(i) = arr.getDouble(i)
      i += 1
    }
    out
  }

  /** Encode an array<double> vector into its m-byte PQ code: subspace s
    * covers dims [s*dsub, (s+1)*dsub) and byte s is the index (0-based,
    * < ksub <= 256) of the nearest codeword by squared L2 — ties toward
    * the smaller code, the [[VecExprs.NearestCentroids]] convention.
    * Dimension drift (vector length != m*dsub) yields NULL, never a
    * partial-distance garbage code.
    */
  case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
      extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "pq_encode"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"pq_encode expects array<double>, got ${other.catalogString}")
      }

    @transient private lazy val books: Array[Array[Array[Double]]] =
      codebooks.map(_.map(_.toArray).toArray).toArray
    @transient private lazy val m: Int = books.length
    @transient private lazy val dsub: Int =
      if (m == 0 || books(0).isEmpty) 0 else books(0)(0).length

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])

    def compute(arr: ArrayData): Array[Byte] = {
      val v = toVec(arr)
      if (v == null || m == 0 || dsub == 0 || v.length != m * dsub)
        return null
      val out = new Array[Byte](m)
      var s = 0
      while (s < m) {
        val book = books(s)
        val base = s * dsub
        var best = 0
        var bd = Double.MaxValue
        var c = 0
        while (c < book.length) {
          val cw = book(c)
          var d = 0.0
          var i = 0
          while (i < dsub) {
            val x = v(base + i) - cw(i); d += x * x; i += 1
          }
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        out(s) = best.toByte
        s += 1
      }
      out
    }

    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj(
        "pqEncode", this, classOf[PqEncode].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"""
           |${ev.value} = $ref.compute($c);
           |if (${ev.value} == null) { ${ev.isNull} = true; }
         """.stripMargin)
    }

    override protected def withNewChildInternal(
        newChild: Expression): PqEncode = copy(child = newChild)
  }

  /** ADC table lookup: for an m-byte PQ `code` and a per-query `lut` of
    * m*ksub doubles (subspace-major), returns
    * Σ_s lut[s*ksub + code[s]] — the approximate inner product when the
    * lut holds <q_sub, codeword> partials, or the reconstructed squared
    * norm when it holds codeword self-dots (the SAME expression serves
    * both, the probe builds both tables). NULL on a length mismatch
    * (a code from a different m/ksub configuration must not score).
    */
  case class PqAdcScore(left: Expression, right: Expression, ksub: Int)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "pq_adc_score"
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (BinaryType, ArrayType(DoubleType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"pq_adc_score expects (binary, array<double>), got " +
            s"(${l.catalogString}, ${r.catalogString})")
      }

    override def nullSafeEval(code: Any, lut: Any): Any =
      compute(code.asInstanceOf[Array[Byte]], lut.asInstanceOf[ArrayData])

    def compute(code: Array[Byte], lut: ArrayData): Any = {
      if (code == null || lut == null ||
        lut.numElements() != code.length * ksub) return null
      var s = 0.0
      var i = 0
      while (i < code.length) {
        val idx = i * ksub + (code(i) & 0xFF)
        if (lut.isNullAt(idx)) return null
        s += lut.getDouble(idx)
        i += 1
      }
      s
    }

    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj(
        "pqAdcScore", this, classOf[PqAdcScore].getName)
      nullSafeCodeGen(ctx, ev, (c, l) =>
        s"""
           |Object r = $ref.compute($c, $l);
           |if (r == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = ((java.lang.Double) r).doubleValue(); }
         """.stripMargin)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): PqAdcScore =
      copy(left = newLeft, right = newRight)
  }

  // Column-level API

  def pqEncode(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(vec), codebooks))

  def pqAdcScore(code: Column, lut: Column, ksub: Int): Column =
    ColumnBridge.column(PqAdcScore(
      ColumnBridge.expression(code), ColumnBridge.expression(lut), ksub))
}
