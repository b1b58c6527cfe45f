package graft.functions

import java.nio.ByteBuffer

import graft.operators.IndicatorAggregator.{emptyBuf, finishBuf, mergeBufs, mergeValues, Buf}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ExpectsConcreteInputTypes
import org.apache.spark.sql.types._

/** Native single-pass SMA/RSI/VWAP aggregate — the TypedImperativeAggregate
  * form of operators.IndicatorAggregator (same Buf algebra, byte-for-byte
  * the same arithmetic, so the two forms are interchangeable and the specs
  * pin them equal).
  *
  * Why a third physical form: the typed Aggregator path materializes a
  * Point case class per input row and round-trips the buffer through the
  * product encoder at every partial-aggregation boundary. This expression
  * reads the four input fields straight off the InternalRow and keeps the
  * buffer as a live JVM object inside ObjectHashAggregate, serializing
  * (one compact ByteBuffer, ~16 + 24*(period+1) bytes) only when a
  * partial buffer crosses the shuffle — the same contract percentile_approx
  * uses. Serialized size is bounded by `period`, so map-side combine ships
  * O(period) bytes per group regardless of row count.
  */
case class IndicatorAggExpr(
    ts: Expression, id: Expression, price: Expression, volume: Expression,
    period: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Buf] with ExpectsConcreteInputTypes {

  // period sizes the tail buffers; 0 or negative would hand mergeValues a
  // negative arraycopy length deep inside the agg loop — fail at plan time.
  require(period > 0, s"indicator_summary period must be > 0, got $period")

  override def children: Seq[Expression] = Seq(ts, id, price, volume)
  // The analyzer inserts implicit casts to these, so INT/DECIMAL inputs
  // arrive as LONG/DOUBLE instead of class-casting at runtime.
  override def concreteInputTypes: Seq[DataType] =
    Seq(LongType, LongType, DoubleType, DoubleType)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("sma", DoubleType, nullable = false),
    StructField("rsi", DoubleType, nullable = false),
    StructField("vwap", DoubleType, nullable = false),
    StructField("period", IntegerType, nullable = false),
    StructField("n_rows", LongType, nullable = false)))
  override def prettyName: String = "indicator_summary"

  override def createAggregationBuffer(): Buf = emptyBuf

  override def update(b: Buf, input: InternalRow): Buf = {
    // SQL agg null semantics: a null in ANY input skips the whole row. A
    // partially-null row must not contribute — unboxing a null id/price/
    // volume to 0/0.0 would silently corrupt SMA/RSI/VWAP.
    val tsV = ts.eval(input)
    val idV = id.eval(input)
    val priceV = price.eval(input)
    val volumeV = volume.eval(input)
    if (tsV == null || idV == null || priceV == null || volumeV == null) b
    else mergeValues(b,
      tsV.asInstanceOf[Long],
      idV.asInstanceOf[Long],
      priceV.asInstanceOf[Double],
      volumeV.asInstanceOf[Double],
      period)
  }

  override def merge(a: Buf, b: Buf): Buf = mergeBufs(a, b, period)

  override def eval(b: Buf): Any = {
    val o = finishBuf(b, period)
    InternalRow(o.sma, o.rsi, o.vwap, o.period, o.n_rows)
  }

  override def serialize(b: Buf): Array[Byte] = {
    val m = b.ts.length
    val bb = ByteBuffer.allocate(8 * 3 + 4 + 24 * m)
    bb.putDouble(b.pv).putDouble(b.v).putLong(b.n).putInt(m)
    var i = 0
    while (i < m) { bb.putLong(b.ts(i)); i += 1 }
    i = 0
    while (i < m) { bb.putLong(b.ids(i)); i += 1 }
    i = 0
    while (i < m) { bb.putDouble(b.prices(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val pv = bb.getDouble; val v = bb.getDouble; val n = bb.getLong
    val m = bb.getInt
    val ts = new Array[Long](m); val ids = new Array[Long](m)
    val ps = new Array[Double](m)
    var i = 0
    while (i < m) { ts(i) = bb.getLong; i += 1 }
    i = 0
    while (i < m) { ids(i) = bb.getLong; i += 1 }
    i = 0
    while (i < m) { ps(i) = bb.getDouble; i += 1 }
    Buf(pv, v, n, ts, ids, ps)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): IndicatorAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): IndicatorAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): IndicatorAggExpr =
    copy(ts = newChildren(0), id = newChildren(1),
      price = newChildren(2), volume = newChildren(3))
}

object IndicatorAggExpr {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column form: struct(sma, rsi, vwap, period, n_rows). */
  def indicatorSummary(
      ts: Column, id: Column, price: Column, volume: Column,
      period: Int): Column =
    ColumnBridge.column(
      IndicatorAggExpr(
        ColumnBridge.expression(ts), ColumnBridge.expression(id),
        ColumnBridge.expression(price), ColumnBridge.expression(volume),
        period).toAggregateExpression())
}
