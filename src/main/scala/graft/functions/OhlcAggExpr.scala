package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ExpectsConcreteInputTypes
import org.apache.spark.sql.types._

/** Native single-pass OHLC candle aggregate.
  *
  * Why not `min_by/max_by(price, struct(ts, id))`: a struct-typed extremum
  * ordering is not a mutable agg-buffer type, so Spark plans the whole
  * aggregation as SortAggregate — every map task sorts its partition on
  * the grouping keys before combining. This expression keeps the candle
  * state as nine primitives in a live JVM object inside
  * ObjectHashAggregate (the percentile_approx contract): no sort anywhere,
  * map-side combine ships one 72-byte buffer per (group, bucket) per
  * task — the aggregation shape a 100 TB tick archive needs.
  *
  * Open/close are selected by the lexicographic (ord1, ord2) minimum /
  * maximum — the caller passes a unique-per-row tuple (e.g. ts, trade_id)
  * so the result is total-order deterministic. Prices are carried, never
  * computed on, so all four candle fields are exact row values. SQL agg
  * null semantics: a null in ANY input skips the whole row.
  */
case class OhlcAggExpr(
    ord1: Expression, ord2: Expression, price: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[OhlcAggExpr.Buf]
    with ExpectsConcreteInputTypes {

  import OhlcAggExpr.Buf

  override def children: Seq[Expression] = Seq(ord1, ord2, price)
  override def concreteInputTypes: Seq[DataType] =
    Seq(LongType, LongType, DoubleType)
  // null only for the all-inputs-null group; candle fields are then absent
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("open", DoubleType, nullable = false),
    StructField("high", DoubleType, nullable = false),
    StructField("low", DoubleType, nullable = false),
    StructField("close", DoubleType, nullable = false)))
  override def prettyName: String = "ohlc_bar"

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(b: Buf, input: InternalRow): Buf = {
    val o1 = ord1.eval(input)
    val o2 = ord2.eval(input)
    val p = price.eval(input)
    if (o1 == null || o2 == null || p == null) b
    else {
      b.observe(o1.asInstanceOf[Long], o2.asInstanceOf[Long],
        p.asInstanceOf[Double])
      b
    }
  }

  override def merge(a: Buf, b: Buf): Buf = { a.mergeFrom(b); a }

  override def eval(b: Buf): Any =
    if (b.n == 0L) null
    else InternalRow(b.open, b.high, b.low, b.close)

  override def serialize(b: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * 9)
    bb.putLong(b.n)
      .putLong(b.openOrd1).putLong(b.openOrd2).putDouble(b.open)
      .putLong(b.closeOrd1).putLong(b.closeOrd2).putDouble(b.close)
      .putDouble(b.high).putDouble(b.low)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new Buf()
    b.n = bb.getLong
    b.openOrd1 = bb.getLong; b.openOrd2 = bb.getLong; b.open = bb.getDouble
    b.closeOrd1 = bb.getLong; b.closeOrd2 = bb.getLong; b.close = bb.getDouble
    b.high = bb.getDouble; b.low = bb.getDouble
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): OhlcAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): OhlcAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): OhlcAggExpr =
    copy(ord1 = newChildren(0), ord2 = newChildren(1),
      price = newChildren(2))
}

object OhlcAggExpr {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Mutable candle state: count + (ord, price) extrema + high/low.
    * Lexicographic compare on (ord1, ord2) picks open (min) and close
    * (max); high/low are plain price extrema.
    */
  final class Buf {
    var n: Long = 0L
    var openOrd1: Long = 0L; var openOrd2: Long = 0L; var open: Double = 0.0
    var closeOrd1: Long = 0L; var closeOrd2: Long = 0L; var close: Double = 0.0
    var high: Double = 0.0; var low: Double = 0.0

    @inline private def before(a1: Long, a2: Long, b1: Long, b2: Long) =
      a1 < b1 || (a1 == b1 && a2 < b2)

    def observe(o1: Long, o2: Long, p: Double): Unit = {
      if (n == 0L) {
        openOrd1 = o1; openOrd2 = o2; open = p
        closeOrd1 = o1; closeOrd2 = o2; close = p
        high = p; low = p
      } else {
        if (before(o1, o2, openOrd1, openOrd2)) {
          openOrd1 = o1; openOrd2 = o2; open = p
        }
        if (before(closeOrd1, closeOrd2, o1, o2)) {
          closeOrd1 = o1; closeOrd2 = o2; close = p
        }
        if (p > high) high = p
        if (p < low) low = p
      }
      n += 1L
    }

    def mergeFrom(o: Buf): Unit = {
      if (o.n > 0L) {
        if (n == 0L) {
          n = o.n
          openOrd1 = o.openOrd1; openOrd2 = o.openOrd2; open = o.open
          closeOrd1 = o.closeOrd1; closeOrd2 = o.closeOrd2; close = o.close
          high = o.high; low = o.low
        } else {
          if (before(o.openOrd1, o.openOrd2, openOrd1, openOrd2)) {
            openOrd1 = o.openOrd1; openOrd2 = o.openOrd2; open = o.open
          }
          if (before(closeOrd1, closeOrd2, o.closeOrd1, o.closeOrd2)) {
            closeOrd1 = o.closeOrd1; closeOrd2 = o.closeOrd2; close = o.close
          }
          if (o.high > high) high = o.high
          if (o.low < low) low = o.low
          n += o.n
        }
      }
    }
  }

  /** Column form: struct(open, high, low, close). */
  def ohlcBar(ord1: Column, ord2: Column, price: Column): Column =
    ColumnBridge.column(
      OhlcAggExpr(
        ColumnBridge.expression(ord1), ColumnBridge.expression(ord2),
        ColumnBridge.expression(price)).toAggregateExpression())
}
