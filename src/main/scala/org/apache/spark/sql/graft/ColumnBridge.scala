package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge into the private[sql] Column <-> Expression converters, the
  * supported pattern for libraries that ship custom Catalyst expressions
  * (Spark 4 removed the public Column(expr) constructor).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The materialized RDD behind a `localCheckpoint`ed frame, if any.
    * `Dataset.localCheckpoint` wraps the checkpointed RDD in a LogicalRDD
    * leaf; its storage is NOT cache-manager-managed, so freeing it needs
    * the RDD itself. Lets callers release exactly the checkpoints THEY
    * created instead of diffing global persistent-RDD state (which can
    * sweep up a caller's lazily-registered persist — see
    * Dedup.connectedComponents).
    */
  def checkpointRdd(df: Dataset[_]): Option[RDD[_]] = df match {
    case d: org.apache.spark.sql.classic.Dataset[_] =>
      d.queryExecution.analyzed.collectFirst { case l: LogicalRDD => l.rdd }
    case _ => None
  }
}

/** Re-exposes `ImplicitCastInputTypes` to graft expressions.
  * `AbstractDataType` (the return element type of `inputTypes`) is
  * `private[sql]`, so an override outside the sql namespace can't even
  * name it; implementors supply concrete `DataType`s (public) and the
  * analyzer inserts implicit casts against them exactly as for built-in
  * functions (plain ExpectsInputTypes would only type-CHECK, not cast).
  */
trait ExpectsConcreteInputTypes
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  def concreteInputTypes: Seq[org.apache.spark.sql.types.DataType]
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    concreteInputTypes
}
