package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-column clustered layouts —
  * the lakehouse data-skipping technique (Delta/Iceberg Z-ORDER): rows
  * sorted by the interleaved bits of two key columns land in files whose
  * min/max ranges are tight in BOTH dimensions, so a scan filtered on
  * either column (or a rectangle in both) prunes most files, where a
  * lexicographic sort only prunes on the leading column.
  *
  * Pure bit arithmetic on codegen'd built-ins (shiftleft / bitwise
  * and-or), the classic 5-step magic-number spread — no UDF, ANSI-safe
  * (bit ops never overflow-error), and exactly replicable in any engine
  * with 64-bit integer bit operators, which is what the q78 oracle does.
  *
  * Inputs must be in [0, 2^31): two 31-bit values interleave into 62
  * bits, keeping the z-value positive (a sign flip would corrupt range
  * ordering). Rescale wider domains first (e.g. ns timestamps: subtract
  * the epoch floor and bucket).
  */
object ZOrder {

  /** Spreads the low 31 bits of x to the even bit positions 0,2,..,60. */
  private def spread(x: Column): Column = {
    val s1 = x.bitwiseOR(shiftleft(x, 16))
      .bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 8))
      .bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 4))
      .bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val s4 = s3.bitwiseOR(shiftleft(s3, 2))
      .bitwiseAND(lit(0x3333333333333333L))
    s4.bitwiseOR(shiftleft(s4, 1))
      .bitwiseAND(lit(0x5555555555555555L))
  }

  /** 62-bit Morton code of two 31-bit non-negative values: x on even bit
    * positions, y on odd. Out-of-range inputs fail fast (a silently
    * truncated key would interleave wrong and scatter the layout).
    */
  def zValue(x: Column, y: Column): Column = {
    val lim = 1L << 31
    val checked = (c: Column) =>
      when(c.isNull || c < 0 || c >= lim,
        raise_error(lit(s"zValue: input outside [0, 2^31)")))
        .otherwise(c.cast("long"))
    spread(checked(x)).bitwiseOR(shiftleft(spread(checked(y)), 1))
  }
}
