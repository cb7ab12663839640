package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout keys for multi-dimensional locality (Z-order / Morton
  * curves): interleaving the bits of two clustering columns gives a single
  * sort key under which points close in BOTH dimensions land close in the
  * file order — so min/max row-group stats prune 2-D range predicates that
  * a single-column sort can only prune on its leading column.
  *
  * Everything is closed-form long bit-arithmetic (the classic
  * spread-with-masks ladder), identical in any engine — the DuckDB oracle
  * reproduces the keys bit-for-bit (q65). At scale: compute `mortonKey`,
  * `repartitionByRange` on it, `sortWithinPartitions`, write — standard
  * Z-order clustering without a table-format dependency.
  */
object Layout {

  /** Spread the low 32 bits of a non-negative long across the even bit
    * positions of a 64-bit word (0b...b2b1b0 → 0b..0b2_0b1_0b0). */
  def spreadBits(c: Column): Column = {
    val m16 = lit(0x0000FFFF0000FFFFL)
    val m8 = lit(0x00FF00FF00FF00FFL)
    val m4 = lit(0x0F0F0F0F0F0F0F0FL)
    val m2 = lit(0x3333333333333333L)
    val m1 = lit(0x5555555555555555L)
    val x0 = c.bitwiseAND(lit(0xFFFFFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 16)).bitwiseAND(m16)
    val x2 = x1.bitwiseOR(shiftleft(x1, 8)).bitwiseAND(m8)
    val x3 = x2.bitwiseOR(shiftleft(x2, 4)).bitwiseAND(m4)
    val x4 = x3.bitwiseOR(shiftleft(x3, 2)).bitwiseAND(m2)
    x4.bitwiseOR(shiftleft(x4, 1)).bitwiseAND(m1)
  }

  /** Inverse of [[spreadBits]]: collect the even bit positions back into
    * the low 32 bits. */
  def unspreadBits(c: Column): Column = {
    val m1 = lit(0x5555555555555555L)
    val m2 = lit(0x3333333333333333L)
    val m4 = lit(0x0F0F0F0F0F0F0F0FL)
    val m8 = lit(0x00FF00FF00FF00FFL)
    val m16 = lit(0x0000FFFF0000FFFFL)
    val x0 = c.bitwiseAND(m1)
    val x1 = x0.bitwiseOR(shiftright(x0, 1)).bitwiseAND(m2)
    val x2 = x1.bitwiseOR(shiftright(x1, 2)).bitwiseAND(m4)
    val x3 = x2.bitwiseOR(shiftright(x2, 4)).bitwiseAND(m8)
    val x4 = x3.bitwiseOR(shiftright(x3, 8)).bitwiseAND(m16)
    x4.bitwiseOR(shiftright(x4, 16)).bitwiseAND(lit(0xFFFFFFFFL))
  }

  /** Morton (Z-order) key of two non-negative 31-bit coordinates: bits of
    * `a` on even positions, bits of `b` on odd. Result is a non-negative
    * long; ordering by it is the Z-curve traversal of the (a, b) grid. */
  def mortonKey(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** The (a, b) coordinates back out of a morton key. */
  def mortonDecode(key: Column): (Column, Column) =
    (unspreadBits(key), unspreadBits(shiftright(key, 1)))
}
