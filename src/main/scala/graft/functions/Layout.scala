package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout functions for write-time clustering (100 TB concern: file
  * skipping is won or lost at layout time).
  *
  * Z-order interleaves the low `bits` of two dimension values so rows
  * close in BOTH dimensions land close in the sort order — sorting by
  * z-value before writing gives parquet min/max row-group pruning on
  * either predicate column, where a plain sort only prunes its leading
  * column. Pure bitwise expressions, same formula an oracle reproduces.
  */
object Layout {

  /** Interleave the low `bits` of a (even positions) and b (odd). */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31)
    (0 until bits)
      .map { i =>
        val aBit = shiftright(a, i).bitwiseAND(lit(1L))
        val bBit = shiftright(b, i).bitwiseAND(lit(1L))
        shiftleft(aBit, 2 * i) + shiftleft(bBit, 2 * i + 1)
      }
      .reduce(_ + _)
  }

  /** The matching oracle-side SQL fragment (DuckDB syntax). */
  def zValueSql(a: String, b: String, bits: Int): String =
    (0 until bits)
      .map(i => s"((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")
}
