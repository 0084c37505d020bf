package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleave for multi-dimensional data layout.
  *
  * A table range-partitioned and sorted on ONE column prunes scans that
  * filter on that column and nothing else; a query filtering only on the
  * second dimension reads every file. Interleaving the bits of two
  * (rank-scaled) dimensions into one sort key bounds the per-file min/max
  * spread of BOTH columns at once, so parquet footer stats prune 2-D box
  * predicates regardless of which dimension the query constrains — the
  * standard layout trick (Delta/Iceberg `OPTIMIZE ZORDER BY`) for the
  * 100 TB store where rewriting the data per query pattern is not an
  * option.
  *
  * Pure bit arithmetic on longs (shift/and/or) — codegen'd built-ins,
  * engine-portable, no UDF. [[spread16]] is the classic mask-doubling
  * ladder: each step doubles the gap between payload bits.
  */
object LayoutOps {

  private val Steps = Seq(
    8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L, 1 -> 0x55555555L)

  /** Spread the low 16 bits of x into the even bit positions (bit i of
    * the input lands at bit 2i). Higher input bits are masked off — feed
    * rank-scaled values, not raw ids. */
  def spread16(x: Column): Column =
    Steps.foldLeft(x.bitwiseAND(lit(0xFFFFL))) { case (acc, (s, m)) =>
      acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(m))
    }

  /** 32-bit Morton key of two 16-bit dims: x in even bits, y in odd. */
  def zorder2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Oracle fragment of [[spread16]] — the same mask ladder in SQL. */
  def spread16Sql(x: String): String = {
    val a = s"($x & 65535)"
    Steps.foldLeft(a) { case (acc, (s, m)) =>
      s"(($acc | ($acc << $s)) & $m)"
    }
  }

  /** Oracle fragment of [[zorder2]]. */
  def zorder2Sql(x: String, y: String): String =
    s"(${spread16Sql(x)} | (${spread16Sql(y)} << 1))"
}
