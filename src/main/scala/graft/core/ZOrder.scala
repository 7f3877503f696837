package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values as a pure Column expression — the
  * multi-dimensional clustering key behind `TxTable.compactZOrdered`
  * (the OPTIMIZE ZORDER BY analog).
  *
  * Each input column is mapped to a `bitsPerCol`-bit rank by linear
  * scaling over its [min, max] (driver-supplied — one tiny agg, not a
  * shuffle), then the ranks' bits are interleaved. Sorting by the
  * result places rows so that EVERY input dimension has locality in
  * every file: range-split files get tight min/max zone maps on ALL
  * the z-ordered columns, where a lexicographic sort gives tight
  * bounds only on the leading one.
  *
  * Linear scaling assumes value distributions without extreme skew;
  * for heavy skew, pre-rank the column (e.g. percent_rank into a
  * materialized column) and z-order that instead. Entirely built from
  * codegen'd built-ins (floor/shift/bitwise) — no UDF in the path.
  */
object ZOrder {

  /** Interleaved z-value of `cols` (numeric/date/timestamp), each
    * normalized by its `(min, max)`. `bitsPerCol * cols.length` must
    * fit in a long (≤ 62). */
  def zvalue(cols: Seq[Column], mins: Seq[Double], maxs: Seq[Double],
      bitsPerCol: Int = 8): Column = {
    require(cols.nonEmpty && cols.length == mins.length && cols.length == maxs.length,
      "zvalue needs one (min, max) per column")
    require(bitsPerCol * cols.length <= 62,
      s"bitsPerCol=$bitsPerCol × ${cols.length} cols exceeds a long")
    val n = cols.length
    val top = (1L << bitsPerCol) - 1
    val ranks = cols.zipWithIndex.map { case (c, i) =>
      val span = math.max(maxs(i) - mins(i), Double.MinPositiveValue)
      val scaled = floor((c.cast("double") - mins(i)) / span * top)
      // nulls sort first: rank 0 (same as the minimum — sound, just loose)
      coalesce(least(lit(top), greatest(lit(0L), scaled.cast("long"))), lit(0L))
    }
    val terms = for {
      bit <- 0 until bitsPerCol
      (r, j) <- ranks.zipWithIndex
    } yield shiftleft(shiftright(r, bit).bitwiseAND(lit(1L)), bit * n + j)
    terms.reduce(_ bitwiseOR _)
  }
}
