package graft.ops

import java.nio.file.Path

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — multi-column data layout for file
  * skipping. Sorting by ONE column gives perfect min/max pruning on that
  * column and none on the others; interleaving the bits of k columns
  * gives each file a small k-dimensional tile, so parquet row-group
  * min/max statistics prune scans filtered on ANY of the z-ordered
  * columns (the Delta/Iceberg OPTIMIZE ZORDER idea, done with plain
  * column arithmetic + a range write).
  *
  * The z-value is pure codegen'd bit arithmetic (b·k shift-and-mask
  * terms) — no UDF, no shuffle of its own.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each column: bit i of column j
    * lands at position i·k + j. Inputs must be non-negative and fit in
    * `bits` bits (callers bucket/rank first — ranks, modulos, or
    * quantile bucket ids); bits·k must stay ≤ 63. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 1, "need at least one column")
    require(bits >= 1 && bits * k <= 63, s"bits*cols must fit a long (got $bits×$k)")
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Write `df` z-ordered on `zCols` (each pre-bucketed to `bits` bits):
    * range-partition on the z-value into `files` files, sort within each,
    * drop the helper column. Every output file covers one contiguous
    * Morton range = one small k-D tile. */
  def writeZOrdered(
      df: DataFrame, table: Path, zCols: Seq[Column],
      bits: Int, files: Int): Unit =
    df.withColumn("__z", zValue(zCols, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(table.toString)
}
