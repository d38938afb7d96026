package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout.
  *
  * Multi-dimensional clustering for scan pruning: interleaving the low
  * bits of k scalar keys gives a 1-D sort order in which points close in
  * Z-value are close in EVERY key dimension. Files written in Z-order
  * therefore carry tight per-file min/max ranges on ALL the interleaved
  * columns at once, so a reader filtering on any of them skips most
  * files — where a linear sort only prunes its leading column. This is
  * the layout step a 100 TB compactor runs between merge and write; the
  * reference (parquet_compactor.py:213-218) writes merged files in
  * arrival order and leaves multi-column pruning on the table.
  *
  * The code is pure integer arithmetic over built-in expressions
  * (shiftright / bitwiseAND / multiply-add), so it stays inside
  * whole-stage codegen and pushes through any scan unscathed.
  */
object ZOrder {

  /** Morton code interleaving the low `bits` bits of each column: bit
    * `j` of `cols(c)` lands at output position `j * cols.length + c`.
    * Inputs should be non-negative and < 2^bits (callers bucket with
    * `% (1 << bits)` or a width-scaled quantile rank first); out-of-
    * contract values are clamped defensively rather than silently
    * interleaving sign/overflow garbage — negatives floor to 0 and
    * over-wide values wrap mod 2^bits, so a stray key degrades local
    * clustering instead of destroying the whole curve. NULL keys also
    * land at coordinate 0 (`greatest(NULL, 0)` = 0): a layout key needs
    * a total order, and co-clustering NULL rows with the lowest keys is
    * a deliberate placement choice, not silent corruption — callers who
    * need NULLs segregated should filter or coalesce to a sentinel
    * before layout.
    * Total width `bits * cols.length` must fit a signed long.
    */
  def mortonCode(bits: Int, cols: Column*): Column = {
    require(cols.nonEmpty, "mortonCode needs at least one column")
    require(bits >= 1 && bits * cols.size <= 62, s"bits*cols must fit a long, got $bits*${cols.size}")
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      v = greatest(c.cast("long"), lit(0L)).bitwiseAND(lit((1L << bits) - 1))
      j <- 0 until bits
    } yield shiftright(v, j).bitwiseAND(lit(1L)) * lit(1L << (j * cols.size + ci))
    terms.reduce(_ + _)
  }

  /** Re-layout `df` into `numFiles` output tasks clustered on the
    * Z-curve over `cols`: one range shuffle on the Morton code, then an
    * in-partition sort so row groups inside each file stay clustered
    * too. Write the result with a plain `.write.parquet` — each task
    * emits one Z-contiguous file.
    */
  def layout(df: DataFrame, numFiles: Int, bits: Int, cols: Column*): DataFrame = {
    val z = mortonCode(bits, cols: _*)
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
  }
}
