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

  /** Per-column quantile-rank bucket columns for arbitrary-range keys:
    * each column maps to `#{quantile boundaries ≤ value}` — at most
    * 2^bits − 1 boundaries, so ranks stay inside [0, 2^bits) and never
    * trip [[mortonCode]]'s wrap —
    * so [[mortonCode]]'s wrap-mod-2^bits contract holds for ANY numeric
    * key range — a raw timestamp or 64-bit id interleaved directly would
    * wrap into noise and silently destroy clustering. Boundaries come
    * from ONE `approxQuantile` pass over all columns together (the same
    * sample-sketch cost class as `repartitionByRange`'s partitioner,
    * which is already in the layout path); lookup is O(log 2^bits)
    * binary search inside whole-stage codegen
    * ([[graft.functions.SortedBucket]]).
    *
    * A column the sketch finds constant (no distinct boundaries) ranks
    * as 0 everywhere — it contributes nothing to the curve, which is the
    * right degeneration. Heavy value repetition simply yields fewer
    * distinct boundaries: ranks stay dense, ties share a bucket.
    */
  def rankBucketColumns(
      df: DataFrame,
      bits: Int,
      colNames: Seq[String],
      relativeError: Double = 0.001,
  ): Seq[Column] = {
    require(colNames.nonEmpty, "rankBucketColumns needs at least one column")
    require(bits >= 1 && bits <= 16, s"rank bucketing wants 1..16 bits (2^bits quantiles), got $bits")
    val b = 1 << bits
    // prob 0 rides along to learn the global min: a boundary at (or
    // below) the minimum splits nothing — it offsets every rank by one —
    // so it is dropped, which also makes a CONSTANT column rank 0
    // everywhere (contributing nothing to the curve) instead of a
    // uniform 1.
    val probs = (0.0 +: (1 until b).map(_.toDouble / b)).toArray
    val doubled = df.select(colNames.map(n => col(n).cast("double").as(n)): _*)
    val quantiles = doubled.stat.approxQuantile(colNames.toArray, probs, relativeError)
    colNames.lazyZip(quantiles).map { (name, qs) =>
      val bounds =
        if (qs.isEmpty) Array.empty[Double] // all-null column: no sketch at all
        else qs.tail.filterNot(_.isNaN).distinct.sorted.dropWhile(_ <= qs.head)
      if (bounds.isEmpty) lit(0L)
      else org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.SortedBucket(
          org.apache.spark.sql.graft.ColumnBridge.expression(col(name).cast("double")),
          bounds,
        ),
      )
    }
  }

  /** [[layout]] over quantile ranks instead of raw values — the robust
    * form for keys of arbitrary range/skew. One extra pass (the
    * quantile sketch) + the same single range shuffle.
    */
  def layoutByRank(df: DataFrame, numFiles: Int, bits: Int, colNames: Seq[String]): DataFrame =
    layout(df, numFiles, bits, rankBucketColumns(df, bits, colNames): _*)
}
