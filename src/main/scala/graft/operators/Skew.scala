package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY.md §7.2 M4).
  *
  * AQE's skew-join splitting handles most cases at runtime; these
  * explicit forms are for the pathological key distributions AQE can't
  * fix (e.g. one key holding 30% of a 100 TB fact table, aggregated with
  * algebraic functions):
  *
  *   - [[saltedAgg]]: two-phase aggregation — partial per (key, salt)
  *     spreads one hot key over `numSalts` reducers, final re-agg merges.
  *   - [[saltedJoin]]: fact rows get a uniform salt, the (small) build
  *     side is replicated once per salt value, and the join key becomes
  *     (key, salt) — a hot key's rows land on `numSalts` tasks instead
  *     of one.
  *
  * Join results are identical to the unsalted forms regardless of salt
  * assignment; `rand(seed)` only spreads rows. For [[saltedAgg]],
  * bit-identity with a plain groupBy additionally requires the summed
  * column to be order-insensitive under addition — integral or DECIMAL
  * values, not fractional doubles (two-phase summation reorders
  * non-associative float additions).
  */
object Skew {

  /** Two-phase salted sum/count aggregation over `key`. `aggs` maps
    * output column name -> the column to sum. Counts are sums of 1s.
    */
  def saltedAgg(df: DataFrame, key: String, numSalts: Int, aggs: Map[String, Column]): DataFrame = {
    val partialCols = aggs.map { case (name, c) => sum(c).as(name) }.toSeq
    val finalCols = aggs.keys.map(name => sum(col(name)).as(name)).toSeq
    df.withColumn("_salt", (rand(42) * numSalts).cast("int"))
      .groupBy(col(key), col("_salt"))
      .agg(partialCols.head, partialCols.tail: _*)
      .groupBy(col(key))
      .agg(finalCols.head, finalCols.tail: _*)
  }

  /** Salted inner equi-join on `key`: `build` (the smaller side) is
    * replicated `numSalts` times. Use when the build side is too big to
    * broadcast but the probe side's key distribution is pathological.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String, numSalts: Int): DataFrame = {
    val saltedProbe = probe.withColumn("_salt", (rand(42) * numSalts).cast("int"))
    val replicatedBuild = build.withColumn("_salt", explode(sequence(lit(0), lit(numSalts - 1))))
    saltedProbe
      .join(replicatedBuild, Seq(key, "_salt"))
      .drop("_salt")
  }
}
