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

  /** Skew-proof EXACT distinct count per key (ROADMAP 38). Partial
    * (map-side) aggregation fixes skew for algebraic functions, but a
    * per-key DISTINCT still funnels every distinct value of a hot key
    * through one reducer in the final phase. Salting by a HASH OF THE
    * VALUE fixes it exactly: distinct values of a key partition
    * disjointly over `numSalts` sub-groups, so the per-sub-group
    * distinct counts SUM to the true count — no double counting by
    * construction (same value ⇒ same salt), no randomness. Both
    * phases are ordinary hash aggregates; the hot key's state is
    * 1/numSalts per reducer at any scale.
    */
  def saltedDistinct(df: DataFrame, key: String, value: String, numSalts: Int): DataFrame =
    df.withColumn("_vsalt", pmod(xxhash64(col(value)), lit(numSalts.toLong)))
      .groupBy(col(key), col("_vsalt"))
      .agg(count_distinct(col(value)).as("_pc"))
      .groupBy(col(key))
      .agg(sum("_pc").as("n_distinct"))

  /** Skew-proof collect_set per key, deterministically ordered. The
    * same value-hash salting as [[saltedDistinct]]: per-(key, salt)
    * partial sets are disjoint across salts, so concatenation is the
    * exact union; `sort_array` makes the output a pure function of the
    * data (a plain collect_set's order is partitioning-dependent —
    * unusable in a hash-compared result anyway). The hot key's largest
    * single-reducer state drops from the whole set to 1/numSalts of
    * it.
    */
  def saltedCollectSet(df: DataFrame, key: String, value: String, numSalts: Int): DataFrame =
    df.withColumn("_vsalt", pmod(xxhash64(col(value)), lit(numSalts.toLong)))
      .groupBy(col(key), col("_vsalt"))
      .agg(collect_set(col(value)).as("_ps"))
      .groupBy(col(key))
      .agg(sort_array(flatten(collect_list(col("_ps")))).as("values"))

  /** Hot-key detection for [[autoSkewJoin]] (ROADMAP 34): one
    * `approx_top_k` sketch pass over the probe side returns the keys
    * estimated to hold more than `hotShare` of its rows. The sketch is
    * mergeable (partial aggregation — the pass is one map-side-combined
    * job, never a key shuffle), tracks at most `maxTracked` candidates,
    * and its result is driver-sized by construction: at most
    * 1/hotShare keys CAN exceed the share, so the collected list is
    * bounded regardless of key cardinality. Estimates near the
    * threshold may flip with partitioning — harmless, because
    * [[autoSkewJoin]]'s result is identical whichever side of the
    * split a key lands on (detection only ROUTES).
    */
  def hotKeys(probe: DataFrame, key: String, hotShare: Double = 0.05, maxTracked: Int = 64): Seq[Any] = {
    require(hotShare > 0.0 && hotShare < 1.0, s"hotShare must be in (0,1): $hotShare")
    val row = probe.agg(
      expr(s"approx_top_k_estimate(approx_top_k_accumulate(`$key`, $maxTracked), $maxTracked)").as("tk"),
      count(lit(1)).as("total"),
    ).head()
    val total = row.getLong(1)
    if (total == 0L) return Seq.empty
    val cut = hotShare * total
    // drop nulls explicitly: a NULL element in an isin() list makes
    // NOT-IN three-valued (NULL for every non-matching row), which would
    // silently empty the cold side of [[autoSkewJoin]] — today
    // approx_top_k happens to ignore nulls, but that's a Spark internal
    // we refuse to depend on
    row.getSeq[org.apache.spark.sql.Row](0)
      .collect { case r if r.get(1).asInstanceOf[Number].longValue() > cut => r.get(0) }
      .filter(_ != null)
  }

  /** Differentiated skew join: [[saltedJoin]] and AQE both treat every
    * key alike; this one detects the hot keys from a one-pass sketch
    * ([[hotKeys]]) and routes them differently — hot probe rows join
    * against a BROADCAST of the build rows for those few keys (no hot
    * row ever shuffles), cold rows take the normal shuffle join. The
    * union is row-identical to the plain join (detection only routes),
    * which the `join_skew_auto` oracle pins.
    *
    * Scale shape: the broadcast side is `|hot keys| × build rows per
    * key` — bounded by 1/hotShare keys, so it stays driver-sized even
    * when `build` itself is far too big to broadcast; the cold shuffle
    * has its heaviest keys removed, so no reducer owns more than
    * hotShare of the probe. This is the production form of what
    * `join_skew_salted` hand-configures: nothing to tune per dataset —
    * the sketch finds the keys.
    */
  def autoSkewJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      hotShare: Double = 0.05,
      maxTracked: Int = 64,
  ): DataFrame = {
    val hot = hotKeys(probe, key, hotShare, maxTracked)
    if (hot.isEmpty) probe.join(build, Seq(key))
    else {
      val hotJoin = probe.where(col(key).isin(hot: _*))
        .join(broadcast(build.where(col(key).isin(hot: _*))), Seq(key))
      val coldJoin = probe.where(!col(key).isin(hot: _*) || col(key).isNull)
        .join(build, Seq(key))
      hotJoin.unionByName(coldJoin)
    }
  }
}
