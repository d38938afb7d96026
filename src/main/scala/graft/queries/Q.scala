package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator demo: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
  * over the same parquet tables. `oracle = None` → the driver records a
  * weaker rows-only check (used for ops DuckDB can't mirror, e.g. HLL
  * sketches whose estimates are engine-specific).
  *
  * Hash-match discipline (SURVEY.md §7.6): every oracled query ends in a
  * total ORDER BY with a unique tiebreaker, aliases every computed column
  * identically on both sides, and rounds derived doubles.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

object Q {
  def apply(name: String, sql: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(sql))
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)

  /** Temp-view scaffolding for SQL-bodied queries: register the views,
    * build the frame, drop the views. Safe because `spark.sql` resolves
    * view references at ANALYSIS time — the returned (lazy) frame holds
    * the resolved child plans, not the view names — and leak-proof
    * because the drop runs even when `body` throws (a leaked view would
    * shadow the next query's table of the same name).
    */
  def withTempViews(s: SparkSession)(views: (String, DataFrame)*)(body: => DataFrame): DataFrame = {
    views.foreach { case (n, df) => df.createOrReplaceTempView(n) }
    try body
    finally views.foreach { case (n, _) => s.catalog.dropTempView(n); () }
  }
}
