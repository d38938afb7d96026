package graft.compact

import java.util.concurrent.{Callable, Executors, TimeUnit}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Orchestration (reference `compact()`, parquet_compactor.py:295-328):
  * one distributed listing, one distributed planning pass, then per-group
  * merge jobs submitted concurrently on a bounded pool — Spark's
  * scheduler interleaves their tasks across the executor, replacing the
  * reference's serial per-leaf Python loop. A failed group never stops
  * the run (SURVEY.md §2.3.9).
  */
object Compactor {

  def run(spark: SparkSession, root: String, cfg: CompactorConfig = CompactorConfig()): Seq[LeafResult] = {
    val files = FileIndexer.list(spark, root)
    val plans = Planner.plan(spark, files, cfg)
    runPlans(spark, plans, cfg)
  }

  def runPlans(spark: SparkSession, plans: Seq[LeafPlan], cfg: CompactorConfig): Seq[LeafResult] = {
    if (plans.isEmpty) return Seq.empty
    val pool = Executors.newFixedThreadPool(math.max(1, cfg.maxConcurrentLeaves))
    try {
      val futures = plans.map { p =>
        pool.submit(new Callable[LeafResult] {
          override def call(): LeafResult = Merger.mergeAndCommit(spark, p, cfg)
        })
      }
      futures.map(_.get())
    } finally {
      pool.shutdown()
      pool.awaitTermination(1, TimeUnit.MINUTES)
      ()
    }
  }
}
