package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Scheduled upkeep for the persisted index stores (ROADMAP 63) — the
  * run-loop discipline the table compactor applies to its leaves
  * (gc/expire/checkpoint), applied to [[IvfStore]] and [[BandsStore]]:
  * appends fragment list/band partitions into small files, and data
  * drift skews a frozen IVF codebook's lists. One maintenance entry
  * evaluates both dials and acts only when a threshold trips, so it is
  * safe (and cheap) to run on every ingest cycle:
  *
  *   - retrain when the max/mean list-size ratio exceeds `skewFactor`
  *     ([[IvfStore.needsRetrain]]'s trigger), preserving the store's
  *     current centroid count;
  *   - compact when the store carries more than `smallFileFactor`
  *     parquet files per partition ([[IvfStore.compactLists]] /
  *     [[BandsStore.compact]] fold them to one per partition).
  *
  * Retrain is evaluated FIRST: a retrain rewrites every list anyway, so
  * compaction is re-checked against the post-retrain layout instead of
  * folding files the retrain is about to supersede. All actions carry
  * their store's own crash contract (versioned/pointer-last for IVF;
  * offline-rebuildable swap for bands).
  */
object StoreMaintenance {

  final case class Report(path: String, kind: String, retrained: Boolean, compacted: Boolean)

  private def fragmented(files: Long, partitions: Long, smallFileFactor: Double): Boolean =
    partitions > 0 && files.toDouble > smallFileFactor * partitions

  /** Evaluate and act on one IVF store. */
  def maintainIvf(
      spark: SparkSession,
      path: String,
      smallFileFactor: Double = 2.0,
      skewFactor: Double = 4.0,
      lloydIters: Int = 2,
  ): Report = {
    val retrained =
      if (IvfStore.needsRetrain(spark, path, skewFactor)) {
        val k = IvfStore.codebookDf(spark, path).count().toInt
        IvfStore.retrain(spark, path, nCentroids = k, lloydIters = lloydIters)
        true
      } else false
    def lists = IvfStore.listsDf(spark, path)
    val nLists = lists.select("cid").distinct().count()
    val compacted =
      if (fragmented(lists.inputFiles.length.toLong, nLists, smallFileFactor)) {
        IvfStore.compactLists(spark, path)
        true
      } else false
    Report(path, "ivf", retrained, compacted)
  }

  /** Evaluate and act on one bands store. */
  def maintainBands(spark: SparkSession, path: String, smallFileFactor: Double = 2.0): Report = {
    def store = spark.read.parquet(path)
    val parts =
      if (store.columns.contains("sigb"))
        store.select(col("band"), col("sigb")).distinct().count()
      else store.select(col("band")).distinct().count()
    val compacted =
      if (fragmented(store.inputFiles.length.toLong, parts, smallFileFactor)) {
        BandsStore.compact(spark, path)
        true
      } else false
    Report(path, "bands", retrained = false, compacted = compacted)
  }

  /** One pass over a fleet of stores. */
  def run(spark: SparkSession, ivfPaths: Seq[String] = Nil, bandsPaths: Seq[String] = Nil): Seq[Report] =
    ivfPaths.map(maintainIvf(spark, _)) ++ bandsPaths.map(maintainBands(spark, _))
}
