package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental SemDeDup over a persisted [[IvfStore]] (ROADMAP 57) —
  * the [[BandsStore]] screen-and-absorb pattern applied to EMBEDDINGS.
  *
  * The oracled `dedup_semdedup` query re-clusters the whole corpus per
  * run — fine for a one-shot sweep, wrong for continuous ingest where
  * each arriving batch must be screened against everything already
  * kept. Here the corpus lives in an IvfStore (codebook trained once,
  * members hive-partitioned by cluster id), and screening a batch is:
  *
  *   1. assign the batch against the FROZEN codebook — one broadcast
  *      argmax pass over the batch, exactly [[IvfStore.append]]'s
  *      assignment;
  *   2. read ONLY the clusters the batch touched — `cid` is the lists'
  *      partition column, so the filter is a static partition prune
  *      (≤ K directories, usually far fewer);
  *   3. drop a batch member when a STORED member of its cluster, or an
  *      EARLIER-RANKED batch-mate of the same cluster, is
  *      cosine-similar at or above `tau`. Ranking is farthest-from-
  *      centroid first (`acos` asc, `vec_id` asc) — the same
  *      suppression order as `dedup_semdedup`, with the stored members
  *      acting as rank-before-everything representatives (they were
  *      already screened when they were absorbed).
  *
  * Per-batch cost is batch-assignment (|B|·K) plus the suppression
  * joins over the touched clusters only — the corpus is never
  * re-clustered, never re-read outside the touched partitions, and the
  * batch-side quadratic stays bounded by the per-cluster batch counts.
  * Like the paper's one-pass greedy (and unlike an iterated
  * keep-set recursion), a batch member suppressed by the store can
  * still suppress a later-ranked batch-mate — SemDedupSpec pins the
  * exact contract against a sequential reference.
  */
object SemDedup {

  private def assigned(spark: SparkSession, path: String, batch: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val cb = IvfStore.codebookDf(spark, path)
    val w = Window.partitionBy("vec_id").orderBy(desc("acos"), col("cid"))
    batch.crossJoin(broadcast(cb))
      .withColumn("acos", expr("cosine_similarity(v, cv)"))
      .withColumn("arn", row_number().over(w))
      .where(col("arn") === 1)
      .select(col("cid"), col("vec_id"), col("label"), col("v"), col("acos"))
  }

  /** Kept rows of `batch` — `(cid, vec_id, label, v, acos)` — after
    * semantic-duplicate screening against the store at threshold `tau`.
    */
  def screenBatch(spark: SparkSession, path: String, batch: DataFrame, tau: Double): DataFrame = {
    val a = assigned(spark, path, batch)
    // the batch's clusters: driver-side, bounded by K
    val cids = a.select("cid").distinct().collect().map(_.getLong(0)).sorted.toSeq
    val stored = IvfStore.listsDf(spark, path).where(col("cid").isin(cids: _*))
    val wRank = Window.partitionBy("cid").orderBy(col("acos"), col("vec_id"))
    val ranked = a.withColumn("r", row_number().over(wRank))
    val vsStore = ranked.as("x").join(
      stored.as("y"),
      col("x.cid") === col("y.cid") && expr("cosine_similarity(x.v, y.v)") >= tau,
      "left_anti",
    )
    vsStore.as("x").join(
      ranked.as("y"),
      col("x.cid") === col("y.cid") && col("y.r") < col("x.r") &&
        expr("cosine_similarity(x.v, y.v)") >= tau,
      "left_anti",
    ).select(col("cid"), col("vec_id"), col("label"), col("v"), col("acos"))
  }

  /** Index-routed decontamination (the scale path of the oracled
    * `embedding_decontaminate` brute-force pass): flag STORED corpus
    * members cosine-similar to any eval vector, reading only the
    * clusters the eval set probes. Eval is small and broadcasts; the
    * corpus is the IvfStore, so the scan is a static partition prune of
    * `nprobe` lists per eval vector instead of a full corpus pass.
    * Approximate in the standard ANN sense: a contaminated member whose
    * cluster no eval vector probes is missed — flags are a SUBSET of
    * the brute-force flags with exact similarities (no false
    * positives), recall governed by `nprobe` (SemDedupSpec pins both).
    */
  def decontaminate(
      spark: SparkSession,
      path: String,
      evalVecs: DataFrame,
      tau: Double,
      nprobe: Int = 2,
  ): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val cb = IvfStore.codebookDf(spark, path)
    // rank each eval vector's centroids; union of top-nprobe cids
    val w = Window.partitionBy("vec_id").orderBy(desc("acos"), col("cid"))
    val probed = evalVecs.crossJoin(broadcast(cb))
      .withColumn("acos", expr("cosine_similarity(v, cv)"))
      .withColumn("arn", row_number().over(w))
      .where(col("arn") <= nprobe)
      .select("cid").distinct().collect().map(_.getLong(0)).sorted.toSeq
    val members = IvfStore.listsDf(spark, path).where(col("cid").isin(probed: _*))
    val ev = broadcast(evalVecs.select(col("v").as("ev")))
    members.crossJoin(ev)
      .withColumn("sim", expr("cosine_similarity(v, ev)"))
      .groupBy("vec_id", "label")
      .agg(max("sim").as("eval_sim"))
      .where(col("eval_sim") >= tau)
      .select(col("vec_id"), col("label"), col("eval_sim"))
  }

  /** Decontamination-guarded [[screenAndAbsorbBatch]] (ROADMAP 64 —
    * the semantic sibling of the DocumentStream decontaminate guard):
    * batch members cosine-similar to ANY eval vector at `evalTau` are
    * dropped BEFORE the dedup screen, so contaminated rows are neither
    * returned nor absorbed into the corpus store. Eval is small and
    * broadcasts (the brute-force pass is exact and one batch-sized
    * map); everything downstream is the normal screen-and-absorb.
    */
  def guardedScreenAndAbsorb(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      tau: Double,
      evalVecs: DataFrame,
      evalTau: Double,
  ): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val ev = broadcast(evalVecs.select(col("v").as("ev")))
    val contaminated = batch.crossJoin(ev)
      .where(expr("cosine_similarity(v, ev)") >= evalTau)
      .select("vec_id").distinct()
    val clean = batch.join(contaminated, Seq("vec_id"), "left_anti")
    screenAndAbsorbBatch(spark, path, clean, tau)
  }

  /** [[screenBatch]], then absorb the kept rows into the store (one
    * [[IvfStore.append]] — same frozen-codebook assignment, so the
    * absorbed rows land in exactly the clusters they screened in).
    * Returns the kept rows; the next batch's screen sees them.
    *
    * The kept set is MATERIALIZED to a hidden dir before the absorb
    * (the [[graft.streaming.DocumentStream.screenAndAbsorbBatch]]
    * discipline): re-evaluating the screen's lineage after the append
    * would re-screen the batch against a store that now CONTAINS it
    * and come back empty — a cache eviction away from a wrong answer.
    * Bounded by executor disk, never the driver; this is also the
    * micro-batch body for a streaming embedding pipeline
    * (`foreachBatch { (b, _) => screenAndAbsorbBatch(spark, path, b,
    * tau) }` — SemDedupSpec drives it through a memory stream).
    */
  def screenAndAbsorbBatch(spark: SparkSession, path: String, batch: DataFrame, tau: Double): DataFrame = {
    val keptPath = s"$path/.screen-kept"
    screenBatch(spark, path, batch, tau)
      .select("vec_id", "label", "v")
      .write.mode("overwrite").parquet(keptPath)
    val kept = spark.read.parquet(keptPath)
    IvfStore.append(spark, kept, path)
    kept
  }
}
