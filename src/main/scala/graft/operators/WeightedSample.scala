package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted sampling WITHOUT replacement — Efraimidis & Spirakis (2006),
  * "Weighted random sampling with a reservoir" (A-Res): give row i the
  * key uᵢ^(1/wᵢ) for an independent uniform uᵢ ∈ (0,1) and keep the k
  * largest keys. The k-sample drawn this way has exactly the
  * sequential weighted-WOR distribution; for k = 1 the inclusion
  * probability is wᵢ/Σw precisely.
  *
  * Two deviations from the paper's reservoir, both deliberate:
  *   - uᵢ is HASH-DERIVED (`xxhash64(id, seed)` → (0,1)), not drawn from
  *     a stateful RNG, so the sample is a pure function of (data, seed):
  *     reproducible across runs, partitionings, and cluster sizes, and
  *     re-derivable for lineage — same policy as the md5 samplers in
  *     `sample_stratified_hash`.
  *   - keys are compared as ln(u)/w (monotone in u^(1/w), numerically
  *     tame where u^(1/w) underflows for tiny weights).
  *
  * Scale shape: `orderBy(key).limit(k)` plans TakeOrderedAndProject —
  * each task keeps its local top-k and only k·tasks rows ever move, no
  * full sort shuffle. Rows with weight ≤ 0 or NULL are never sampled
  * (the paper's domain is w > 0).
  */
object WeightedSample {

  /** The E-S key ln(u)/w as a column, with u = hash(id, seed) mapped to
    * (0,1). Exposed so witness specs exercise the exact production
    * arithmetic across many seeds in one plan.
    */
  def esKey(idCol: Column, weightCol: Column, seedCol: Column): Column = {
    val m = 1L << 40
    val u = (pmod(xxhash64(idCol, seedCol), lit(m)).cast("double") + lit(0.5)) / lit(m.toDouble)
    log(u) / weightCol
  }

  /** Top-k weighted sample without replacement; deterministic in
    * (df, seed). Ties in the hash key (measure-zero by construction) are
    * impossible for distinct ids, so the result is a well-defined set.
    */
  def sample(df: DataFrame, k: Int, idCol: Column, weightCol: Column, seed: Long): DataFrame = {
    require(k >= 1, s"sample size must be >= 1, got $k")
    val keyName = s"__es_key_$seed"
    df.where(weightCol.isNotNull && weightCol > 0)
      .withColumn(keyName, esKey(idCol, weightCol, lit(seed)))
      .orderBy(desc(keyName))
      .limit(k)
      .drop(keyName)
  }
}
