package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{AnnSearch, IvfStore, NswSearch, SemDedup}

/** The ANN operating curve: recall@k vs wall time for every quality
  * dial the engine exposes, measured against exact brute force on the
  * same corpus and query batch — the table an operator consults when
  * choosing a method/parameter point for a workload (AnnSearchSpec pins
  * the FLOORS and monotonicity laws; this prices the dials).
  *
  * Emits one JSON line:
  * `{"metric":"ann_curve","k":..,"nq":..,"n":..,"exact_sec":..,
  *   "points":[{"method":"ivf","param":"nprobe=4","sec":..,"recall":..},…]}`
  */
object AnnBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val k = 10
    val e = graft.queries.SimilarityQueries.vecs(spark, sfDir)
      .repartition(cpus.toInt).cache()
    val n = e.count()
    val qids = 0L until 50L

    def timed(f: => org.apache.spark.sql.DataFrame): (Double, org.apache.spark.sql.DataFrame) = {
      f.write.mode("overwrite").format("noop").save() // warm pass
      val t0 = System.nanoTime()
      val df = f
      df.write.mode("overwrite").format("noop").save()
      ((System.nanoTime() - t0) / 1e9, df)
    }

    val (exactSec, exact) = timed(AnnSearch.exact(e, qids, k))
    val exactC = exact.cache(); exactC.count()

    // persisted IVF store: the build (train+assign) is priced once,
    // then the probe pays only the pruned scan — the amortization the
    // per-batch ivf points cannot show
    val ivfPath = Files.createTempDirectory("annbench-ivf").toFile.getAbsolutePath
    val tBuild = System.nanoTime()
    IvfStore.build(e, ivfPath, nCentroids = 16, lloydIters = 2, seedIds = Some(1L to 16L))
    val ivfBuildSec = (System.nanoTime() - tBuild) / 1e9
    val storeQueries = e.where(col("vec_id").isin(qids: _*))
      .select(col("vec_id"), col("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq

    // √N-centroid store: fixed K=16 conflates list-length growth with
    // probe-count growth across decades; K ∝ √N is the balance point
    // (probe cost ∝ nprobe·N/K = nprobe·√N when K=√N) — the second
    // curve the decade ladder needs to separate the two effects
    val kSqrtN = math.max(16, math.round(math.sqrt(n.toDouble)).toInt)
    val ivfSqrtPath = Files.createTempDirectory("annbench-ivfsqrt").toFile.getAbsolutePath
    val tBuildSqrt = System.nanoTime()
    IvfStore.build(e, ivfSqrtPath, nCentroids = kSqrtN, lloydIters = 2, seedIds = Some(1L to kSqrtN.toLong))
    val ivfSqrtBuildSec = (System.nanoTime() - tBuildSqrt) / 1e9

    // persisted NSW indexes: hash-routed (must probe every shard) vs
    // centroid-routed at two shard counts — the routed query cost is
    // ∝ nprobe, flat in nShards; hash search is ∝ corpus regardless
    val nswHashPath = Files.createTempDirectory("annbench-nswh").toFile.getAbsolutePath
    NswSearch.buildIndex(e, nswHashPath, m = 8, efBuild = 24)
    val nswR8Path = Files.createTempDirectory("annbench-nswr8").toFile.getAbsolutePath
    NswSearch.buildIndexRouted(e, nswR8Path, nShards = 8, m = 8, efBuild = 24, lloydIters = 2, seedIds = Some(1L to 8L))
    val nswR32Path = Files.createTempDirectory("annbench-nswr32").toFile.getAbsolutePath
    NswSearch.buildIndexRouted(e, nswR32Path, nShards = 32, m = 8, efBuild = 24, lloydIters = 2, seedIds = Some(1L to 32L))

    val points = Seq(
      ("ivf_store", "nprobe=2", () => IvfStore.search(spark, ivfPath, storeQueries, k, nprobe = 2)),
      ("ivf_store", "nprobe=8", () => IvfStore.search(spark, ivfPath, storeQueries, k, nprobe = 8)),
      ("ivf_store", s"K=$kSqrtN(sqrtN),nprobe=2", () => IvfStore.search(spark, ivfSqrtPath, storeQueries, k, nprobe = 2)),
      ("ivf_store", s"K=$kSqrtN(sqrtN),nprobe=8", () => IvfStore.search(spark, ivfSqrtPath, storeQueries, k, nprobe = 8)),
      ("nsw_store", "hash,all-shards", () => NswSearch.searchIndex(spark, nswHashPath, storeQueries, k, efSearch = 48)),
      ("nsw_routed", "S=8,nprobe=2", () => NswSearch.searchIndexRouted(spark, nswR8Path, storeQueries, k, efSearch = 48, nprobe = 2)),
      ("nsw_routed", "S=32,nprobe=2", () => NswSearch.searchIndexRouted(spark, nswR32Path, storeQueries, k, efSearch = 48, nprobe = 2)),
      ("lsh", "bits=8", () => AnnSearch.lsh(e, qids, k, bits = 8)),
      ("lsh", "bits=8,multiprobe", () => AnnSearch.lsh(e, qids, k, bits = 8, multiProbe = true)),
      ("ivf", "nprobe=1", () => AnnSearch.ivf(e, qids, k, nprobe = 1, lloydIters = 2)),
      ("ivf", "nprobe=2", () => AnnSearch.ivf(e, qids, k, nprobe = 2, lloydIters = 2)),
      ("ivf", "nprobe=4", () => AnnSearch.ivf(e, qids, k, nprobe = 4, lloydIters = 2)),
      ("ivf", "nprobe=8", () => AnnSearch.ivf(e, qids, k, nprobe = 8, lloydIters = 2)),
      ("nsw", "ef=16", () => NswSearch.nsw(e, qids, k, efSearch = 16)),
      ("nsw", "ef=48", () => NswSearch.nsw(e, qids, k, efSearch = 48)),
      ("nsw", "ef=128", () => NswSearch.nsw(e, qids, k, efSearch = 128)),
    ).map { case (method, param, mk) =>
      val (sec, df) = timed(mk())
      val recall = AnnSearch.recallAt(exactC, df, qids, k)
      f"""{"method":"$method","param":"$param","sec":$sec%.2f,"recall":$recall%.3f}"""
    }

    // SemDedup screen pricing (no recall — dedup, not retrieval): a
    // fixed 100-vector batch screened against each store. The scan is
    // partition-pruned to the batch's clusters, so the per-batch cost
    // follows the touched LIST sizes: ∝ N/K at fixed K=16, ∝ √N on the
    // √N store — never the whole corpus.
    val sdBatch = e.where(col("vec_id") < 100).select(col("vec_id"), col("label"), col("v"))
    val (sdSec16, _) = timed(SemDedup.screenBatch(spark, ivfPath, sdBatch, tau = 0.3))
    val (sdSecSqrt, _) = timed(SemDedup.screenBatch(spark, ivfSqrtPath, sdBatch, tau = 0.3))

    println(
      f"""{"metric":"ann_curve","k":$k,"nq":${qids.size},"n":$n,"exact_sec":$exactSec%.2f,""" +
        f""""ivf_store_build_sec":$ivfBuildSec%.2f,""" +
        f""""ivf_store_build_sqrtn_sec":$ivfSqrtBuildSec%.2f,"ivf_sqrtn_k":$kSqrtN,""" +
        f""""semdedup_screen":{"batch":100,"k16_sec":$sdSec16%.2f,"sqrtn_sec":$sdSecSqrt%.2f},""" +
        s""""points":[${points.mkString(",")}]}""",
    )
    Seq(ivfPath, ivfSqrtPath, nswHashPath, nswR8Path, nswR32Path)
      .foreach(p => Fs.rmTree(new java.io.File(p)))
    spark.stop()
  }
}
