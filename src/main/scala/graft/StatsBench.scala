package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.compact.{CommitMode, CompactorConfig, LeafPlan, ManifestCommit, ManifestStats, Merger}

/** Prices the manifest data-skipping layer: a leaf accumulated over K
  * manifest commits (each one arrival batch with a disjoint id range
  * and distinct tag values, the incremental-ingest shape), then the
  * same narrow reads with and without the sidecar prunes:
  *
  *   - range: `readLeaf().where(lo<=id<=hi)` (parquet row-group stats
  *     only — every live FILE still opens) vs
  *     `ManifestStats.readLeafWhere` (files outside the range never
  *     open);
  *   - point: full filter vs `readLeafEquals` through the blooms;
  *   - combined: `readLeafPruned(range ∩ point)`.
  *
  * Emits one JSON line with commit counts, file counts scanned, and
  * min-of-2 timings. Env: SPARK_GRAFT_STATS_COMMITS (default 40),
  * SPARK_GRAFT_STATS_ROWS per commit (default 25000).
  */
object StatsBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nCommits = sys.env.getOrElse("SPARK_GRAFT_STATS_COMMITS", "40").toInt
    val rowsPer = sys.env.getOrElse("SPARK_GRAFT_STATS_ROWS", "25000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = Files.createTempDirectory("graft-statsbench").toFile
    val leaf = new java.io.File(root, "acct/source=sb/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val cfg = CompactorConfig(
      maxRowsPerFile = rowsPer,
      commitMode = CommitMode.Manifest,
      statsColumns = Seq("id"),
      bloomColumns = Seq("tag"),
    )

    // K commits, each one arrival file over its own id decade
    def arrival(k: Int): Unit = {
      val lo = k * rowsPer
      val name = f"arrival-$k%04d.parquet"
      val tmp = new java.io.File(leaf, s".tmp-$k")
      spark.range(lo, lo + rowsPer)
        .select(col("id"), (col("id") % 1000).cast("double").as("v"), concat(lit("t"), col("id")).as("tag"))
        .coalesce(1).write.parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, new java.io.File(leaf, name).toPath)
      tmp.listFiles().foreach(_.delete()); tmp.delete()
      val f = s"$leafPath/$name"
      val r = Merger.mergeAndCommit(spark, LeafPlan(leafPath, "sb", Seq(f), new java.io.File(f).length()), cfg)
      require(r.success, s"commit $k failed: ${r.error}")
    }
    val tBuild = System.nanoTime()
    (0 until nCommits).foreach(arrival)
    val buildSec = (System.nanoTime() - tBuild) / 1e9

    def timed(mk: => org.apache.spark.sql.DataFrame): (Double, Long, Long) = {
      var rows = 0L; var files = 0L
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val df = mk
        rows = df.count()
        files = df.inputFiles.length.toLong
        (System.nanoTime() - t0) / 1e9
      }
      (secs.min, rows, files)
    }

    // a range inside one middle commit, and a point in another
    val midLo = (nCommits / 2) * rowsPer + 10
    val midHi = midLo + rowsPer / 2
    val pointTag = s"t${(nCommits / 4) * rowsPer + 7}"

    val (fullRangeSec, r1, f1) = timed(
      ManifestCommit.readLeaf(spark, leafPath).where(col("id") >= midLo && col("id") <= midHi),
    )
    val (prunedRangeSec, r2, f2) = timed(
      ManifestStats.readLeafWhere(spark, leafPath, "id", midLo.toDouble, midHi.toDouble),
    )
    require(r1 == r2, s"range rows diverged: $r1 != $r2")
    val (fullPointSec, p1, _) = timed(
      ManifestCommit.readLeaf(spark, leafPath).where(col("tag") === pointTag),
    )
    val (prunedPointSec, p2, pf2) = timed(
      ManifestStats.readLeafEquals(spark, leafPath, "tag", pointTag),
    )
    require(p1 == p2, s"point rows diverged: $p1 != $p2")
    val (combSec, c1, cf) = timed(
      ManifestStats.readLeafPruned(
        spark, leafPath,
        ranges = Map("id" -> ((nCommits / 4) * rowsPer.toDouble, (nCommits / 4) * rowsPer.toDouble + 100)),
        points = Map("tag" -> pointTag),
      ),
    )

    // metadata-only aggregates (ROADMAP 46): count(*) and a range count
    // answered from sidecar row counts vs the scanning forms
    def timedVal(mk: => Long): (Double, Long) = {
      var v = 0L
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        v = mk
        (System.nanoTime() - t0) / 1e9
      }
      (secs.min, v)
    }
    val (fullCountSec, fc) = timedVal(ManifestCommit.readLeaf(spark, leafPath).count())
    val (metaCountSec, mc) = timedVal(ManifestStats.countLeaf(spark, leafPath))
    require(fc == mc, s"count diverged: $fc != $mc")
    // commit-aligned range: every covered file is fully inside → zero scans
    val alignedLo = (nCommits / 3) * rowsPer
    val alignedHi = (2 * nCommits / 3) * rowsPer - 1
    val (fullRcSec, frc) = timedVal(
      ManifestCommit.readLeaf(spark, leafPath)
        .where(col("id") >= alignedLo && col("id") <= alignedHi).count(),
    )
    val (metaRcSec, mrc) = timedVal(
      ManifestStats.countLeafWhere(spark, leafPath, "id", alignedLo.toDouble, alignedHi.toDouble),
    )
    require(frc == mrc, s"range count diverged: $frc != $mrc")

    // Bloom bits-per-item ladder: fpp vs sidecar bytes on the real
    // unique-valued `tag` column, measured by probing every file's
    // bloom with absent keys through the same serialized-filter +
    // xxhash64(seed 42) path the reader uses. Two figures per rung:
    // single-probe fpp (the point-lookup cost) and fpp50 — the chance
    // an innocent file SURVIVES a 50-key batch probe (the merge/keyed-
    // delete classification shape, where per-key fpp compounds as
    // 1-(1-fpp)^50). fpp50 is what sizes the default: 10 bits is fine
    // for points but keeps ~30% of innocent files per 50-key batch;
    // 16 holds it near 2% for 1.6x the sidecar bytes (ROADMAP 112).
    val liveFiles = ManifestCommit.liveFiles(spark, leafPath)
    val relAbs = liveFiles.map(p => p.stripPrefix(s"$leafPath/") -> p)
    val absentProbes = (0 until 1000).map(i => s"zz$i")
    def hashOf(s0: String): Long =
      org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s0),
        org.apache.spark.sql.types.StringType, 42L,
      )
    val batches50 = (0 until 40).map(b => (0 until 50).map(i => hashOf(s"zz${b * 50 + i}")))
    val bitsLadder = Seq(2, 5, 10, 16, 20).map { bits =>
      val blooms = ManifestStats.collectBlooms(
        spark, relAbs, Seq("tag"),
        expectedItems = rowsPer, numBits = bits.toLong * rowsPer,
      )
      val bytes = blooms.valuesIterator.flatMap(_.valuesIterator.map(_.length.toLong)).sum
      var fp = 0L
      var probesTotal = 0L
      var batchHits = 0L
      var batchesTotal = 0L
      blooms.valuesIterator.foreach { cols =>
        val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(cols("tag"))
        absentProbes.foreach { s0 =>
          probesTotal += 1
          if (bf.mightContainLong(hashOf(s0))) fp += 1
        }
        batches50.foreach { batch =>
          batchesTotal += 1
          if (batch.exists(bf.mightContainLong)) batchHits += 1
        }
      }
      val fpp = if (probesTotal == 0) 0.0 else fp.toDouble / probesTotal
      val fpp50 = if (batchesTotal == 0) 0.0 else batchHits.toDouble / batchesTotal
      f"""{"bits":$bits,"bloom_bytes":$bytes,"fpp":$fpp%.4f,"fpp50":$fpp50%.4f}"""
    }

    // Materialized-agg refresh vs rebuild (MaterializedAgg — the
    // O(delta) claim priced): build the 1000-group count/sum state over
    // the K-commit leaf, land ONE more arrival commit, then refresh
    // (reads only the new commit's output) vs a from-scratch rebuild
    // (re-scans every live file). Single-shot timings — build/refresh
    // mutate the state, so a min-of-2 would measure the no-op path.
    def timedOnce[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val v = f
      ((System.nanoTime() - t0) / 1e9, v)
    }
    import graft.compact.MaterializedAgg
    val aggInc = new java.io.File(root, "agg-inc").getAbsolutePath
    val (maBuildSec, _) = timedOnce(MaterializedAgg.build(spark, leafPath, aggInc, Seq("v"), Seq("id")))
    arrival(nCommits)
    val (maRefreshSec, rres) = timedOnce(MaterializedAgg.refresh(spark, leafPath, aggInc, Seq("v"), Seq("id")))
    require(rres.incremental, "refresh unexpectedly fell back to a rebuild")
    val aggFull = new java.io.File(root, "agg-full").getAbsolutePath
    val (maRebuildSec, _) = timedOnce(MaterializedAgg.build(spark, leafPath, aggFull, Seq("v"), Seq("id")))
    def aggRows(p: String) = MaterializedAgg.read(spark, p).collect()
      .map(r => (r.getAs[Double]("v"), r.getAs[Long]("cnt"), r.getAs[Long]("sum_id"))).toSet
    require(aggRows(aggInc) == aggRows(aggFull), "incremental state diverged from rebuild")

    // min/max (semigroup) refresh: same O(delta) data read, plus the
    // metadata-scale partials anti-join + refold — priced separately so
    // the partials overhead is visible next to the ⊕/⊖-only path
    val aggMm = new java.io.File(root, "agg-mm").getAbsolutePath
    val (mmBuildSec, _) = timedOnce(
      MaterializedAgg.build(spark, leafPath, aggMm, Seq("v"), Seq("id"), minMax = Seq("id")))
    arrival(nCommits + 1)
    val (mmRefreshSec, mres) = timedOnce(
      MaterializedAgg.refresh(spark, leafPath, aggMm, Seq("v"), Seq("id"), minMax = Seq("id")))
    require(mres.incremental, "minMax refresh unexpectedly fell back to a rebuild")

    // generational partials (ROADMAP 85): the seal's partials I/O is
    // ONE added-files generation, not the whole table. Price the same
    // arrival refreshed generationally (default dial) vs forced-fold
    // (maxPartialGens=1 — the pre-generational whole-rewrite), as seal
    // time and as partials bytes written this seal.
    def dirBytes(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(dirBytes).sum).getOrElse(0L)
      else f.length()
    def newestGenBytes(aggPath: String): Long = {
      val gens = new java.io.File(aggPath).listFiles()
        .filter(_.getName.startsWith("pgen-"))
      dirBytes(gens.maxBy(_.getName.stripPrefix("pgen-").toLong))
    }
    val aggMmFold = new java.io.File(root, "agg-mm-fold").getAbsolutePath
    MaterializedAgg.build(spark, leafPath, aggMmFold, Seq("v"), Seq("id"), minMax = Seq("id"))
    arrival(nCommits + 2)
    val (mmGenSec, gres) = timedOnce(
      MaterializedAgg.refresh(spark, leafPath, aggMm, Seq("v"), Seq("id"), minMax = Seq("id")))
    require(gres.incremental, "generational minMax refresh fell back to a rebuild")
    val genBytes = newestGenBytes(aggMm)
    val (mmFoldSec, fres) = timedOnce(
      MaterializedAgg.refresh(spark, leafPath, aggMmFold, Seq("v"), Seq("id"), minMax = Seq("id"), maxPartialGens = 1))
    require(fres.incremental, "fold-mode minMax refresh fell back to a rebuild")
    val foldBytes = newestGenBytes(aggMmFold)
    def mmRowsOf(p: String) = MaterializedAgg.read(spark, p).collect()
      .map(r => (r.getAs[Double]("v"), r.getAs[Long]("cnt"), r.getAs[Long]("min_id"), r.getAs[Long]("max_id"))).toSet
    require(mmRowsOf(aggMm) == mmRowsOf(aggMmFold), "generational and fold minMax states diverged")

    // MERGE/keyed-DELETE classification with vs without the key-set
    // prune (ROADMAP 105): a string-keyed source whose keys live in
    // ONE commit's file. The no-prune form scans the key column of
    // EVERY live file; the bloom-probed form opens only the hit set —
    // at 100 TB this is the difference between touching 3 files and
    // scanning the leaf. Both forms run the same matched-per-file
    // aggregation so the delta is the classification read alone.
    val liveNow = ManifestCommit.liveFiles(spark, leafPath)
    val srcTags = (0 until 50).map(i => s"t${(nCommits / 2) * rowsPer + i}")
    def classify(cands: Seq[String]): Long =
      if (cands.isEmpty) 0L
      else spark.read.parquet(cands: _*)
        .where(col("tag").isin(srcTags: _*))
        .select(org.apache.spark.sql.functions.input_file_name().as("f"))
        .groupBy("f").count().count()
    var prunedCands: Seq[String] = Seq.empty
    val (clsPruneSec, prunedHits) = timedVal {
      prunedCands = ManifestStats.pruneByKeySet(
        spark, leafPath, liveNow, Map("tag" -> srcTags.map(x => x: Any)))
      classify(prunedCands)
    }
    val (clsFullSec, fullHits) = timedVal(classify(liveNow))
    require(prunedHits == fullHits,
      s"key-set prune diverged: $prunedHits hit files pruned vs $fullHits full")
    require(prunedCands.nonEmpty && prunedCands.size < liveNow.size,
      s"key-set prune ineffective: ${prunedCands.size} of ${liveNow.size} candidates")

    // compaction-NEUTRAL refresh (the commit-window walk): bring the
    // cnt/sum state to head, compact the whole K-commit leaf into one
    // commit, refresh again — the walk certifies net-zero from input
    // footers + the sealed row count and reads ZERO data, where the
    // live-set diff would re-read the entire old AND new leaf to net
    // the same zero (the rebuild_sec above prices that full-scan cost).
    MaterializedAgg.refresh(spark, leafPath, aggInc, Seq("v"), Seq("id"))
    val liveAll = graft.compact.ManifestCommit.liveFiles(spark, leafPath)
    val liveBytes = liveAll.map(p => new java.io.File(p).length()).sum
    val rcomp = Merger.mergeAndCommit(
      spark, LeafPlan(leafPath, "sbcompact", liveAll, liveBytes), cfg)
    require(rcomp.success, s"bench compaction failed: ${rcomp.error}")
    val (walkSec, wres) = timedOnce(MaterializedAgg.refresh(spark, leafPath, aggInc, Seq("v"), Seq("id")))
    require(wres.mode == "walk", s"expected walk-mode refresh, got ${wres.mode}")
    val expectNow = graft.compact.ManifestCommit.readLeaf(spark, leafPath)
      .groupBy("v").agg(count(lit(1)).as("cnt"), sum(col("id")).as("sum_id"))
      .collect().map(r => (r.getAs[Double]("v"), r.getAs[Long]("cnt"), r.getAs[Long]("sum_id"))).toSet
    require(aggRows(aggInc) == expectNow, "walk-refreshed state diverged")

    println(
      f"""{"metric":"stats_skipping","commits":$nCommits,"rows_per_commit":$rowsPer,""" +
        f""""build_sec":$buildSec%.1f,""" +
        f""""range":{"full_sec":$fullRangeSec%.3f,"pruned_sec":$prunedRangeSec%.3f,"files_full":$f1,"files_pruned":$f2,"rows":$r1},""" +
        f""""point":{"full_sec":$fullPointSec%.3f,"pruned_sec":$prunedPointSec%.3f,"files_pruned":$pf2,"rows":$p1},""" +
        f""""combined":{"sec":$combSec%.3f,"files":$cf,"rows":$c1},""" +
        f""""count":{"full_sec":$fullCountSec%.3f,"meta_sec":$metaCountSec%.3f,"rows":$fc},""" +
        f""""range_count":{"full_sec":$fullRcSec%.3f,"meta_sec":$metaRcSec%.3f,"rows":$frc},""" +
        s""""bloom_bits_ladder":[${bitsLadder.mkString(",")}],""" +
        f""""matagg":{"build_sec":$maBuildSec%.3f,"refresh_sec":$maRefreshSec%.3f,"rebuild_sec":$maRebuildSec%.3f,"groups":${aggRows(aggInc).size}},""" +
        f""""matagg_minmax":{"build_sec":$mmBuildSec%.3f,"refresh_sec":$mmRefreshSec%.3f,""" +
        f""""gen_seal_sec":$mmGenSec%.3f,"fold_seal_sec":$mmFoldSec%.3f,""" +
        f""""gen_partials_bytes":$genBytes,"fold_partials_bytes":$foldBytes},""" +
        f""""merge_classify":{"full_sec":$clsFullSec%.3f,"pruned_sec":$clsPruneSec%.3f,""" +
        f""""files_full":${liveNow.size},"files_pruned":${prunedCands.size}},""" +
        f""""matagg_compact_walk":{"refresh_sec":$walkSec%.3f,"files_compacted":${liveAll.size}}}""",
    )
    Fs.rmTree(root)
    spark.stop()
  }
}
