package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.compact.{Compactor, CompactorConfig}

/** Compaction throughput benchmark — the one operation the reference
  * itself performs, so the directly comparable number. Synthesizes a
  * many-small-files layout from the sf dir's lineitem, compacts it, and
  * prints one JSON line with files in/out, rows, bytes, and seconds.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.CompactBench"
  *
  * SPARK_GRAFT_COMPACT_SYNTH=1 (with SPARK_GRAFT_COMPACT_SWEEP=noop)
  * switches the fixture to CLONES of one template manifest leaf — the
  * 10⁴–10⁵ rung of the no-op sweep ladder (r19 prescription 1), where
  * actually compacting that many leaves would dominate the wall clock
  * without informing the per-leaf no-op cost. The template commits
  * through the real merge path (Merger.mergeAndCommit, manifest mode);
  * clones are byte-identical directory copies, which the manifest
  * format makes legal — a manifest names only files relative to its
  * own leaf, so leaves are independently movable (ManifestCommit
  * header contract). The sweep under test is then exactly the
  * production composition: distributed listing → leaf derivation →
  * grouped catalog publish → per-leaf dial no-ops with the ONE pooled
  * floor parse.
  */
object CompactBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_COMPACT_FILES", "256").toInt
    // many-tiny-leaf swarm mode: nLeaves output groups instead of 4 —
    // exercises BatchMerger's job-count collapse (the reference's daily
    // shape). Jobs are counted and reported either way.
    val nLeaves = sys.env.getOrElse("SPARK_GRAFT_COMPACT_LEAVES", "4").toInt
    // Optional Z-order layout during the merge (comma keys, e.g.
    // "l_partkey,l_suppkey") — prices the OPTIMIZE … ZORDER BY range
    // shuffle against the plain coalesce merge on identical inputs.
    val layoutKeys = sys.env.getOrElse("SPARK_GRAFT_COMPACT_LAYOUT", "")
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    // Optional bucketed output layout ("key:n", e.g. "l_orderkey:8") —
    // prices the pre-paid join shuffle (bucketBy staged write) against
    // the plain coalesce merge on identical inputs.
    val (bucketKey, bucketCount) = sys.env.getOrElse("SPARK_GRAFT_COMPACT_BUCKET", "").split(':') match {
      case Array(k, n) if k.trim.nonEmpty => (Some(k.trim), n.trim.toInt)
      case _                              => (None: Option[String], 8)
    }
    // rename (default) | manifest — prices the no-rename commit path
    // against the staged-rename one on identical inputs.
    val commitMode = sys.env.getOrElse("SPARK_GRAFT_COMPACT_COMMIT", "rename") match {
      case m if m.equalsIgnoreCase("manifest") => graft.compact.CommitMode.Manifest
      case _                                   => graft.compact.CommitMode.Rename
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = Files.createTempDirectory("compact-bench").toFile
    def rm(f: java.io.File): Unit = Fs.rmTree(f)
    try {
      // Maintenance-sweep pricing (SPARK_GRAFT_COMPACT_SWEEP, manifest
      // mode): the retention-outruns-compaction shape at swarm scale.
      //   =1    every compacted leaf takes a 3-deep MoR delete backlog,
      //         then ONE maintainAll pass with the consolidation dial
      //         retires all of them (act), and a second pass prices the
      //         healthy-lake steady state (no-op: per-leaf state
      //         resolution, zero commits). The act/no-op split is the
      //         operational claim the run-loop wiring makes: a dial
      //         below threshold must cost metadata only.
      //   =noop skip the backlog fixture and price ONLY the no-op pass —
      //         the deep-ladder mode (10³–10⁵ leaves) where the act
      //         fixture's per-leaf delete commits would dominate the
      //         wall clock without informing the per-leaf no-op cost.
      // SPARK_GRAFT_COMPACT_CATALOG=1 additionally runs the whole thing
      // with a catalog at the lake root (grouped, G=max(16,√leaves))
      // and leaf expiry configured — the r17 weak-component shape: the
      // sweep's expire clamp must read the pin floors ONCE (oldestPins),
      // not once per leaf, so per-leaf no-op cost stays flat vs the
      // no-catalog pass.
      // SPARK_GRAFT_COMPACT_POOL sizes maintainAll's per-leaf pool
      // (default 4, the r18 ladder's width — keep it for comparability).
      val sweepMode = sys.env.getOrElse("SPARK_GRAFT_COMPACT_SWEEP", "")
      val synth = sys.env.get("SPARK_GRAFT_COMPACT_SYNTH").exists(_ == "1")
      val sweepPool = sys.env.getOrElse("SPARK_GRAFT_COMPACT_POOL", "4").toInt
      val withCatalog = sys.env.get("SPARK_GRAFT_COMPACT_CATALOG").exists(_ == "1")

      /** Price maintainAll over `leaves`: optional act pass (3-deep MoR
        * backlog on `delCol` ∈ {1,2,3}, retired by the consolidation
        * dial), then settle + the TIMED steady-state no-op pass. With
        * the catalog on, the pins published BEFORE the act deletes are
        * BELOW the post-consolidation heads, so the expire clamp
        * genuinely binds during the settle pass — the composition under
        * test, not a no-op clamp.
        */
      def sweepPrice(leaves: Seq[String], seqFor: String => Long, act: Boolean, delCol: String): Unit = {
        import org.apache.spark.sql.functions.col
        if (withCatalog) {
          // pin every leaf in one grouped publish so the sweep's expire
          // clamp has a live floor to consult (leaf paths may come back
          // fs-qualified from the listing — strip to root-relative)
          val rootAbs = root.getAbsolutePath
          val updates = leaves.map { leaf =>
            val i = leaf.indexOf(rootAbs)
            require(i >= 0, s"leaf $leaf not under $rootAbs")
            leaf.substring(i + rootAbs.length + 1) -> seqFor(leaf)
          }.toMap
          val g = math.max(16, math.ceil(math.sqrt(leaves.size.toDouble)).toInt)
          graft.compact.CatalogCommit.publish(
            spark, root.getAbsolutePath, updates, groups = Some(g))
          ()
        }
        val (delSec, actSec) =
          if (!act) (0.0, 0.0)
          else {
            val tDel = System.nanoTime()
            // fixture-only parallelism: leaves are independent, and the
            // 3 deletes of one leaf stay sequential on its slot
            // (single-writer-per-leaf), so the backlog builds at pool
            // width instead of ~0.5 s x 3N serial commits
            val delPool = java.util.concurrent.Executors.newFixedThreadPool(8)
            try {
              val fs = leaves.map { leaf =>
                delPool.submit(new Runnable {
                  override def run(): Unit =
                    (1 to 3).foreach { k =>
                      graft.compact.ManifestCommit
                        .deleteWhereMoR(spark, leaf, col(delCol) === k, CompactorConfig(
                          commitMode = graft.compact.CommitMode.Manifest))
                        .foreach(r => require(r.success, s"sweep fixture delete failed: ${r.error}"))
                    }
                })
              }
              fs.foreach(_.get())
            } finally {
              delPool.shutdown()
              ()
            }
            val dSec = (System.nanoTime() - tDel) / 1e9
            val actCfg = CompactorConfig(
              commitMode = graft.compact.CommitMode.Manifest,
              maintainDeleteSidecarsMax = Some(2),
              maxConcurrentLeaves = sweepPool,
            )
            val tAct = System.nanoTime()
            Compactor.maintainAll(spark, root.getAbsolutePath, actCfg)
            val aSec = (System.nanoTime() - tAct) / 1e9
            val backlog = leaves.map(l => graft.compact.ManifestCommit.liveDeletes(spark, l).size)
            require(backlog.forall(_ == 1), s"sweep did not consolidate: $backlog")
            (dSec, aSec)
          }
        // SPARK_GRAFT_COMPACT_EXPIRE=1: configure leaf expiry WITHOUT
        // the catalog — the control that splits the per-leaf expire
        // machinery's cost from the catalog pin-floor lookup's
        val withExpire = withCatalog || sys.env.get("SPARK_GRAFT_COMPACT_EXPIRE").exists(_ == "1")
        val sweepCfg = CompactorConfig(
          commitMode = graft.compact.CommitMode.Manifest,
          maintainDeleteSidecarsMax = Some(2),
          maxConcurrentLeaves = sweepPool,
          catalogRoot = if (withCatalog) Some(root.getAbsolutePath) else None,
          catalogKeepSnapshots = if (withCatalog) Some(5) else None,
          expireKeepSnapshots = if (withExpire) Some(1) else None,
        )
        // settle pass first (it may expire history / fold leftovers —
        // real work), then the TIMED pass is the true steady-state no-op
        Compactor.maintainAll(spark, root.getAbsolutePath, sweepCfg)
        val tNoop = System.nanoTime()
        val swept = Compactor.maintainAll(spark, root.getAbsolutePath, sweepCfg)
        val noopSec = (System.nanoTime() - tNoop) / 1e9
        println(
          s"""{"metric":"maint_sweep","leaves_swept":$swept,"mode":"$sweepMode",""" +
            s""""catalog":$withCatalog,"expire":$withExpire,"pool":$sweepPool,""" +
            s""""deletes_per_leaf":${if (act) 3 else 0},""" +
            s""""fixture_delete_sec":$delSec,"act_sec":$actSec,"noop_sec":$noopSec,""" +
            s""""noop_ms_per_leaf":${noopSec * 1000.0 / math.max(1, swept)}}""",
        )
      }

      if (synth) {
        // ---- synthetic deep-ladder fixture: one real committed leaf,
        // cloned nLeaves times ----
        require(sweepMode == "noop" || sweepMode == "1",
          "SPARK_GRAFT_COMPACT_SYNTH=1 prices the sweep ladder; set SPARK_GRAFT_COMPACT_SWEEP " +
            "to 'noop' (steady-state pass only) or '1' (3-deep MoR backlog per clone + act pass)")
        val s = spark
        import s.implicits._
        val tFix = System.nanoTime()
        // the template commits through the REAL merge path so the leaf
        // state carries everything maintainLeaf resolves (manifest head,
        // stats sidecars); built OUTSIDE the lake root so the sweep sees
        // exactly nLeaves leaves
        val tmplRoot = Files.createTempDirectory("compact-bench-tmpl").toFile
        try {
          val tmpl = new java.io.File(tmplRoot, "leaf")
          tmpl.mkdirs()
          val stage = new java.io.File(tmpl, ".tmp-arrival")
          (1L to 10L).map(i => (i, s"d$i")).toDF("id", "doc")
            .coalesce(1).write.parquet(stage.getAbsolutePath)
          val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
          val raw = new java.io.File(tmpl, "arrival-000.parquet")
          Files.move(part.toPath, raw.toPath)
          stage.listFiles().foreach(_.delete()); stage.delete()
          val mCfg = CompactorConfig(commitMode = graft.compact.CommitMode.Manifest)
          val r = graft.compact.Merger.mergeAndCommit(
            spark, graft.compact.LeafPlan(tmpl.getAbsolutePath, "m1", Seq(raw.getAbsolutePath), raw.length()), mCfg)
          require(r.success, s"template commit failed: ${r.error}")
          // the raw arrival is superseded by the commit — resolution
          // subtracts it either way (it is in the manifest's inputs),
          // so dropping the file shrinks every clone to live state only
          raw.delete()
          val headSeq = graft.compact.ManifestCommit.currentSeq(spark, tmpl.getAbsolutePath)

          // clones bucket under √-ish first-level dirs: listing
          // parallelism is one task per first-level prefix, and 10⁵
          // single-leaf prefixes would price task-scheduling overhead,
          // not listing (the reference's lake is multi-level the same
          // way: account/source/year/month)
          val buckets = math.max(1, math.min(256, math.ceil(math.sqrt(nLeaves.toDouble)).toInt))
          def copyTree(src: java.io.File, dst: java.io.File): Unit = {
            if (src.isDirectory) {
              dst.mkdirs()
              src.listFiles().foreach(c => copyTree(c, new java.io.File(dst, c.getName)))
            } else {
              Files.copy(src.toPath, dst.toPath)
              ()
            }
          }
          val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
          try {
            val futures = (0 until nLeaves).map { i =>
              val dst = new java.io.File(root, f"grp${i % buckets}%03d/leaf$i%06d")
              pool.submit(new Runnable { override def run(): Unit = copyTree(tmpl, dst) })
            }
            futures.foreach(_.get())
          } finally {
            pool.shutdown()
            ()
          }
          val fixSec = (System.nanoTime() - tFix) / 1e9
          val leaves = (0 until nLeaves)
            .map(i => new java.io.File(root, f"grp${i % buckets}%03d/leaf$i%06d").getAbsolutePath)
          println(
            s"""{"metric":"synth_fixture","leaves":$nLeaves,"buckets":$buckets,""" +
              s""""fixture_sec":$fixSec}""")
          sweepPrice(leaves, _ => headSeq, act = sweepMode == "1", delCol = "id")
        } finally rm(tmplRoot)
        return
      }

      // ---- real-compaction fixture: 4 leaves x (nFiles/4) small
      // files from lineitem, stale mtimes ----
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val rows = li.count()
      // one write job for ALL leaves: partitionBy splits into leaf dirs
      // (fixture setup only — the compactor under test still sees plain
      // hive-free leaf paths because we pick the dirs up by name)
      import org.apache.spark.sql.functions.{col, lit, lpad, pmod}
      // round-robin into filesPerLeaf partitions: each partition carries
      // rows of every leaf, so partitionBy emits filesPerLeaf files per
      // leaf dir (>=2 so every leaf clears the planner's group gate)
      val filesPerLeaf = math.max(2, nFiles / nLeaves)
      li.withColumn("leafno", lpad(pmod(col("l_orderkey"), lit(nLeaves)).cast("string"), 4, "0"))
        .repartition(filesPerLeaf)
        .write.partitionBy("leafno").parquet(s"${root.getAbsolutePath}/staging")
      val staged = new java.io.File(root, "staging")
      staged.listFiles().filter(_.isDirectory).foreach { d =>
        val leafno = d.getName.stripPrefix("leafno=")
        val dest = new java.io.File(root, s"acct$leafno/source=s$leafno/year=2026/month=01")
        dest.getParentFile.mkdirs()
        java.nio.file.Files.move(d.toPath, dest.toPath)
      }
      rm(staged)
      val staleMs = System.currentTimeMillis() - 30L * 86400000L
      var filesIn = 0
      def touch(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(touch)
        else {
          if (f.getName.endsWith(".parquet")) filesIn += 1
          f.setLastModified(staleMs)
        }
        ()
      }
      touch(root)
      val inBytes = {
        def size(f: java.io.File): Long =
          if (f.isDirectory) f.listFiles().map(size).sum else f.length()
        size(root)
      }

      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val results = Compactor.run(
        spark, root.getAbsolutePath,
        CompactorConfig(
          targetFileBytes = 128L * 1024 * 1024, maxConcurrentLeaves = 4,
          layoutKeys = layoutKeys, commitMode = commitMode,
          bucketKey = bucketKey, bucketCount = bucketCount,
        ),
      )
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // drain the async listener bus
      spark.sparkContext.removeSparkListener(listener)
      val ok = results.forall(_.success)
      val outFiles = results.map(_.filesWritten).sum
      println(
        s"""{"metric":"compact_sec","value":$sec,"unit":"sec","success":$ok,""" +
          s""""leaves":${results.size},"jobs":${jobs.get()},""" +
          s""""files_in":$filesIn,"files_out":$outFiles,"rows":$rows,""" +
          s""""layout":"${layoutKeys.mkString(" ")}","commit":"${commitMode.toString.toLowerCase}",""" +
          s""""bucket":"${bucketKey.fold("")(k => s"$k:$bucketCount")}",""" +
          s""""mb_in":${inBytes / 1048576.0},"mb_per_sec":${inBytes / 1048576.0 / sec}}""",
      )

      if ((sweepMode == "1" || sweepMode == "noop") &&
        commitMode == graft.compact.CommitMode.Manifest && ok) {
        val leaves = results.map(_.leaf).distinct.sorted
        sweepPrice(
          leaves,
          leaf => graft.compact.ManifestCommit.currentSeq(spark, leaf),
          act = sweepMode != "noop",
          delCol = "l_linenumber",
        )
      }
    } finally {
      rm(root)
      spark.stop()
    }
  }
}
