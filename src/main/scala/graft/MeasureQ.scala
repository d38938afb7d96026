package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev tool: run one registered query under a stage-level listener and
  * print (a) per-stage wall time / task count / name, (b) total job
  * count, (c) the FINAL adaptive plan — the runtime truth the static
  * `Explain` dump (isFinalPlan=false) cannot show.
  *
  * {{{ sbt "runMain graft.MeasureQ <queryName> [reps]" }}}
  */
object MeasureQ {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: MeasureQ <queryName> [reps]")
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    case class St(var name: String = "", var tasks: Int = 0, var t0: Long = 0L, var t1: Long = 0L)
    val stages = scala.collection.concurrent.TrieMap.empty[Int, St]
    @volatile var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = {
        val st = stages.getOrElseUpdate(s.stageInfo.stageId, St())
        st.name = s.stageInfo.name.takeWhile(_ != '\n')
        st.tasks = s.stageInfo.numTasks
        st.t0 = System.nanoTime()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.get(s.stageInfo.stageId).foreach(_.t1 = System.nanoTime())
    }

    (1 to reps).foreach { rep =>
      stages.clear(); jobs = 0
      spark.sparkContext.addSparkListener(listener)
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(300) // let completion events drain
      // Driver-side share: wall time minus the union of stage intervals.
      // Stages overlap (concurrent jobs), so merge intervals first — the
      // remainder is planning, AQE re-optimization and job-gap scheduling,
      // the time no executor was running anything for this query.
      val iv = stages.values.toSeq.filter(s => s.t1 > s.t0).map(s => (s.t0, s.t1)).sortBy(_._1)
      // stages with t1 <= t0 (still running / zero-duration at drain
      // time) fall out of the interval union and inflate the reported
      // gap — surface the count so such a gap is recognizable (advice r21)
      val excluded = stages.size - iv.size
      val covered = iv.foldLeft((0L, Long.MinValue)) { case ((acc, hi), (a, b)) =>
        if (a > hi) (acc + (b - a), b) else (acc + math.max(0L, b - hi), math.max(hi, b))
      }._1 / 1e9
      println(f"%n[measure] $name rep $rep: total $dt%.2f s, $jobs jobs, ${stages.size} stages ($excluded excluded from coverage), stage-covered $covered%.2f s, driver-gap ${dt - covered}%.2f s")
      stages.toSeq.sortBy(_._1).foreach { case (id, st) =>
        val w = if (st.t1 > st.t0) (st.t1 - st.t0) / 1e9 else -1.0
        val off = (st.t0 - t0) / 1e9
        println(f"  stage $id%4d  +$off%6.2f  $w%7.3f s  ${st.tasks}%4d tasks  ${st.name}")
      }
      if (rep == reps) {
        val plan = df.queryExecution.executedPlan.toString
        println("[measure] final plan (post-run):")
        println(plan.linesIterator.take(80).mkString("\n"))
      }
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
