package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Scratch main: per-stage wall/CPU/shuffle attribution for the named
  * queries — the guide §1 "empirical loop" without a live UI. Each
  * stage's name carries its call site (e.g. "localCheckpoint at
  * Similarity.scala:355"), so the report maps time to code lines.
  *
  * Usage: runMain graft.Profile <query...>
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_PROFILE_TOP (stages to print, default 14).
  */
object Profile {
  private case class St(name: String, wallMs: Long, runMs: Long,
                        cpuMs: Long, shufR: Long, shufW: Long,
                        input: Long, tasks: Int)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val topN = sys.env.getOrElse("SPARK_GRAFT_PROFILE_TOP", "14").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "1").toInt
    // extra session confs for A/B experiments: "k=v;k=v"
    val extra = sys.env.getOrElse("SPARK_GRAFT_PROFILE_CONF", "")
      .split(';').filter(_.contains('=')).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = extra.foldLeft(b0) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    if (extra.nonEmpty) println(s"extra conf: ${extra.mkString(", ")}")
    spark.sparkContext.setLogLevel("ERROR")

    val stages = mutable.ArrayBuffer[St]()
    val jobs = mutable.ArrayBuffer[(Int, Long, Long)]() // id, start, end
    val jobStartsById = mutable.Map[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.synchronized { jobStartsById(e.jobId) = e.time }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobStartsById.remove(e.jobId).foreach(s => jobs += ((e.jobId, s, e.time)))
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val wall = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(0L)
        stages.synchronized {
          stages += St(si.name.linesIterator.next().take(120), wall,
            m.executorRunTime, m.executorCpuTime / 1000000L,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten,
            m.inputMetrics.bytesRead, si.numTasks)
        }
      }
    })

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      dt
    }

    once("q01_pricing_summary") // session/codegen warmup

    // In-process flat profiler (SPARK_GRAFT_PROFILE_SAMPLE=1): samples
    // every thread's top frames at 50 ms, attributing RUNNABLE samples
    // to the deepest "interesting" frame (spark/catalyst/janino/parquet
    // packages) — the §7.3 thread-dump loop, automated.
    val doSample = sys.env.get("SPARK_GRAFT_PROFILE_SAMPLE").contains("1")
    val frameCounts = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val traces = Thread.getAllStackTraces
          traces.forEach { (t, st) =>
            if (t.getState == Thread.State.RUNNABLE && st.nonEmpty &&
                t.getName != "profile-sampler") {
              val interesting = st.find { f =>
                val c = f.getClassName
                c.startsWith("org.apache.spark.sql.catalyst") ||
                c.startsWith("org.apache.spark.sql.execution") ||
                c.startsWith("org.codehaus.janino") ||
                c.startsWith("org.apache.parquet") ||
                c.startsWith("org.apache.spark.scheduler") ||
                c.startsWith("org.apache.spark.shuffle") ||
                c.startsWith("org.apache.spark.storage")
              }
              val f = interesting.getOrElse(st.head)
              val key = s"${f.getClassName}.${f.getMethodName}"
                .replace("org.apache.spark.sql.", "")
              frameCounts.merge(key, 1L, _ + _)
            }
          }
        }
        Thread.sleep(50)
      }
    }, "profile-sampler")
    sampler.setDaemon(true)
    if (doSample) sampler.start()

    // Interleaved A/B for SESSION-settable confs (noise-robust: the two
    // arms alternate within one JVM, so host bursts hit both): arm B
    // sets SPARK_GRAFT_PROFILE_AB's "k=v;k=v", arm A restores the
    // session defaults. Reports each arm's median.
    val abConf = sys.env.getOrElse("SPARK_GRAFT_PROFILE_AB", "")
      .split(';').filter(_.contains('=')).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    val abBase = abConf.map { case (k, _) => k -> spark.conf.get(k) }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }

    if (abConf.nonEmpty) {
      args.foreach { name =>
        spark.sparkContext.setJobDescription(name)
        once(name) // hot-path warmup, uncounted
        val res = scala.collection.mutable.Map("A" -> Seq.empty[Double],
          "B" -> Seq.empty[Double])
        for (r <- 1 to reps; arm <- Seq("A", "B")) {
          val cs = if (arm == "B") abConf.toSeq else abBase.toSeq
          cs.foreach { case (k, v) => spark.conf.set(k, v) }
          val w = once(name)
          res(arm) = res(arm) :+ w
          println(f"  $name $arm rep$r wall=$w%.2f s")
        }
        abBase.foreach { case (k, v) => spark.conf.set(k, v) }
        println(f"  == $name A(median)=${median(res("A"))}%.2f s  " +
          f"B(median)=${median(res("B"))}%.2f s  " +
          f"(B armed: ${abConf.map(c => c._1 + "=" + c._2).mkString(";")})")
      }
      spark.stop()
      return
    }

    args.foreach { name =>
      stages.synchronized(stages.clear())
      jobs.synchronized(jobs.clear())
      spark.sparkContext.setJobDescription(name)
      var wall = once(name)
      // reps > 1: report the LAST run (hot JVM — the bench-like number)
      for (r <- 2 to reps) {
        println(f"  $name rep${r - 1} wall=$wall%.2f s")
        stages.synchronized(stages.clear())
      jobs.synchronized(jobs.clear())
        if (doSample && r == reps) { frameCounts.clear(); sampling = true }
        wall = once(name)
        sampling = false
      }
      if (doSample) {
        import scala.jdk.CollectionConverters._
        val top = frameCounts.asScala.toSeq.sortBy(-_._2).take(25)
        val tot = frameCounts.asScala.values.sum.max(1L)
        println(s"  -- sampled frames (last rep, ${tot} samples) --")
        top.foreach { case (k, v) =>
          println(f"  ${v * 100.0 / tot}%5.1f%% $v%6d  $k") }
      }
      // listener events drain asynchronously — settle before reporting
      Thread.sleep(500)
      val snap = stages.synchronized(stages.toVector)
      val jsnap = jobs.synchronized { val v = jobs.toVector; jobs.clear(); v }
      // union of job spans = time covered by RUNNING jobs; the rest of
      // the wall is driver think time (planning, checkpoint round trips)
      val spans = jsnap.map(j => (j._2, j._3)).sortBy(_._1)
      val covered = spans.foldLeft((0L, 0L)) { case ((acc, hi), (s, e)) =>
        val s2 = math.max(s, hi); (acc + math.max(0L, e - s2), math.max(hi, e))
      }._1
      val mb = 1024.0 * 1024
      println(f"%n== $name  wall=$wall%.2f s  stages=${snap.size}  " +
        f"jobs=${jsnap.size}  in-jobs=${covered / 1000.0}%.2f s  " +
        f"sum(stage wall)=${snap.map(_.wallMs).sum / 1000.0}%.2f s ==")
      println(f"${"wall_s"}%8s ${"run_s"}%8s ${"cpu_s"}%8s ${"in_MB"}%8s " +
        f"${"shR_MB"}%8s ${"shW_MB"}%8s ${"tasks"}%6s  stage")
      snap.sortBy(-_.wallMs).take(topN).foreach { s =>
        println(f"${s.wallMs / 1000.0}%8.2f ${s.runMs / 1000.0}%8.2f " +
          f"${s.cpuMs / 1000.0}%8.2f ${s.input / mb}%8.1f " +
          f"${s.shufR / mb}%8.1f ${s.shufW / mb}%8.1f ${s.tasks}%6d  ${s.name}")
      }
    }
    spark.stop()
  }
}
