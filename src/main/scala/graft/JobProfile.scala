package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Where do a query's seconds go? Runs named queries under the exact
  * Bench session config with a listener that records every Spark job's
  * wall time, stage/task counts and executor-cpu totals — separating
  * driver-side gaps (planning, file ops, meta I/O) from cluster work.
  *
  * Usage: runMain graft.JobProfile <q1,q2,...> [sfDir]
  * Prints, per query: total wall, Σ job wall, Σ executor run time,
  * job count, task count — and the per-job table (desc, wall, tasks).
  * The GAP row (wall − Σ job wall) is pure driver time.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProfile <q1,q2,...> [sfDir]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "3min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class Job(id: Int, start: Long, var end: Long = 0L,
                   var stages: Int = 0, var tasks: Int = 0,
                   var execRunMs: Long = 0L, var cpuMs: Long = 0L)
    val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, Job]
    val stageToJob = scala.collection.mutable.HashMap.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = synchronized {
        jobs(js.jobId) = Job(js.jobId, js.time)
        js.stageIds.foreach(sid => stageToJob(sid) = js.jobId)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = synchronized {
        jobs.get(je.jobId).foreach(_.end = je.time)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = synchronized {
        val si = sc.stageInfo
        stageToJob.get(si.stageId).flatMap(jobs.get).foreach { j =>
          j.stages += 1
          j.tasks += si.numTasks
          j.execRunMs += si.taskMetrics.executorRunTime
          j.cpuMs += si.taskMetrics.executorCpuTime / 1000000L
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[prof] unknown query: $name")
        case Some(fn) =>
          // warm once at the tiny SF (janino/JIT), mirror Bench
          try { fn(spark, "/root/testdata/sf0.001").queryExecution.toRdd.count() }
          catch { case _: Throwable => }
          spark.catalog.clearCache()
          org.apache.spark.sql.graftshim.Bridge.unloadStateStores()
          System.gc()
          jobs.clear(); stageToJob.clear()
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).queryExecution.toRdd.count() }
          catch { case e: Throwable => System.err.println(s"[prof] $name: $e") }
          Thread.sleep(300) // let the listener bus drain
          val wallS = (System.nanoTime() - t0) / 1e9
          val snap = synchronized { jobs.values.toVector }
          val jobWall = snap.map(j => math.max(0L, j.end - j.start)).sum / 1e3
          val execS = snap.map(_.execRunMs).sum / 1e3
          val cpuS = snap.map(_.cpuMs).sum / 1e3
          println(f"%n==== $name%s wall=$wallS%.2fs jobs=${snap.size}%d " +
            f"jobWall=$jobWall%.2fs driverGap=${wallS - jobWall}%.2fs " +
            f"execRun=$execS%.2fs cpu=$cpuS%.2fs tasks=${snap.map(_.tasks).sum}%d")
          snap.sortBy(j => -(j.end - j.start)).take(25).foreach { j =>
            println(f"  job ${j.id}%4d  wall=${(j.end - j.start) / 1e3}%7.3fs " +
              f"stages=${j.stages}%3d tasks=${j.tasks}%5d " +
              f"execRun=${j.execRunMs / 1e3}%7.3fs cpu=${j.cpuMs / 1e3}%7.3fs")
          }
      }
    }
    spark.stop()
  }
}
