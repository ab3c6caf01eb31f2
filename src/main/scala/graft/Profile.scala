package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-job profile of one registered lane — the measurement tool the
  * optimization rounds use to see WHERE a lane's seconds go (the Spark UI
  * is disabled in bench sessions; this is the listener-based equivalent
  * of reading the Jobs page, guide §1/§7).
  *
  * Usage: runMain graft.Profile <query> [<query>...]
  *
  * Protocol matches graft.Bench exactly: caches cleared BEFORE the
  * warm-up, then one warm-up run, then the profiled run against warm
  * caches. Prints one line per Spark job: duration, #tasks, call site.
  * The sum of job times vs the wall time exposes driver-side gaps
  * (planning, commit protocol, fs metadata, streaming startup); jobs
  * overlapping in time (AQE stage materialization, parallel actions)
  * make the sum exceed the wall.
  */
object Profile {
  private case class JobRow(id: Int, desc: String, stages: Seq[Int], started: Long,
      var ended: Long = -1L, var tasks: Int = 0, var stageTimeMs: Long = 0L)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Profile <query> [<query>...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-profile")
    val fns = SparkEntry.queries
    args.foreach { name =>
      require(fns.contains(name), s"unknown query: $name")
      def run(): Unit =
        fns(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      // the Bench protocol: drop earlier lanes' caches, then warm up once
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      run() // warm-up; this lane's own caches stay hot, like Bench's timed runs
      val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, JobRow]
      val stageToJob = scala.collection.mutable.HashMap.empty[Int, Int]
      val listener = new SparkListener {
        override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
          val props = Option(e.properties)
          val long = props.flatMap(p => Option(p.getProperty("callSite.long"))).getOrElse("")
          // first graft-source frame in the action's call site — the line
          // that tells us WHICH operator issued the job
          val frame = long.split('\n').find(l => l.contains("graft.") && !l.contains("Profile"))
            .map(_.trim).getOrElse("")
          val short = props.flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
          val desc = s"$short | $frame"
          val sids = e.stageInfos.map(_.stageId)
          sids.foreach(sid => stageToJob(sid) = e.jobId)
          jobs(e.jobId) = JobRow(e.jobId, desc, sids, e.time)
        }
        override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
          jobs.get(e.jobId).foreach(_.ended = e.time)
        }
        override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
          jobs.synchronized {
            val si = e.stageInfo
            stageToJob.get(si.stageId).flatMap(jobs.get).foreach { j =>
              j.tasks += si.numTasks
              for (s <- si.submissionTime; c <- si.completionTime) j.stageTimeMs += c - s
            }
          }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      run()
      val wall = (System.nanoTime() - t0) / 1e9
      // drain the listener bus COMPLETELY (a fixed sleep dropped late
      // job-end events on a loaded bus and understated durations —
      // ADVICE r17)
      org.apache.spark.sql.graft.ColumnBridge.drainListenerBus(spark.sparkContext, 30000L)
      spark.sparkContext.removeSparkListener(listener)
      val rows = jobs.values.toSeq
      val jobSum = rows.collect { case r if r.ended > 0 => (r.ended - r.started) / 1e3 }.sum
      println(f"== $name: wall $wall%.3f s, ${rows.size} jobs summing $jobSum%.3f s " +
        f"(driver-side gap ${wall - jobSum}%.3f s)")
      val base = rows.headOption.map(_.started).getOrElse(0L)
      rows.foreach { r =>
        val dur = if (r.ended > 0) (r.ended - r.started) / 1e3 else -1.0
        println(f"  job ${r.id}%3d  @${(r.started - base) / 1e3}%7.3f  ${dur}%7.3f s " +
          f"(stage-time ${r.stageTimeMs / 1e3}%7.3f s) " +
          f"tasks=${r.tasks}%4d  ${r.desc.take(90)}")
      }
    }
    spark.stop()
  }
}
