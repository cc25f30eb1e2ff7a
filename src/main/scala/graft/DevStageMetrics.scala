package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev harness: run one `SparkEntry` query under the BENCH session config
  * and print per-stage task counts, shuffle bytes, and spill — the "audit
  * task counts, not wall time" instrument (SCALE_r08 takeaway #5; VERDICT
  * r8 #2/#3 ask exactly this for q34/q42).
  *
  *   runMain graft.DevStageMetrics <sfDir> <queryName> [reps]
  *
  * Session confs mirror graft.Bench (same env overrides), so the stages
  * observed here are the stages the bench measures.
  */
object DevStageMetrics {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val qname = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    // the ONE bench config block — see Bench.benchSession's scaladoc
    val spark = Bench.benchSession()
    // GRAFT_CONF="k=v;k=v" — extra session confs (A/B the conf-gated paths)
    sys.env.get("GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })

    case class St(name: String, tasks: Int, runMs: Long, cpuMs: Long,
        shufReadMb: Double, shufWriteMb: Double, spillMemMb: Double,
        spillDiskMb: Double, inRows: Long, outRows: Long, maxTaskMs: Long)
    // appended on the listener-bus thread, cleared/read on main: guard
    // every access with the buffer's own lock (the main thread reads only
    // after a synchronous bus drain, but the lock keeps the read untorn)
    val stages = mutable.ArrayBuffer.empty[St]
    // job-level accounting: at sf0.1 the composed pipelines' wall time is
    // dominated by the gaps BETWEEN jobs (planning, AQE replanning, job
    // scheduling), not by stage compute — count the jobs and their summed
    // wall so the gap is measurable (r17)
    val jobs = mutable.ArrayBuffer.empty[(Int, Long, String)] // (jobId, wallMs, callSite)
    val jobStarts = mutable.Map.empty[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.synchronized {
          val site = js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n').take(70)).getOrElse("?")
          jobStarts(js.jobId) = (js.time, site)
        }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobStarts.remove(je.jobId).foreach { case (t0, site) =>
            jobs += ((je.jobId, je.time - t0, site))
          }
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val m = i.taskMetrics
        stages.synchronized { stages += St(
          i.name.takeWhile(_ != '\n').take(60), i.numTasks,
          m.executorRunTime, m.executorCpuTime / 1000000,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.memoryBytesSpilled / 1e6, m.diskBytesSpilled / 1e6,
          m.inputMetrics.recordsRead, m.outputMetrics.recordsWritten,
          // taskMetrics has no per-task max; stage wall-clock is the proxy
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) }
      }
    })

    val fn = SparkEntry.queries(qname)
    (1 to reps).foreach { rep =>
      stages.synchronized { stages.clear() }
      jobs.synchronized { jobs.clear(); jobStarts.clear() }
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // synchronous listener-bus drain: every StageCompleted for the jobs
      // above is delivered before the read — no straggler is missed for
      // this rep or leaks into the next rep's buffer (ADVICE r9). A
      // backlogged bus degrades to a partial read with a warning instead
      // of crashing the run (ADVICE r10).
      if (!org.apache.spark.GraftListenerBridge.waitListenerBusEmpty(spark.sparkContext))
        System.err.println(s"[dev] warning: listener bus did not drain in 10 s — " +
          s"rep $rep stage table may be partial")
      val snap = stages.synchronized { stages.toVector }
      val jsnap = jobs.synchronized { jobs.toVector }
      println(f"== $qname rep $rep: $sec%.2f s, output rows $n")
      println(f"== jobs ${jsnap.size}, job wall sum ${jsnap.map(_._2).sum / 1e3}%.2f s, " +
        f"stage wall sum ${snap.map(_.maxTaskMs).sum / 1e3}%.2f s " +
        f"(gap to total = driver/planning time between jobs)")
      jsnap.sortBy(-_._2).take(15).foreach { case (id, ms, site) =>
        println(f"== job $id%4d ${ms / 1e3}%6.2f s  $site")
      }
      println(f"${"stage"}%-60s ${"tasks"}%5s ${"wall_s"}%7s ${"run_s"}%7s ${"cpu_s"}%7s ${"shR_MB"}%8s ${"shW_MB"}%8s ${"spillM"}%7s ${"spillD"}%7s ${"in_rows"}%10s ${"out_rows"}%10s")
      snap.foreach { s =>
        println(f"${s.name}%-60s ${s.tasks}%5d ${s.maxTaskMs / 1e3}%7.1f ${s.runMs / 1e3}%7.1f ${s.cpuMs / 1e3}%7.1f ${s.shufReadMb}%8.1f ${s.shufWriteMb}%8.1f ${s.spillMemMb}%7.0f ${s.spillDiskMb}%7.0f ${s.inRows}%10d ${s.outRows}%10d")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    spark.stop()
  }
}
