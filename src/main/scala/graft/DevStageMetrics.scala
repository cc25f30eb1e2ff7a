package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

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
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTITIONS", (cpus.toInt * 8).toString))
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "true"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", "64m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "10000")
      .config("spark.sql.ui.retainedExecutions", "10")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class St(name: String, tasks: Int, runMs: Long, cpuMs: Long,
        shufReadMb: Double, shufWriteMb: Double, spillMemMb: Double,
        spillDiskMb: Double, inRows: Long, outRows: Long, maxTaskMs: Long)
    val stages = mutable.ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val m = i.taskMetrics
        stages += St(
          i.name.takeWhile(_ != '\n').take(60), i.numTasks,
          m.executorRunTime, m.executorCpuTime / 1000000,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.memoryBytesSpilled / 1e6, m.diskBytesSpilled / 1e6,
          m.inputMetrics.recordsRead, m.outputMetrics.recordsWritten,
          // taskMetrics has no per-task max; stage wall-clock is the proxy
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L))
      }
    })

    val fn = SparkEntry.queries(qname)
    (1 to reps).foreach { rep =>
      stages.clear()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // let the listener bus drain before reading the buffer
      Thread.sleep(1500)
      println(f"== $qname rep $rep: $sec%.2f s, output rows $n")
      println(f"${"stage"}%-60s ${"tasks"}%5s ${"wall_s"}%7s ${"run_s"}%7s ${"cpu_s"}%7s ${"shR_MB"}%8s ${"shW_MB"}%8s ${"spillM"}%7s ${"spillD"}%7s ${"in_rows"}%10s")
      stages.foreach { s =>
        println(f"${s.name}%-60s ${s.tasks}%5d ${s.maxTaskMs / 1e3}%7.1f ${s.runMs / 1e3}%7.1f ${s.cpuMs / 1e3}%7.1f ${s.shufReadMb}%8.1f ${s.shufWriteMb}%8.1f ${s.spillMemMb}%7.0f ${s.spillDiskMb}%7.0f ${s.inRows}%10d")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    spark.stop()
  }
}
