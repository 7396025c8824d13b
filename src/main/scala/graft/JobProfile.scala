package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Diagnostic main (optimization rounds): run one named query and print
  * every Spark job it launches — start offset, duration, task count, and
  * the job's description/callsite — so driver-side job storms (many tiny
  * scheduler round trips) are visible without the UI. Not part of the
  * driver contract; used by OPTIMIZATION_r13.md measurements.
  *
  * Usage: JobProfile <sfDir> <queryName> [repeat]
  */
object JobProfile {
  private final class JobLog extends SparkListener {
    case class J(id: Int, t0: Long, desc: String, var t1: Long = -1L,
        var tasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]
    val order = new java.util.concurrent.CopyOnWriteArrayList[Int]
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      val desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .orElse(Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))))
        .getOrElse("")
      jobs.put(e.jobId, J(e.jobId, System.nanoTime(), desc,
        tasks = e.stageInfos.map(_.numTasks).sum))
      order.add(e.jobId): Unit
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      val j = jobs.get(e.jobId)
      if (j != null) j.t1 = System.nanoTime()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val repeat = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-jobprofile")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // TIMESTAMP_MICROS: ordered footer stats for ZoneMaps.statsForPaths
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to repeat).foreach { i =>
      val log = new JobLog
      spark.sparkContext.addSparkListener(log)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
      spark.sparkContext.removeSparkListener(log)
      println(f"== run $i: $name total $total%.3f s, ${log.order.size} jobs")
      var covered = 0.0
      log.order.forEach { id =>
        val j = log.jobs.get(id)
        val dur = if (j.t1 > 0) (j.t1 - j.t0) / 1e9 else -1.0
        val off = (j.t0 - t0) / 1e9
        if (dur > 0) covered += dur
        println(f"  job $id%4d off=$off%7.3f dur=$dur%7.3f tasks=${j.tasks}%4d  ${j.desc.take(90)}")
      }
      println(f"  [sum of job durations: $covered%.3f s — gap vs total is driver-side]")
    }
    spark.stop()
  }
}
