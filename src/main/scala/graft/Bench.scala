package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, timing full materialization through the `noop` sink
  * (computes everything, writes nothing, no driver collect), and prints ONE
  * JSON line for the driver.
  *
  * Each query is timed over SPARK_GRAFT_BENCH_RUNS runs (default 3) and
  * reported as the MEDIAN (plus min, under `queries_min`) — single-shot
  * timing on a busy 32-thread JVM produced 2×+ phantom regressions between
  * rounds. A query that throws on every run reports -1 and is listed under
  * `failures` instead of contributing its elapsed-to-failure time. */
object Bench {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one warmup pass of the flagship query amortizes JVM/codegen startup
    // out of the per-query numbers
    try SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val selected =
      if (args.nonEmpty) SparkEntry.queries.filter(kv => args.contains(kv._1))
      else SparkEntry.queries
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to runs).flatMap { i =>
        // queries that cache() intermediate sets (q12_setops) must not get
        // warm-cache medians while everything else measures cold
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name run $i failed: ${e.getMessage}")
          None
        }
      }
      (name, times)
    }
    def fmt(f: Seq[Double] => Double) = results
      .map { case (k, ts) => "\"" + k + "\":" + (if (ts.isEmpty) "-1" else f(ts)) }
      .mkString("{", ",", "}")
    val failures = results.collect { case (k, ts) if ts.isEmpty => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, ts) if ts.nonEmpty => median(ts) }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,""" +
      s""""queries":${fmt(median)},"queries_min":${fmt(_.min)},""" +
      s""""failures":$failures,"sf":"$sfDir"}""")
    spark.stop()
  }
}
