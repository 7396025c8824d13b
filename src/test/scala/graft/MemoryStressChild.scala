package graft

import org.apache.spark.sql.SparkSession

/** Child-JVM side of MemoryStressSpec: run the named queries at the given
  * sf dir under whatever -Xmx the parent imposed, materializing each
  * through the noop sink, and report per-query OK/FAIL lines. Each query
  * runs in its own try so one failure cannot shadow the rest — the parent
  * asserts on the full report. */
object MemoryStressChild {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-memory-stress-child")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // MORE partitions under LESS memory: the 100 TB posture — state per
      // partition must shrink with partition size, not with corpus size
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // TIMESTAMP_MICROS: ordered footer stats for ZoneMaps.statsForPaths
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(s"STRESS-OK $name")
      } catch { case e: Throwable =>
        println(s"STRESS-FAIL $name: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
      Console.out.flush()
    }
    println("STRESS-DONE"); Console.out.flush()
    spark.stop()
  }
}
