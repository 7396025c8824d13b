package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: prints `explain("formatted")` for the named queries
  * (or all). Used to audit pushdown / broadcast / shuffle structure:
  *   sbt "runMain graft.Explain q01_pricing_summary q03_join_revenue"
  * Things to look for: PushedFilters + narrow ReadSchema on scans,
  * BroadcastHashJoin for dims, no back-to-back Exchange nodes,
  * WholeStageCodegen spans covering the hot path. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // TIMESTAMP_MICROS: ordered footer stats for ZoneMaps.statsForPaths
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
