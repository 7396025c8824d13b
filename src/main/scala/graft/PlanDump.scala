package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main (optimization rounds): print `.explain("formatted")` for
  * named queries, for the committed plans/rNN before/after artifacts.
  * Usage: PlanDump <sfDir> <outDir> <suffix> <query>[,query...] [distributed]
  * The optional `distributed` flag zeroes the bounded-driver-object caps
  * (BPE vocabulary, CC rows, PageRank edges) so the pre-r13 distributed
  * loop plans can be regenerated from HEAD for the before/after files. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, names) = args.take(4)
    if (args.length > 4 && args(4) == "distributed") {
      graft.queries.BpeVocab.driverBpeMaxWords = 0
      graft.queries.Dedup.driverCcMaxRows = 0
      graft.queries.GraphQueries.driverIterMaxEdges = 0
    }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-plandump")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // TIMESTAMP_MICROS: ordered footer stats for ZoneMaps.statsForPaths
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.split(',').foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
