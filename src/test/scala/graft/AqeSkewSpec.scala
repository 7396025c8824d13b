package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Proves the engine's OTHER skew path next to Skew.saltedJoin: AQE's
  * runtime skew-join split, with the thresholds the engine recommends for
  * known-skewed workloads. Own session — skew configs must be set before
  * planning, and the shared TestSpark session shouldn't inherit them. */
class AqeSkewSpec extends AnyFunSuite {

  private lazy val spark = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-aqe-skew-spec")
      // static conf — must match every other context creator in test
      // scope (see TestSpark's note)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // local-scale thresholds: a real deployment uses the 256MB defaults;
      // the MECHANISM under test is identical
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    s
  }

  test("AQE splits a skewed join partition at runtime (skew=true in final plan)") {
    import spark.implicits._
    // one hot key carrying ~100k rows with INCOMPRESSIBLE payloads (shuffle
    // sizes are post-lz4; repetitive payloads would compress under the skew
    // threshold) vs uniform rest
    val hot = (0 until 100000).map(i =>
      ("hot", (0 until 8).map(j => f"${(i * 8 + j) * 0x9E3779B97F4A7C15L}%016x").mkString))
    val rest = (1 to 1000).map(i => (s"k$i", "y"))
    val large = (hot ++ rest).toDF("k", "payload").repartition(4)
    val small = (Seq("hot") ++ (1 to 1000).map(i => s"k$i")).map((_, 1))
      .toDF("k", "v")
    val joined = large.join(small, "k")
    // execute THIS dataframe's plan (count() would run a derived plan and
    // leave joined's AdaptiveSparkPlan non-final, before skew handling)
    assert(joined.collect().length == 101000)
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"expected AQE skew split in final plan:\n$finalPlan")
  }
}
