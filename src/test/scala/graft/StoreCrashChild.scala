package graft

import org.apache.spark.sql.SparkSession

import graft.sources.Store

/** Child-JVM side of StoreCrashSpec: runs one admission protocol step and
  * hangs at a scripted point so the parent can SIGKILL it there.
  *
  * args: <storeDir> <mode>
  *  - big-stage:    stage a multi-second batch (parent kills MID-WRITE the
  *                  moment the staging-sibling entry appears), never
  *                  commits;
  *  - stage-hang:   stage a small batch fully, print STAGED, hang — the
  *                  crash window between stage and rename;
  *  - stage-commit: stage, print STAGED, commit immediately, print
  *                  COMMITTED, hang — the parent kills racing the rename,
  *                  so the observed store must be one of the two legal
  *                  states, never a third.
  * The deterministic batch is ids [1000, 2000) so the parent can recognize
  * full admission by content. */
object StoreCrashChild {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = args(1)
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-store-crash-child")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    def hang(): Unit = { Console.out.flush(); Thread.sleep(600000) }
    mode match {
      case "big-stage" =>
        // bulky payload => a stage write long enough to kill mid-flight
        val big = spark.range(0, 2000000, 1, 8)
          .select($"id", org.apache.spark.sql.functions
            .sha2($"id".cast("string"), 256).as("payload"))
        println("STAGING"); Console.out.flush()
        Store.stage(big, dir)
        println("STAGED"); hang()
      case "stage-hang" =>
        val batch = spark.range(1000, 2000).select($"id")
        Store.stage(batch, dir)
        println("STAGED"); hang()
      case "stage-commit" =>
        val batch = spark.range(1000, 2000).select($"id")
        val (tmp, fin) = Store.stage(batch, dir)
        println("STAGED"); Console.out.flush()
        Store.commitStaged(tmp, fin)
        println("COMMITTED"); hang()
      case other => sys.error(s"unknown mode $other")
    }
  }
}
