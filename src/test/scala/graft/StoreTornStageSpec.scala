package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ProtocolPoints, Store}

/** Signals shared between the repro's Spark tasks (local mode: same JVM)
  * and the compaction thread. */
object TornSignals {
  @volatile var task0Done: java.util.concurrent.CountDownLatch = null
  @volatile var swapDone: java.util.concurrent.CountDownLatch = null
}

/** Deterministic reproducer for the full-suite StoreMultiJvmSpec loss
  * (delta-cA-b2 torn down to a lone ._SUCCESS.crc, one whole batch gone):
  * a foreign-JVM stage WRITE in flight across the swap. Task 0 of the
  * staging write commits its output BEFORE the aside-rename (so it
  * travels into `.old` and is destroyed with it); tasks 1-3 write AFTER
  * the swap, path-recreating the hidden staging dir inside the NEW live
  * store; the job commit then merges only the surviving task outputs and
  * stamps _SUCCESS, so the append "succeeds" with a quarter of its rows
  * silently gone. Uses stage/commitStaged directly on a raw thread — the
  * in-process admit lock would serialize this, which is exactly what a
  * foreign JVM does not have. */
class StoreTornStageSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("stage write split across the swap: append must not report success and lose rows") {
    val base = java.nio.file.Files.createTempDirectory("graft_torn_").toString
    val dir = s"$base/store"
    try {
      Store.append(Seq.tabulate(100)(i => ("base", 0L, i.toLong))
        .toDF("child", "batch", "row"), dir)
      TornSignals.task0Done = new java.util.concurrent.CountDownLatch(1)
      TornSignals.swapDone = new java.util.concurrent.CountDownLatch(1)
      val gate = udf { (i: Long) =>
        if (i == 0L) TornSignals.task0Done.countDown()
        else TornSignals.swapDone.await(
          30, java.util.concurrent.TimeUnit.SECONDS): Unit
        i
      }
      val slowDf = spark.range(0, 4, 1, 4)
        .select(lit("kid").as("child"), lit(1L).as("batch"),
          gate($"id").as("row"))
      @volatile var outcome: Either[Throwable, Unit] = null
      val t = new Thread(() => {
        outcome =
          try { val (tmp, fin) = Store.stage(slowDf, dir); Store.commitStaged(tmp, fin); Right(()) }
          catch { case e: Throwable => Left(e) }
      })
      t.start()
      ProtocolPoints.install {
        case "promote.pre-aside" =>
          // the aside must capture task 0's committed output
          TornSignals.task0Done.await(30, java.util.concurrent.TimeUnit.SECONDS): Unit
          Thread.sleep(500) // let task 0's task-commit rename land
        case "promote.swapped" =>
          // new image is live; release tasks 1-3 BEFORE rm(.old) runs
          TornSignals.swapDone.countDown()
          Thread.sleep(300)
        case _ => ()
      }
      val compacted =
        try { Store.compact(spark, dir, numFiles = 2); true }
        catch { case _: java.io.IOException => false }
        finally ProtocolPoints.uninstall()
      t.join(120000)
      val n = Store.read(spark, dir).filter($"child" === "kid").count()
      info(s"compacted=$compacted append=${outcome match { case null => "hung"; case Right(_) => "ok"; case Left(e) => e.getClass.getSimpleName + ": " + e.getMessage.take(80) }} kidRows=$n")
      outcome match {
        case Right(_) => assert(n == 4L,
          s"append reported success but only $n/4 rows are readable (torn batch)")
        case _ => assert(n == 0L || n == 4L,
          s"failed append left a PARTIAL batch visible: $n/4")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base)): Unit
    }
  }
}
