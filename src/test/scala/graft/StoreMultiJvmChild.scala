package graft

import java.io.File

import org.apache.spark.sql.SparkSession

import graft.sources.Store

/** Child-JVM side of [[StoreMultiJvmSpec]] — the cross-PROCESS half of the
  * Store's multi-writer contract. The in-process ReentrantReadWriteLock in
  * [[Store]] cannot see these JVMs, so whatever safety these children
  * observe is carried by the file protocol alone (atomic renames, the
  * `.lease` file, id witnesses), which is exactly what the spec wants to
  * prove.
  *
  * Modes (args(0)):
  *
  *  - `lease-hold <storeDir> <holdMs> <tag>` — no Spark. Wait for the
  *    parent's GO file, then attempt [[Store.withCompactionLease]] ONCE:
  *    print `<tag> ACQUIRED <nanos>` / `<tag> RELEASED <nanos>` around a
  *    `holdMs` sleep, or `<tag> REJECTED` if the lease is held. The parent
  *    asserts single-winner + non-overlap from these lines.
  *
  *  - `appender <storeDir> <childId> <nBatches> <rowsPerBatch>` — own
  *    SparkSession. Admit `nBatches` fresh-id batches via
  *    [[Store.appendIdempotent]], retrying (bounded) when a commit rename
  *    races the parent's compaction swap — the documented cross-JVM
  *    outcome: an append racing the two-rename window FAILS CLEANLY and
  *    retries; it never tears the store and never double-admits. Prints
  *    `ADMITTED <id>` per batch and `APPENDER-DONE <retries>` at the end.
  */
object StoreMultiJvmChild {
  def main(args: Array[String]): Unit = args(0) match {
    case "lease-hold" =>
      val dir = args(1); val holdMs = args(2).toLong; val tag = args(3)
      val go = new File(dir + ".go")
      println(s"$tag READY"); Console.out.flush()
      // bounded spin: a dead parent must not leave orphan children looping
      val goDeadline = System.currentTimeMillis() + 2 * 60 * 1000
      while (!go.exists()) {
        if (System.currentTimeMillis() > goDeadline) sys.exit(4)
        Thread.sleep(5)
      }
      try {
        Store.withCompactionLease(dir) {
          println(s"$tag ACQUIRED ${System.nanoTime()}"); Console.out.flush()
          Thread.sleep(holdMs)
          println(s"$tag RELEASED ${System.nanoTime()}"); Console.out.flush()
        }
      } catch {
        case _: IllegalStateException =>
          println(s"$tag REJECTED"); Console.out.flush()
      }

    case "appender" =>
      val dir = args(1); val childId = args(2)
      val nBatches = args(3).toInt; val rowsPerBatch = args(4).toInt
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName(s"graft-store-mjvm-$childId")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      import spark.implicits._
      var retries = 0
      (0 until nBatches).foreach { b =>
        val id = s"c$childId-b$b"
        val df = Seq.tabulate(rowsPerBatch)(j =>
          (childId, b.toLong, j.toLong)).toDF("child", "batch", "row")
        var admitted = false
        var attempts = 0
        while (!admitted && attempts < 60) {
          attempts += 1
          try {
            Store.appendMaybeIdempotent(df, dir, Some(id)): Unit
            admitted = true // admitted by this call OR witnessed already-admitted
          } catch {
            // not just IOException: a stage write racing the parent's
            // compaction cleanup can also surface as SparkException (job
            // aborted when the swap captures the in-flight staging dir) —
            // both are the documented clean-failure-and-retry outcome, and
            // the id contract makes the retry exactly-once either way
            case scala.util.control.NonFatal(_) => retries += 1; Thread.sleep(20)
          }
        }
        if (!admitted) { println(s"ADMIT-FAILED $id"); Console.out.flush(); sys.exit(3) }
        println(s"ADMITTED $id"); Console.out.flush()
      }
      println(s"APPENDER-DONE $retries"); Console.out.flush()
      spark.stop()

    case "bloom-appender" =>
      // admitIndexed (data + per-file blooms under one id) from a foreign
      // JVM while the parent compacts/heals both stores: the composition's
      // clean-failure-and-retry contract, cross-process. Keys are disjoint
      // per (child, batch, row) so the parent can point-look-up exact rows.
      val base = args(1); val childId = args(2)
      val nBatches = args(3).toInt; val rowsPerBatch = args(4).toInt
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName(s"graft-bloom-mjvm-$childId")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      import spark.implicits._
      val childOffset = (childId.hashCode.toLong & 0xff) * 10000000L
      var retries = 0
      (0 until nBatches).foreach { b =>
        val id = s"c$childId-b$b"
        val df = Seq.tabulate(rowsPerBatch)(j =>
          (childOffset + b.toLong * 100000 + j, childId, b.toLong))
          .toDF("k", "child", "batch")
        var admitted = false
        var attempts = 0
        while (!admitted && attempts < 60) {
          attempts += 1
          try {
            graft.sources.BloomIndex.admitIndexed(df, s"$base/data",
              s"$base/stats", "k", id): Unit
            admitted = true
          } catch {
            case scala.util.control.NonFatal(_) => retries += 1; Thread.sleep(20)
          }
        }
        if (!admitted) { println(s"ADMIT-FAILED $id"); Console.out.flush(); sys.exit(3) }
        println(s"ADMITTED $id"); Console.out.flush()
      }
      println(s"APPENDER-DONE $retries"); Console.out.flush()
      spark.stop()

    case other => sys.error(s"unknown mode $other")
  }
}
