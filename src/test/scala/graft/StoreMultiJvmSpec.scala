package graft

import java.io.{BufferedReader, File, InputStreamReader}
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Store

/** TWO-JVM proof of the Store's multi-writer contract (VERDICT r9 task 8):
  * the in-process admit/swap lock cannot see another JVM, so everything
  * asserted here is carried by the FILE protocol alone — atomic renames,
  * the `<dir>.lease` sibling, and per-id witnesses. Three claims, each
  * pinned with real forked JVMs (not threads):
  *
  *  1. LEASE MUTUAL EXCLUSION — N simultaneous coordinators in separate
  *     processes: exactly one acquires, the rest fail fast with the
  *     documented IllegalStateException (never a second holder, never a
  *     hang).
  *  2. STALE-LEASE RECLAIM IS SINGLE-WINNER — N processes racing to
  *     reclaim a crashed coordinator's stale lease: at most one acquires.
  *     This test killed TWO prior designs: delete-then-recreate (B's
  *     delete removes A's FRESH lease, both proceed) and
  *     rename-to-claim (staleness check and rename are two steps — this
  *     test produced 4 simultaneous holders across 4 JVMs). The shipped
  *     protocol takes reclaim rights via createNewFile on a tombstone.
  *  3. CROSS-JVM APPEND vs COMPACTION — appender JVMs admitting fresh-id
  *     batches (bounded retry on the documented clean-failure window)
  *     while this JVM compacts in a loop: every batch lands EXACTLY once —
  *     no loss from the swap, no double-admit from a retry whose earlier
  *     attempt actually committed.
  */
class StoreMultiJvmSpec extends AnyFunSuite {
  import TestSpark._

  private val childMain = "graft.StoreMultiJvmChild"

  private def freshStore(): String =
    Files.createTempDirectory("graft_mjvm_").toString + "/store"

  /** A child whose (merged) output is drained by EXACTLY ONE thread —
    * Spark logs would otherwise fill the 64K pipe and wedge the child, and
    * a second reader on the same stream (the first draft paired a drain
    * thread with ForkedJvm.awaitLine) steals the marker lines the test
    * barriers on. `await` polls the drained transcript instead of the
    * stream. */
  private final class Drained(args: Seq[String]) {
    val proc: Process = ForkedJvm.start(childMain, args)
    private val buf = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    private val t = new Thread(() => {
      val r = new BufferedReader(new InputStreamReader(proc.getInputStream))
      var line = r.readLine()
      while (line != null) { buf.add(line); line = r.readLine() }
    })
    t.setDaemon(true); t.start()

    def lines: Seq[String] = buf.toArray(Array.empty[String]).toSeq
    def await(marker: String, timeoutMs: Long = 120000): Boolean =
      ForkedJvm.awaitCond(lines.exists(_.contains(marker)), timeoutMs)
    def result(): Seq[String] = { proc.waitFor(); t.join(10000); lines }
  }

  private def leaseContest(store: String, n: Int, holdMs: Long,
      preStale: Boolean, preStaleTomb: Boolean = false): Seq[Seq[String]] = {
    new File(store).mkdirs()
    if (preStale) {
      val lease = new File(store + ".lease")
      assert(lease.createNewFile())
      assert(lease.setLastModified(System.currentTimeMillis() - 11L * 60 * 1000))
    }
    if (preStaleTomb) {
      // a reclaimer that crashed INSIDE the tombstone-held window
      val tomb = new File(store + ".lease-reclaim")
      assert(tomb.createNewFile())
      assert(tomb.setLastModified(System.currentTimeMillis() - 11L * 60 * 1000))
    }
    val kids = (0 until n).map(i =>
      new Drained(Seq("lease-hold", store, holdMs.toString, s"K$i")))
    try {
      // release the start barrier only once every contender is spinning on it
      kids.foreach(k => assert(k.await("READY", 60000), "child not ready"))
      assert(new File(store + ".go").createNewFile())
      val outs = kids.map(_.result())
      new File(store + ".go").delete(): Unit
      outs
    } finally kids.foreach(k => ForkedJvm.kill(k.proc)) // no orphans on failure
  }

  private def assertSingleHolder(outs: Seq[Seq[String]]): Unit = {
    val acquired = outs.flatten.filter(_.contains("ACQUIRED"))
    val rejected = outs.flatten.filter(_.contains("REJECTED"))
    assert(acquired.size == 1,
      s"exactly one coordinator must win, got: ${outs.flatten.mkString(" | ")}")
    assert(rejected.size == outs.size - 1,
      "every loser must fail fast with the documented rejection")
    // the winner released cleanly and dropped the lease
    assert(outs.flatten.count(_.contains("RELEASED")) == 1)
  }

  test("lease mutual exclusion across 4 real JVMs: one winner, three clean fail-fasts") {
    val store = freshStore()
    assertSingleHolder(leaseContest(store, n = 4, holdMs = 3000, preStale = false))
    assert(!new File(store + ".lease").exists(), "lease must be released")
  }

  test("stale-lease reclaim races: the tombstone protocol admits at most one winner") {
    val store = freshStore()
    assertSingleHolder(leaseContest(store, n = 4, holdMs = 2000, preStale = true))
    assert(!new File(store + ".lease").exists())
  }

  test("crashed-reclaimer sweep races: stale lease AND stale tombstone, one winner") {
    // the review-found composite: a reclaimer died inside the
    // tombstone-held window >staleMs ago; N contenders must sweep the
    // abandoned tombstone WITHOUT the delete-then-create pattern (which
    // would let two of them hold reclaim rights and race the lease swap)
    val store = freshStore()
    assertSingleHolder(
      leaseContest(store, n = 4, holdMs = 2000, preStale = true,
        preStaleTomb = true))
    assert(!new File(store + ".lease").exists())
  }

  test("bloom-indexed admits from 2 JVMs race compaction + heal: exact point lookups") {
    import org.apache.spark.sql.functions.{col, lit, max => smax}
    import graft.sources.BloomIndex
    val base = freshStore()
    new File(s"$base/data").mkdirs()
    val nBatches = 4; val rows = 150
    val kids = Seq("A", "B").map(id =>
      new Drained(Seq("bloom-appender", base, id, nBatches.toString, rows.toString)))
    // maintenance loop racing the admits: data compaction renames every
    // file (stats go stale), maintainIndex heals — both are allowed to be
    // DEFEATED by a racing admit (clean IOException) and simply retried
    var maintains = 0; var defeats = 0
    val deadline = System.currentTimeMillis() + 10 * 60 * 1000
    while (kids.exists(_.proc.isAlive) && System.currentTimeMillis() < deadline) {
      if (Store.hasData(s"$base/data")) {
        try {
          Store.compact(spark, s"$base/data", numFiles = 2)
          BloomIndex.maintainIndex(spark, s"$base/data", s"$base/stats", "k")
          maintains += 1
        } catch { case _: java.io.IOException => defeats += 1 }
      }
      Thread.sleep(300)
    }
    if (kids.exists(_.proc.isAlive)) {
      kids.foreach(k => ForkedJvm.kill(k.proc))
      fail("bloom appenders did not finish in 10 min; tails: " +
        kids.map(_.lines.takeRight(3).mkString("|")).mkString(" || "))
    }
    val outs = kids.map(_.result())
    outs.foreach(o => assert(o.exists(_.contains("APPENDER-DONE")),
      s"appender must finish, got tail: ${o.takeRight(5).mkString(" | ")}"))
    info(s"maintains=$maintains defeats=$defeats")
    // settle: one final heal so the index covers the final layout
    BloomIndex.maintainIndex(spark, s"$base/data", s"$base/stats", "k")
    val data = Store.read(spark, s"$base/data")
    assert(data.count() == 2L * nBatches * rows, "no loss, no double-admit")
    // exact point lookups through the index for one key per (child, batch)
    Seq("A", "B").foreach { child =>
      val off = (child.hashCode.toLong & 0xff) * 10000000L
      (0 until nBatches).foreach { b =>
        val key = off + b.toLong * 100000 // row j=0 of the batch
        val (df, (read, total)) = BloomIndex.lookupIndexed(spark,
          s"$base/data", s"$base/stats", "k", lit(key))
        val got = df.select(col("child"), col("batch")).collect()
        assert(got.length == 1 && got.head.getString(0) == child &&
          got.head.getLong(1) == b.toLong, s"key $key must resolve exactly")
        assert(read <= total)
      }
    }
  }

  test("appends from 2 foreign JVMs race a compaction loop: every batch lands exactly once") {
    val store = freshStore()
    new File(store).mkdirs()
    val nBatches = 6; val rows = 200
    val kids = Seq("A", "B").map(id =>
      new Drained(Seq("appender", store, id, nBatches.toString, rows.toString)))
    // compact continuously while the appenders run; promote defeats and
    // mid-swap commit failures are the documented cross-JVM outcomes —
    // the parent retries, the children retry, nobody tears the store
    var compactions = 0; var defeats = 0
    val deadline = System.currentTimeMillis() + 10 * 60 * 1000
    while (kids.exists(_.proc.isAlive) && System.currentTimeMillis() < deadline) {
      if (Store.hasData(store)) {
        try { Store.compact(spark, store, numFiles = 2); compactions += 1 }
        catch { case _: java.io.IOException => defeats += 1 }
      }
      Thread.sleep(250)
    }
    if (kids.exists(_.proc.isAlive)) {
      kids.foreach(k => ForkedJvm.kill(k.proc))
      fail(s"appenders did not finish in 10 min; tails: " +
        kids.map(_.lines.takeRight(3).mkString("|")).mkString(" || "))
    }
    val outs = kids.map(_.result())
    outs.foreach(o => assert(o.exists(_.contains("APPENDER-DONE")),
      s"appender must finish all batches, got tail: ${o.takeRight(5).mkString(" | ")}"))
    assert(compactions >= 1, "the loop must have compacted at least once mid-run")
    info(s"compactions=$compactions defeats=$defeats " +
      s"retries=${outs.flatten.filter(_.contains("APPENDER-DONE")).mkString(",")}")
    // one final fold so the count below also covers post-run compaction
    Store.compact(spark, store, numFiles = 2)
    val fin = Store.read(spark, store)
    assert(fin.count() == 2L * nBatches * rows, "no loss, no double-admit")
    val perBatch = fin.groupBy("child", "batch").agg(count("*").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(perBatch.size == 2 * nBatches, "every (child,batch) id present")
    assert(perBatch.values.forall(_ == rows.toLong),
      s"every batch exactly once, got ${perBatch.filter(_._2 != rows.toLong)}")
  }
}
