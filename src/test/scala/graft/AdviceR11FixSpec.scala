package graft

import java.io.{File, IOException}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{BloomIndex, Store, ZoneMaps}

/** Pins the four round-11 ADVICE findings.
  *
  *  1. countRangeIndexed multi-conjunct: a stats row with populated bounds
  *     but NULL null-counts (pre-nnull rows through mergeSchema, or static
  *     ZoneMaps.build output) must fall back to SCANNING the file, never
  *     silently drop it from the count.
  *  2. sweepStaleStaging: a swept-mid-write stage must be UNCOMMITTABLE —
  *     the sweeper consumes the liveness sentinel, so a straggler-recreated
  *     partial batch fails its commit claim instead of renaming in.
  *  3. withCompactionLease: the lease file is BORN holding the ownership
  *     token (CREATE_NEW), no post-acquire write window.
  *  4. statsNumFiles prices the bloom row arithmetically — parity with the
  *     size the allocation-based formula reported, across the (n,fpp) grid.
  */
class AdviceR11FixSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmp(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_advfix_")
  private def sweep(p: java.nio.file.Path): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile): Unit
  }

  test("count pushdown multi-conjunct: contained file with UNKNOWN null counts is scanned, not dropped") {
    val base = tmp()
    try {
      val (dataDir, statsDir) = (s"$base/data", s"$base/stats")
      // file A: proper admitIndexed stats (nnull columns present, zero)
      val a = spark.range(0, 1000)
        .select(($"id" % 100).as("v"), ($"id" % 50).as("w"))
      assert(ZoneMaps.admitIndexed(a.coalesce(1), dataDir, statsDir,
        Seq("v", "w"), "a"))
      // file B: data admitted, stats row handcrafted WITHOUT nnull columns
      // — the exact shape static ZoneMaps.build emits and pre-nnull stores
      // read back through mergeSchema
      val b = spark.range(0, 500)
        .select(($"id" % 100 + 200).as("v"), ($"id" % 50).as("w"))
      assert(Store.appendIdempotent(b.coalesce(1), dataDir, "b"))
      val bFile = BloomIndex.canonPath(
        new File(dataDir, "delta-b").listFiles()
          .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath)
      Store.append(Seq((bFile, 500L, 200L, 299L, 0L, 49L))
        .toDF("file", "n_rows", "min_v", "max_v", "min_w", "max_w")
        .coalesce(1), statsDir)
      // box fully contains BOTH files on both conjuncts
      val (n, (scanned, total)) = ZoneMaps.countRangeIndexed(spark, dataDir,
        statsDir, Seq(("v", lit(-1L), lit(1000L)), ("w", lit(-1L), lit(1000L))))
      assert(total == 2)
      assert(n == 1500L,
        s"file with unknown null counts must still be counted (scanned): $n")
      assert(scanned == 1,
        s"A answers from metadata, B (unknown nnull) scans: $scanned files")
    } finally sweep(base)
  }

  test("a swept-mid-write stage can never commit a straggler-recreated partial batch") {
    val base = tmp()
    try {
      val dir = s"$base/store"
      Store.append(Seq((1L, "seed")).toDF("id", "v"), dir)
      val staged = Seq((2L, "b"), (3L, "c")).toDF("id", "v")
      val (tmpDir, fin) = Store.stage(staged, dir)
      // age the entry AND its sentinel past the sweep window (a stuck
      // straggler is mtime-quiet even though the job is still "running")
      def backdate(f: File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(backdate)
        f.setLastModified(System.currentTimeMillis() - 3600 * 1000L): Unit
      }
      backdate(Store.stagingDir(dir))
      Store.sweepStaleStaging(dir)
      assert(!tmpDir.exists(), "stale stage must be swept")
      // straggler tasks path-recreate the entry; the job commit merges the
      // survivors and stamps _SUCCESS — a silently PARTIAL batch
      assert(tmpDir.mkdirs())
      new File(tmpDir, "_SUCCESS").createNewFile(): Unit
      new File(tmpDir, "part-00000-partial.parquet").createNewFile(): Unit
      val e = intercept[IOException] { Store.commitStaged(tmpDir, fin) }
      assert(e.getMessage.contains("sentinel"), e.getMessage)
      assert(!fin.exists(), "the partial batch must never reach the store")
      assert(Store.read(spark, dir).count() == 1L)
    } finally sweep(base)
  }

  test("sweep never reaps a fresh stage or a freshly-claimed commit; commit still works after a benign sweep pass") {
    val base = tmp()
    try {
      val dir = s"$base/store"
      Store.append(Seq((1L, "seed")).toDF("id", "v"), dir)
      val (tmpDir, fin) = Store.stage(Seq((2L, "b")).toDF("id", "v"), dir)
      // a sweep pass over a FRESH stage must be a no-op...
      Store.sweepStaleStaging(dir)
      assert(tmpDir.exists())
      // ...and the commit then proceeds normally (sentinel intact)
      Store.commitStaged(tmpDir, fin)
      assert(fin.exists())
      assert(Store.read(spark, dir).count() == 2L)
      // an entry whose sentinel a committer CLAIMED (fresh .commit- marker,
      // stale entry: committer paused between claim and rename) is skipped
      val (tmp2, _) = Store.stage(Seq((3L, "c")).toDF("id", "v"), dir)
      val sd = Store.stagingDir(dir)
      val live = new File(sd, s".live-${tmp2.getName}")
      val claim = new File(sd, s".commit-${tmp2.getName}")
      assert(live.renameTo(claim))
      def backdateTree(f: File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(backdateTree)
        f.setLastModified(System.currentTimeMillis() - 3600 * 1000L): Unit
      }
      backdateTree(tmp2)
      Store.sweepStaleStaging(dir)
      assert(tmp2.exists(), "claimed entry with a live committer must survive")
      // once the claim marker itself goes stale the committer is dead: reap
      claim.setLastModified(System.currentTimeMillis() - 3600 * 1000L): Unit
      Store.sweepStaleStaging(dir)
      assert(!tmp2.exists() && !claim.exists(),
        "crashed committer's claimed entry is reaped once the marker is stale")
    } finally sweep(base)
  }

  test("compaction lease is born holding its ownership token — no empty-lease window") {
    val base = tmp()
    try {
      val dir = s"$base/store"
      new File(dir).mkdirs(): Unit
      val lease = new File(dir + ".lease")
      Store.withCompactionLease(dir) {
        val content = new String(
          java.nio.file.Files.readAllBytes(lease.toPath), "UTF-8")
        assert(content.nonEmpty,
          "lease must carry the token from the instant it exists")
        // token format: a UUID, i.e. parseable
        java.util.UUID.fromString(content): Unit
      }
      assert(!lease.exists(), "release deletes an owned lease")
    } finally sweep(base)
  }

  test("statsNumFiles arithmetic sizing matches the allocation-based size") {
    for (n <- Seq(1000L, 100000L, 1L << 20); fpp <- Seq(0.01, 0.03)) {
      val allocated = org.apache.spark.util.sketch.BloomFilter
        .create(n, fpp).bitSize() / 8 + 64
      for (files <- Seq(1, 100, 100000)) {
        val want = math.max(1L,
          (files.toLong * allocated + (64L << 20) - 1) / (64L << 20)).toInt
        assert(BloomIndex.statsNumFiles(files, n, fpp) == want,
          s"n=$n fpp=$fpp files=$files")
      }
    }
  }
}
