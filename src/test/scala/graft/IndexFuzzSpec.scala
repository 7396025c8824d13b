package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{BloomIndex, Store, ZoneMaps}

/** Randomized-interleaving fuzz of the INDEXED-store state machine — the
  * StoreFuzzSpec idea one layer up. One data store carries BOTH index
  * faces (bloom on `k`, zone map on `v`); a seeded RNG drives a random
  * walk over the full protocol surface:
  *
  *   indexed admit (both faces, one id) / RAW admit (the crash window: data
  *   committed, stats never written) / replay of a past id / compaction
  *   (random numFiles x {bin-pack, clusterBy, zOrder}) / heal of either
  *   index / point, range, and batched lookups.
  *
  * After EVERY lookup the result is compared row-exactly against a
  * driver-side reference of all admitted rows — so any reachable
  * interleaving of coverage states (covered / uncovered / stale / healed /
  * duplicated) that loses or invents a row fails immediately, with the
  * seed printed for replay. Pruning is asserted only for correctness
  * (never a wrong skip); how MUCH prunes varies by walk and is not the
  * fuzzer's business. */
class IndexFuzzSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmp(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_idxfuzz_")
  private def sweep(p: java.nio.file.Path): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile): Unit
  }

  private def walk(seed: Long, ops: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val base = tmp()
    val (dataDir, bStats, zStats) = (s"$base/data", s"$base/bstats", s"$base/zstats")
    val admitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var nextBatch = 0
    val pastIds = scala.collection.mutable.ArrayBuffer.empty[(Int, Seq[(Long, Long, Long)])]
    def batchRows(b: Int): Seq[(Long, Long, Long)] = {
      val n = 40 + rnd.nextInt(80)
      // keys unique per batch (id = batch*1000 + i); k clusters per batch,
      // v spreads so range probes cross batches
      (0 until n).map(i => (b * 1000L + i, b * 100L + rnd.nextInt(100),
        rnd.nextInt(1000).toLong))
    }
    def df(rows: Seq[(Long, Long, Long)]) =
      rows.toDF("id", "k", "v").repartition(1 + rnd.nextInt(3))
    def checkPoint(): Unit = {
      val k = if (admitted.isEmpty || rnd.nextBoolean()) rnd.nextInt(5000).toLong
        else admitted(rnd.nextInt(admitted.size))._2
      val (got, (read, total)) = BloomIndex.lookupIndexed(spark, dataDir,
        bStats, "k", lit(k))
      val want = admitted.filter(_._2 == k).sorted
      assert(got.select($"id", $"k", $"v").as[(Long, Long, Long)]
        .collect().toSeq.sorted == want.toSeq,
        s"seed=$seed point lookup k=$k wrong (read $read/$total)")
    }
    def checkRange(): Unit = {
      val lo = rnd.nextInt(1000).toLong; val hi = lo + rnd.nextInt(300)
      val (got, (read, total)) = ZoneMaps.lookupRangeIndexed(spark, dataDir,
        zStats, Seq(("v", lit(lo), lit(hi))))
      val want = admitted.filter(r => r._3 >= lo && r._3 < hi).sorted
      assert(got.select($"id", $"k", $"v").as[(Long, Long, Long)]
        .collect().toSeq.sorted == want.toSeq,
        s"seed=$seed range lookup [$lo,$hi) wrong (read $read/$total)")
      // the metadata count must agree with the materialized rows in every
      // reachable coverage state (contained/straddling/uncovered/stale)
      val (cnt, _) = ZoneMaps.countRangeIndexed(spark, dataDir, zStats,
        Seq(("v", lit(lo), lit(hi))))
      assert(cnt == want.size,
        s"seed=$seed count pushdown [$lo,$hi) = $cnt, want ${want.size}")
      // ...and so must the metadata min/max (round-12), including the
      // no-match case (NULL/NULL)
      val mm = ZoneMaps.minMaxRangeIndexed(spark, dataDir, zStats,
        Seq(("v", lit(lo), lit(hi))), "v")._1.head()
      val gotMin = if (mm.isNullAt(0)) None else Some(mm.getLong(0))
      val gotMax = if (mm.isNullAt(1)) None else Some(mm.getLong(1))
      val vs = want.map(_._3)
      assert(gotMin == vs.minOption && gotMax == vs.maxOption,
        s"seed=$seed minmax pushdown [$lo,$hi) = ($gotMin,$gotMax), " +
          s"want (${vs.minOption},${vs.maxOption})")
    }
    def checkBatch(): Unit = {
      val ks = (0 until 1 + rnd.nextInt(4)).map(_ =>
        if (admitted.isEmpty || rnd.nextBoolean()) rnd.nextInt(5000).toLong
        else admitted(rnd.nextInt(admitted.size))._2).distinct
      val (got, perKey, _) = BloomIndex.lookupIndexedBatch(spark, dataDir,
        bStats, "k", ks.map(lit(_)))
      val want = admitted.filter(r => ks.contains(r._2)).sorted
      assert(got.select($"id", $"k", $"v").as[(Long, Long, Long)]
        .collect().toSeq.sorted == want.toSeq,
        s"seed=$seed batch lookup $ks wrong")
      assert(perKey.size == ks.size)
    }
    try {
      (0 until ops).foreach { _ =>
        rnd.nextInt(10) match {
          case 0 | 1 | 2 => // indexed admit through both faces, one id
            val b = nextBatch; nextBatch += 1
            val rows = batchRows(b)
            assert(BloomIndex.admitIndexed(df(rows), dataDir, bStats, "k", s"b$b"))
            ZoneMaps.admitIndexed(df(rows), dataDir, zStats, Seq("v"), s"b$b"): Unit
            admitted ++= rows
            pastIds += ((b, rows))
          case 3 => // RAW admit: the crash window (no stats on either face)
            val b = nextBatch; nextBatch += 1
            val rows = batchRows(b)
            assert(Store.appendIdempotent(df(rows), dataDir, s"b$b"))
            admitted ++= rows
            pastIds += ((b, rows))
          case 4 => // replay a past id: must no-op on data, may heal stats
            if (pastIds.nonEmpty) {
              val (b, rows) = pastIds(rnd.nextInt(pastIds.size))
              assert(!BloomIndex.admitIndexed(df(rows), dataDir, bStats, "k", s"b$b"),
                s"seed=$seed replay of b$b re-admitted data")
            }
          case 5 => // compaction in a random shape
            if (Store.hasData(dataDir)) rnd.nextInt(3) match {
              case 0 => Store.compact(spark, dataDir, 1 + rnd.nextInt(6))
              case 1 => Store.compact(spark, dataDir, 1 + rnd.nextInt(6),
                clusterBy = Seq("v"))
              case 2 => Store.compact(spark, dataDir, 1 + rnd.nextInt(6),
                clusterBy = Seq("k", "v"), zOrder = true)
            }
          case 6 =>
            if (Store.hasData(dataDir))
              BloomIndex.maintainIndex(spark, dataDir, bStats, "k")
          case 7 =>
            if (Store.hasData(dataDir))
              ZoneMaps.maintainIndex(spark, dataDir, zStats, Seq("v"))
          case 8 =>
            if (Store.hasData(dataDir)) { checkPoint(); checkRange() }
          case 9 =>
            if (Store.hasData(dataDir)) checkBatch()
        }
      }
      // closing audit: heal both, then every face must still be exact
      if (Store.hasData(dataDir)) {
        BloomIndex.maintainIndex(spark, dataDir, bStats, "k")
        ZoneMaps.maintainIndex(spark, dataDir, zStats, Seq("v"))
        checkPoint(); checkRange(); checkBatch()
        assert(Store.read(spark, dataDir).count() == admitted.size,
          s"seed=$seed store row count drifted from the reference")
      }
    } finally sweep(base)
  }

  test("random walk over admit/raw/replay/compact/heal/lookup stays exact (seed 1)") {
    walk(seed = 1L, ops = 40)
  }

  test("random walk over admit/raw/replay/compact/heal/lookup stays exact (seed 20260815)") {
    walk(seed = 20260815L, ops = 40)
  }
}
