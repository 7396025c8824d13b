package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{BloomIndex, Store}

import scala.util.Random

/** The Store delete face — tombstone admission, suppressed reads,
  * physical drop + tombstone retirement at compaction (round-11 verdict
  * missing-item #2). Contracts pinned:
  *
  *  - suppression is immediate at commit (readLive), physical at the
  *    deleting compaction (plain read matches after it);
  *  - the consumed tombstones are RETIRED (the sibling store is bounded
  *    by one cycle's delete traffic), while their admission markers
  *    survive — a replayed delete is a no-op forever;
  *  - takedown semantics: re-admitting a banned key BEFORE the deleting
  *    compaction stays suppressed; after it, the key is visible again;
  *  - index composition: bloom pruning stays conservative and
  *    suppressDeleted keeps lookups exact through the whole lifecycle;
  *  - a randomized admit/delete/compact walk agrees with a driver-side
  *    model at every quiesce point.
  */
class StoreDeleteSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmp(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_delspec_")
  private def sweep(p: java.nio.file.Path): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile): Unit
  }

  private def rows(ids: Seq[Long]) = ids.map(i => (i, s"doc$i")).toDF("id", "v")

  test("delete lifecycle: suppress at commit, drop at compaction, retire tombstones, markers survive") {
    val base = tmp()
    try {
      val dir = s"$base/store"
      assert(Store.appendIdempotent(rows(1L to 10L), dir, "b1"))
      assert(Store.appendIdempotent(rows(11L to 20L), dir, "b2"))
      // the takedown: ban 5 keys across both batches
      val banned = Seq(2L, 5L, 11L, 17L, 20L)
      assert(Store.deleteByKeys(banned.toDF("id"), dir, Some("d1")))
      // suppression is immediate...
      assert(Store.readLive(spark, dir).select($"id").as[Long].collect().toSet ==
        ((1L to 20L).toSet -- banned))
      // ...but physical rows are still there until the deleting compaction
      assert(Store.read(spark, dir).count() == 20)
      // replay of the delete id: no-op
      assert(!Store.deleteByKeys(banned.toDF("id"), dir, Some("d1")))
      Store.compactWithDeletes(spark, dir, numFiles = 2)
      // physical drop: the PLAIN read no longer holds the banned rows
      assert(Store.read(spark, dir).select($"id").as[Long].collect().toSet ==
        ((1L to 20L).toSet -- banned))
      // tombstones consumed: sibling store holds no live deltas
      assert(Store.deltaCount(Store.tombstoneDir(dir)) == 0)
      assert(!Store.hasData(Store.tombstoneDir(dir)))
      // the delete's admission marker survived retirement: replay no-ops
      assert(!Store.deleteByKeys(banned.toDF("id"), dir, Some("d1")))
      assert(Store.read(spark, dir).count() == 15)
    } finally sweep(base)
  }

  test("takedown semantics: re-admission before the deleting compaction stays suppressed; after it, visible") {
    val base = tmp()
    try {
      val dir = s"$base/store"
      assert(Store.appendIdempotent(rows(Seq(1L, 2L, 3L)), dir, "b1"))
      assert(Store.deleteByKeys(Seq(2L).toDF("id"), dir, Some("d1")))
      // key 2 re-admitted while its tombstone is live: the ban is by key
      assert(Store.appendIdempotent(rows(Seq(2L)), dir, "b2"))
      assert(Store.readLive(spark, dir).select($"id").as[Long].collect().toSet ==
        Set(1L, 3L))
      Store.compactWithDeletes(spark, dir, numFiles = 1)
      // tombstone consumed (BOTH copies of key 2 dropped with it)
      assert(Store.read(spark, dir).select($"id").as[Long].collect().toSet ==
        Set(1L, 3L))
      // a LATER re-admission is visible: the ban ended with the tombstone
      assert(Store.appendIdempotent(rows(Seq(2L)), dir, "b3"))
      assert(Store.readLive(spark, dir).select($"id").as[Long].collect().toSet ==
        Set(1L, 2L, 3L))
    } finally sweep(base)
  }

  test("deletes compose with the bloom index: pruning conservative, suppressDeleted exact") {
    val base = tmp()
    try {
      val (dataDir, statsDir) = (s"$base/data", s"$base/stats")
      val li = graft.sources.Tables.lineitem(spark, sf)
      BloomIndex.admitIndexed(li, dataDir, statsDir, "l_orderkey", "all"): Unit
      val key = li.agg(max($"l_orderkey")).as[Long].head()
      // ban the very key we look up
      assert(Store.deleteByKeys(Seq(key).toDF("l_orderkey"), dataDir, Some("d1")))
      val (hit, _) = BloomIndex.lookupIndexed(spark, dataDir, statsDir,
        "l_orderkey", lit(key))
      // the raw lookup still sees the physical rows (documented); the
      // composed serve path suppresses them
      assert(hit.count() > 0)
      assert(Store.suppressDeleted(spark, dataDir, hit).count() == 0)
      // a non-banned key is untouched by the live tombstone
      val other = li.agg(min($"l_orderkey")).as[Long].head()
      val (hit2, _) = BloomIndex.lookupIndexed(spark, dataDir, statsDir,
        "l_orderkey", lit(other))
      assert(Store.suppressDeleted(spark, dataDir, hit2).count() ==
        li.filter($"l_orderkey" === other).count())
      // deleting compaction + heal: lookup of the banned key is now empty
      // even unsuppressed, and pruning works again
      Store.compactWithDeletes(spark, dataDir, numFiles = 2)
      BloomIndex.maintainIndex(spark, dataDir, statsDir, "l_orderkey")
      val (hit3, (read3, total3)) = BloomIndex.lookupIndexed(spark, dataDir,
        statsDir, "l_orderkey", lit(key))
      assert(hit3.count() == 0)
      assert(read3 <= total3)
    } finally sweep(base)
  }

  test("key-column mismatch and multi-column tombstones are rejected") {
    val base = tmp()
    try {
      val dir = s"$base/store"
      Store.append(rows(Seq(1L)), dir)
      intercept[IllegalArgumentException] {
        Store.deleteByKeys(Seq((1L, 2L)).toDF("a", "b"), dir)
      }
      assert(Store.deleteByKeys(Seq(1L).toDF("id"), dir, Some("d1")))
      intercept[IllegalArgumentException] {
        Store.deleteByKeys(Seq("x").toDF("name"), dir, Some("d2"))
      }
    } finally sweep(base)
  }

  test("randomized admit/delete/compact walk agrees with the model at every quiesce") {
    val base = tmp()
    try {
      val dir = s"$base/store"
      val rnd = new Random(20260815L)
      var model = Map.empty[Long, Int] // id -> copies LIVE-visible
      // keys whose tombstone is still live: re-admissions are suppressed
      // (and physically dropped at the next deleting compaction)
      var bannedLive = Set.empty[Long]
      var nextId = 0L
      var batch = 0
      Store.append(rows(Seq(-1L)), dir) // bootstrap schema
      model += (-1L -> 1)
      (1 to 24).foreach { step =>
        rnd.nextInt(4) match {
          case 0 | 1 => // admit a fresh batch (some ids may repeat old ones)
            val ids = (0 until 3).map(_ =>
              if (rnd.nextBoolean() && nextId > 0) rnd.nextLong(nextId)
              else { nextId += 1; nextId - 1 })
            batch += 1
            assert(Store.appendIdempotent(rows(ids), dir, s"b$batch"))
            // a copy of a still-banned key is admitted but suppressed
            ids.filterNot(bannedLive).foreach(i =>
              model += (i -> (model.getOrElse(i, 0) + 1)))
          case 2 if model.nonEmpty => // takedown a random live key subset
            val ks = model.keys.toSeq.sorted
            val banned = ks.filter(_ => rnd.nextInt(3) == 0)
            if (banned.nonEmpty) {
              batch += 1
              assert(Store.deleteByKeys(banned.toDF("id"), dir, Some(s"b$batch")))
              model = model -- banned
              bannedLive ++= banned
            }
          case _ => // deleting compaction (also consumes the tombstones)
            Store.compactWithDeletes(spark, dir,
              numFiles = 1 + rnd.nextInt(2))
            bannedLive = Set.empty
        }
        // quiesce check: live read == model (with multiplicity)
        val got = Store.readLive(spark, dir).groupBy($"id").count()
          .as[(Long, Long)].collect().toMap
        assert(got == model.map { case (k, v) => k -> v.toLong },
          s"step $step: live read diverged from the model")
      }
      // final deleting compaction: physical state == model too
      Store.compactWithDeletes(spark, dir, numFiles = 1)
      val phys = Store.read(spark, dir).groupBy($"id").count()
        .as[(Long, Long)].collect().toMap
      assert(phys == model.map { case (k, v) => k -> v.toLong })
      assert(!Store.hasData(Store.tombstoneDir(dir)))
    } finally sweep(base)
  }
}
