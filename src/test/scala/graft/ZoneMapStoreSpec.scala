package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{BloomIndex, Store, Tables, ZoneMaps}

/** The zone-mapped Store contract — the RANGE-scan sibling of the
  * bloom-indexed Store, plus the property the r10 verdict named as gap #1:
  * range pruning must SURVIVE a maintenance cycle. The static composition
  * (IndexLayoutCompositionSpec) proves pruning on a one-shot clustered
  * layout; this spec proves it across the full incremental protocol —
  * admit, ORDER-PRESERVING compact (`Store.compact(clusterBy = ...)`),
  * heal, serve — and pins the negative too: a round-robin compact hands
  * every file the full key range and the healed index prunes nothing
  * (correct, unpruned — which is exactly why clusterBy exists). */
class ZoneMapStoreSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmp(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_zmstore_")
  private def sweep(p: java.nio.file.Path): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile): Unit
  }

  private def li = Tables.lineitem(spark, sf)
  private val lo = lit("1997-01-01").cast("timestamp")
  private val hi = lit("1997-04-01").cast("timestamp")
  private def preds = Seq(("l_shipdate", lo, hi))

  private def shaped(half: Int) = li
    .filter(pmod(xxhash64($"l_orderkey"), lit(2)) === half)
    .repartitionByRange(8, $"l_shipdate")
    .sortWithinPartitions($"l_shipdate")

  private lazy val expectedCount = li
    .filter($"l_shipdate" >= lo && $"l_shipdate" < hi).count()

  private def served(dataDir: String, statsDir: String): (Long, (Int, Int)) = {
    val (df, counts) = ZoneMaps.lookupRangeIndexed(spark, dataDir, statsDir, preds)
    (df.count(), counts)
  }

  test("pruning SURVIVES maintenance: admit → clusterBy compact → heal → pruned exact serve") {
    val base = tmp()
    try {
      val (dataDir, statsDir) = (s"$base/data", s"$base/stats")
      assert(ZoneMaps.admitIndexed(shaped(0), dataDir, statsDir,
        Seq("l_shipdate"), "h0"))
      // the maintenance cycle that used to destroy locality forever
      Store.compact(spark, dataDir, numFiles = 8, clusterBy = Seq("l_shipdate"))
      assert(ZoneMaps.admitIndexed(shaped(1), dataDir, statsDir,
        Seq("l_shipdate"), "h1"))
      ZoneMaps.maintainIndex(spark, dataDir, statsDir, Seq("l_shipdate"))
      val (n, (read, total)) = served(dataDir, statsDir)
      assert(n == expectedCount && n > 0)
      assert(read < total,
        s"a quarter slice must skip files on a clustered store: $read/$total")
      // heal covered exactly the live files (no stale, no gaps)
      val live = Store.read(spark, dataDir).inputFiles
        .map(BloomIndex.canonPath).toSet
      val covered = Store.read(spark, statsDir)
        .select($"file").as[String].collect().toSet
      assert(covered == live)
    } finally sweep(base)
  }

  test("negative: without clusterBy an unshaped store stays unprunable after compact+heal (still exact)") {
    // the hazard clusterBy exists for: data whose files straddle the key
    // range prunes nothing, and a plain compact (now a locality-AGNOSTIC
    // coalesce bin-pack) makes no promise of fixing that — only the
    // order-preserving rewrite does
    val base = tmp()
    try {
      val (dataDir, statsDir) = (s"$base/data", s"$base/stats")
      val unshaped = li
        .filter(pmod(xxhash64($"l_orderkey"), lit(2)) === 0)
        .repartition(8) // round-robin: every file spans the full date range
      ZoneMaps.admitIndexed(unshaped, dataDir, statsDir,
        Seq("l_shipdate"), "h0"): Unit
      Store.compact(spark, dataDir, numFiles = 8) // clusterBy = Nil
      ZoneMaps.maintainIndex(spark, dataDir, statsDir, Seq("l_shipdate"))
      val (n, (read, total)) = served(dataDir, statsDir)
      assert(n == li.filter($"l_shipdate" >= lo && $"l_shipdate" < hi)
        .filter(pmod(xxhash64($"l_orderkey"), lit(2)) === 0).count())
      assert(read >= total - 1,
        s"unshaped files straddle the whole range — expected ~no pruning, got $read/$total")
    } finally sweep(base)
  }

  test("uncovered live files are read unconditionally; replay heals missing stats") {
    val base = tmp()
    try {
      val (dataDir, statsDir) = (s"$base/data", s"$base/stats")
      ZoneMaps.admitIndexed(shaped(0), dataDir, statsDir,
        Seq("l_shipdate"), "h0"): Unit
      // the crash window: h1's data committed, stats never written
      Store.appendIdempotent(shaped(1), dataDir, "h1"): Unit
      val (n1, (read1, total1)) = served(dataDir, statsDir)
      assert(n1 == expectedCount,
        "uncovered files must be scanned — pruning degrades, results do not")
      assert(read1 > 0 && read1 <= total1)
      // an at-least-once REPLAY of h1's admission heals the stats side
      assert(!ZoneMaps.admitIndexed(shaped(1), dataDir, statsDir,
        Seq("l_shipdate"), "h1"), "replay must not re-admit data")
      val covered = Store.read(spark, statsDir)
        .select($"file").as[String].collect().toSet
      val live = Store.read(spark, dataDir).inputFiles
        .map(BloomIndex.canonPath).toSet
      assert(covered == live, "replay must heal the crash-window stats")
      val (n2, (read2, _)) = served(dataDir, statsDir)
      assert(n2 == expectedCount && read2 <= read1)
    } finally sweep(base)
  }

  test("compaction stales every stat: serve falls back to full scan, heal restores pruning") {
    val base = tmp()
    try {
      val (dataDir, statsDir) = (s"$base/data", s"$base/stats")
      ZoneMaps.admitIndexed(
        li.repartitionByRange(8, $"l_shipdate").sortWithinPartitions($"l_shipdate"),
        dataDir, statsDir, Seq("l_shipdate"), "all"): Unit
      Store.compact(spark, dataDir, numFiles = 8, clusterBy = Seq("l_shipdate"))
      // every file renamed: stats cover nothing, lookup must full-scan
      val (n1, (read1, total1)) = served(dataDir, statsDir)
      assert(read1 == total1, "stale index must fall back to reading all")
      assert(n1 == expectedCount)
      ZoneMaps.maintainIndex(spark, dataDir, statsDir, Seq("l_shipdate"))
      val (n2, (read2, total2)) = served(dataDir, statsDir)
      assert(n2 == expectedCount)
      assert(read2 < total2, s"healed index must prune again: $read2/$total2")
      // empty-intersection probe: no file read at all, empty exact result
      val (dfE, (readE, _)) = ZoneMaps.lookupRangeIndexed(spark, dataDir,
        statsDir, Seq(("l_shipdate", lit("2222-01-01").cast("timestamp"),
          lit("2222-04-01").cast("timestamp"))))
      assert(readE == 0 && dfE.count() == 0)
    } finally sweep(base)
  }

  test("one store, two indexes: bloom point lookups AND zone range scans share the admissions") {
    // the shared-protocol payoff: both faces key off the same data-store
    // idempotency id, so the SECOND indexer's data append no-ops while its
    // stats still ride the (still-live) delta — one admitted batch feeds a
    // point-lookup index and a range index with no extra data writes
    val base = tmp()
    try {
      val (dataDir, bStats, zStats) = (s"$base/data", s"$base/bstats", s"$base/zstats")
      def admitBoth(df: org.apache.spark.sql.DataFrame, id: String): Unit = {
        BloomIndex.admitIndexed(df, dataDir, bStats, "l_orderkey", id): Unit
        ZoneMaps.admitIndexed(df, dataDir, zStats, Seq("l_shipdate"), id): Unit
      }
      admitBoth(shaped(0), "h0")
      admitBoth(shaped(1), "h1")
      // data admitted exactly once per id (the second indexer re-used it)
      assert(Store.read(spark, dataDir).count() == li.count())
      // maintenance: order-preserving for the range face; heal both
      Store.compact(spark, dataDir, numFiles = 8, clusterBy = Seq("l_shipdate"))
      BloomIndex.maintainIndex(spark, dataDir, bStats, "l_orderkey")
      ZoneMaps.maintainIndex(spark, dataDir, zStats, Seq("l_shipdate"))
      // range face prunes and is exact
      val (n, (readZ, totalZ)) = served(dataDir, zStats)
      assert(n == expectedCount && readZ < totalZ)
      // bloom face correct on the SAME store (l_shipdate clustering gives
      // the point key no locality — pruning is not asserted, exactness is)
      val key = li.agg(max($"l_orderkey")).as[Long].head()
      val (dfB, (readB, totalB)) = BloomIndex.lookupIndexed(spark, dataDir,
        bStats, "l_orderkey", lit(key))
      assert(readB <= totalB)
      assert(dfB.count() == li.filter($"l_orderkey" === key).count())
    } finally sweep(base)
  }

  test("z-order maintenance: BOTH dimensions prune after compact+heal; linear sort serves only its leading column") {
    // Delta's OPTIMIZE ZORDER as a store maintenance rewrite: after a
    // zOrder compact on (l_partkey, l_suppkey), a range probe on EITHER
    // column alone must skip files — the property a lexicographic sort
    // gives only its leading column (pinned as the negative)
    val zBase = tmp(); val linBase = tmp()
    try {
      val pk = li.agg(max($"l_partkey")).as[Long].head()
      val sk = li.agg(max($"l_suppkey")).as[Long].head()
      val skPreds = Seq(("l_suppkey", lit(0L).cast("long"), lit(sk / 8).cast("long")))
      val pkPreds = Seq(("l_partkey", lit(0L).cast("long"), lit(pk / 8).cast("long")))
      def build(base: java.nio.file.Path, zOrder: Boolean): (String, String) = {
        val (dataDir, statsDir) = (s"$base/data", s"$base/stats")
        ZoneMaps.admitIndexed(li.repartition(8), dataDir, statsDir,
          Seq("l_partkey", "l_suppkey"), "h0"): Unit
        Store.compact(spark, dataDir, numFiles = 16,
          clusterBy = Seq("l_partkey", "l_suppkey"), zOrder = zOrder)
        ZoneMaps.maintainIndex(spark, dataDir, statsDir,
          Seq("l_partkey", "l_suppkey"))
        (dataDir, statsDir)
      }
      val (zData, zStats) = build(zBase, zOrder = true)
      val (linData, linStats) = build(linBase, zOrder = false)
      def probe(data: String, stats: String,
          preds: Seq[(String, org.apache.spark.sql.Column, org.apache.spark.sql.Column)]) = {
        val (df, (read, total)) = ZoneMaps.lookupRangeIndexed(spark, data, stats, preds)
        (df.count(), read, total)
      }
      // exactness everywhere first
      val wantSk = li.filter($"l_suppkey" >= 0 && $"l_suppkey" < sk / 8).count()
      val wantPk = li.filter($"l_partkey" >= 0 && $"l_partkey" < pk / 8).count()
      val (nZs, readZs, totalZs) = probe(zData, zStats, skPreds)
      val (nZp, readZp, totalZp) = probe(zData, zStats, pkPreds)
      val (nLs, readLs, totalLs) = probe(linData, linStats, skPreds)
      val (nLp, readLp, _) = probe(linData, linStats, pkPreds)
      assert(nZs == wantSk && nLs == wantSk && nZp == wantPk && nLp == wantPk)
      // z-order: BOTH single-dim probes prune
      assert(readZp < totalZp, s"z leading dim must prune: $readZp/$totalZp")
      assert(readZs < totalZs, s"z TRAILING dim must prune: $readZs/$totalZs")
      // linear: leading prunes, trailing reads (almost) everything
      assert(readLp < totalLs)
      assert(readLs >= totalLs - 1,
        s"lexicographic sort cannot prune its trailing column: $readLs/$totalLs")
      // and the 2-D box on the z store composes multiplicatively-ish
      val (nBox, readBox, totalBox) = probe(zData, zStats, pkPreds ++ skPreds)
      assert(nBox == li.filter($"l_partkey" >= 0 && $"l_partkey" < pk / 8 &&
        $"l_suppkey" >= 0 && $"l_suppkey" < sk / 8).count())
      assert(readBox <= math.min(readZp, readZs) && readBox < totalBox)
    } finally { sweep(zBase); sweep(linBase) }
  }

  test("count pushdown: interior files counted from metadata, only boundary files scanned, nulls exact") {
    val base = tmp()
    try {
      val (dataDir, statsDir) = (s"$base/data", s"$base/stats")
      // synthetic rows with NULLs in the tracked column: v in [0,1000) on
      // 10% of rows replaced by null — n_rows alone would overcount any
      // fully-contained file
      val rows = spark.range(0, 20000).select($"id",
        when(pmod($"id", lit(10)) === 0, lit(null).cast("long"))
          .otherwise(pmod($"id" * 2654435761L, lit(1000))).as("v"))
      ZoneMaps.admitIndexed(
        rows.repartitionByRange(10, $"v").sortWithinPartitions($"v"),
        dataDir, statsDir, Seq("v"), "h0"): Unit
      val want = rows.filter($"v" >= 100 && $"v" < 900).count()
      val (n, (scanned, total)) = ZoneMaps.countRangeIndexed(spark, dataDir,
        statsDir, Seq(("v", lit(100L), lit(900L))))
      assert(n == want, s"metadata+scan count must be exact: $n vs $want")
      assert(scanned <= 3 && total >= 10,
        s"interior must come from metadata, only boundaries scanned: $scanned/$total")
      // whole-domain probe: everything fully contained, ZERO files read,
      // and the null rows must not be counted
      val (nAll, (scanAll, _)) = ZoneMaps.countRangeIndexed(spark, dataDir,
        statsDir, Seq(("v", lit(-1L), lit(100000L))))
      assert(nAll == rows.filter($"v".isNotNull).count() && scanAll == 0,
        s"full containment needs no scan and excludes nulls: $nAll, $scanAll files")
      // uncovered crash-window delta: counted by scanning, still exact
      val raw = rows.filter($"id" < 500)
      Store.appendIdempotent(raw, dataDir, "raw"): Unit
      val (n2, (scanned2, _)) = ZoneMaps.countRangeIndexed(spark, dataDir,
        statsDir, Seq(("v", lit(100L), lit(900L))))
      assert(n2 == want + raw.filter($"v" >= 100 && $"v" < 900).count())
      assert(scanned2 > scanned, "uncovered files must be scanned")
      // multi-conjunct: null-bearing files fall back to scanning (per-col
      // null counts cannot bound rows-with-any-null), result still exact
      val wantBox = rows.filter($"v" >= 100 && $"v" < 900 &&
        $"id" >= 0 && $"id" < 20000).count()
      ZoneMaps.maintainIndex(spark, dataDir, statsDir, Seq("v", "id"))
      val (nBox, _) = ZoneMaps.countRangeIndexed(spark, dataDir, statsDir,
        Seq(("v", lit(100L), lit(900L)), ("id", lit(0L), lit(20000L))))
      assert(nBox == wantBox + raw.filter($"v" >= 100 && $"v" < 900).count())
    } finally sweep(base)
  }

  test("min/max pushdown: interior from metadata, boundaries scanned, predicate-column nulls force scans") {
    val base = tmp()
    try {
      val (dataDir, statsDir) = (s"$base/data", s"$base/stats")
      // v in [0,1000) with 10% nulls; range-shaping clusters the nulls
      // into the lowest slice, so most files are null-free and eligible
      // for the metadata fast path — but never the null-bearing one
      val rows = spark.range(0, 20000).select($"id",
        when(pmod($"id", lit(10)) === 0, lit(null).cast("long"))
          .otherwise(pmod($"id" * 2654435761L, lit(1000))).as("v"))
      ZoneMaps.admitIndexed(
        rows.repartitionByRange(10, $"v").sortWithinPartitions($"v"),
        dataDir, statsDir, Seq("v", "id"), "h0"): Unit
      val in = rows.filter($"v" >= 100 && $"v" < 900)
      val (wantMin, wantMax) = (in.agg(min($"id")).as[Long].head(),
        in.agg(max($"id")).as[Long].head())
      val (mm, (scanned, total)) = ZoneMaps.minMaxRangeIndexed(spark,
        dataDir, statsDir, Seq(("v", lit(100L), lit(900L))), "id")
      val r = mm.head()
      assert(r.getLong(0) == wantMin && r.getLong(1) == wantMax,
        s"metadata+scan min/max must be exact: (${r.get(0)},${r.get(1)})")
      assert(scanned <= 3 && total >= 10,
        s"interior must come from metadata: $scanned/$total")
      // whole-domain probe: only the null-bearing slice scans (a file
      // with predicate-column nulls can contribute target values from
      // non-matching rows, so its stats are never trusted)
      val (mmAll, (scanAll, _)) = ZoneMaps.minMaxRangeIndexed(spark,
        dataDir, statsDir, Seq(("v", lit(-1L), lit(100000L))), "id")
      val rAll = mmAll.head()
      val inAll = rows.filter($"v".isNotNull)
      assert(rAll.getLong(0) == inAll.agg(min($"id")).as[Long].head() &&
        rAll.getLong(1) == inAll.agg(max($"id")).as[Long].head())
      assert(scanAll < total / 2,
        s"whole-domain: only null-bearing slices scan: $scanAll/$total")
      // empty range: NULL/NULL, zero files read
      val (mmNone, (scanNone, _)) = ZoneMaps.minMaxRangeIndexed(spark,
        dataDir, statsDir, Seq(("v", lit(5000L), lit(6000L))), "id")
      val rNone = mmNone.head()
      assert(rNone.isNullAt(0) && rNone.isNullAt(1) && scanNone == 0)
      // untracked target surfaces instead of guessing
      intercept[IllegalArgumentException] {
        ZoneMaps.minMaxRangeIndexed(spark, dataDir, statsDir,
          Seq(("v", lit(0L), lit(10L))), "nope")
      }
    } finally sweep(base)
  }

  test("sum pushdown: interior sums from metadata, boundaries/pre-sum/untracked scan, null targets excluded from cnt") {
    val base = tmp()
    try {
      val (dataDir, statsDir) = (s"$base/data", s"$base/stats")
      // v: predicate col, 10% nulls clustered into the lowest slice;
      // w: target col with its OWN nulls (id%7) — cnt must exclude them
      val rows = spark.range(0, 20000).select(
        $"id",
        when(pmod($"id", lit(10)) === 0, lit(null).cast("long"))
          .otherwise(pmod($"id" * 2654435761L, lit(1000))).as("v"),
        when(pmod($"id", lit(7)) === 0, lit(null).cast("long"))
          .otherwise($"id" * 3L).as("w"))
      ZoneMaps.admitIndexed(
        rows.repartitionByRange(10, $"v").sortWithinPartitions($"v"),
        dataDir, statsDir, Seq("v", "w"), "h0"): Unit
      val in = rows.filter($"v" >= 100 && $"v" < 900)
      val (wantSum, wantCnt) = (in.agg(sum($"w")).as[Long].head(),
        in.agg(count($"w")).as[Long].head())
      val (agg1, (scanned, total)) = ZoneMaps.sumRangeIndexed(spark,
        dataDir, statsDir, Seq(("v", lit(100L), lit(900L))), "w")
      val r = agg1.head()
      assert(r.getLong(0) == wantSum && r.getLong(1) == wantCnt,
        s"metadata+scan sum/cnt must be exact: (${r.get(0)},${r.get(1)}) " +
          s"want ($wantSum,$wantCnt)")
      assert(scanned <= 3 && total >= 10,
        s"interior must come from metadata: $scanned/$total")
      // empty range: SQL semantics — sum NULL, cnt 0, zero files read
      val (aggN, (scanN, _)) = ZoneMaps.sumRangeIndexed(spark, dataDir,
        statsDir, Seq(("v", lit(5000L), lit(6000L))), "w")
      val rN = aggN.head()
      assert(rN.isNullAt(0) && rN.getLong(1) == 0L && scanN == 0)
      // UNTRACKED target (id is in the data, not in the stats): nothing
      // served from metadata, every intersecting file scanned — exact
      val (aggU, (scanU, totalU)) = ZoneMaps.sumRangeIndexed(spark,
        dataDir, statsDir, Seq(("v", lit(100L), lit(900L))), "id")
      assert(aggU.head().getLong(0) == in.agg(sum($"id")).as[Long].head())
      assert(scanU > scanned && scanU < totalU,
        s"untracked target scans all intersecting files: $scanU/$totalU")
      // PRE-SUM stats row (tracked bounds + nnull, NULL sum through
      // mergeSchema): the file must be scanned, never dropped or guessed
      val extra = spark.range(20000, 21000).select($"id",
        pmod($"id", lit(1000)).as("v"), ($"id" * 3L).as("w"))
      assert(Store.appendIdempotent(extra.coalesce(1), dataDir, "pre"))
      val f = BloomIndex.canonPath(
        new java.io.File(dataDir, "delta-pre").listFiles()
          .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath)
      Store.append(Seq((f, 1000L, 0L, 999L, 0L, 60000L, 62997L, 0L))
        .toDF("file", "n_rows", "min_v", "max_v", "nnull_v",
          "min_w", "max_w", "nnull_w").coalesce(1), statsDir)
      val all = rows.unionByName(extra).filter($"v" >= -1 && $"v" < 100000)
      val (aggA, (scanA, totalA)) = ZoneMaps.sumRangeIndexed(spark,
        dataDir, statsDir, Seq(("v", lit(-1L), lit(100000L))), "w")
      val rA = aggA.head()
      assert(rA.getLong(0) == all.agg(sum($"w")).as[Long].head() &&
        rA.getLong(1) == all.agg(count($"w")).as[Long].head(),
        s"pre-sum row must scan, not drop: (${rA.get(0)},${rA.get(1)})")
      assert(scanA < totalA,
        s"null-free tracked interior still serves from metadata: $scanA/$totalA")
    } finally sweep(base)
  }

  test("maintainIndexed: admit-count trigger compacts order-preserving BY DEFAULT and heals in the same call") {
    val base = tmp()
    try {
      val (dataDir, statsDir) = (s"$base/data", s"$base/stats")
      val slices = li.randomSplit(Array.fill(4)(1.0), seed = 7)
      slices.zipWithIndex.foreach { case (s, i) =>
        ZoneMaps.admitIndexed(
          s.repartitionByRange(2, $"l_shipdate").sortWithinPartitions($"l_shipdate"),
          dataDir, statsDir, Seq("l_shipdate"), s"b$i"): Unit
        ZoneMaps.maintainIndexed(spark, dataDir, statsDir, Seq("l_shipdate"),
          every = 4, numFiles = 8)
      }
      // the 4th admit crossed the threshold: deltas folded, index healed
      assert(Store.deltaCount(dataDir) == 0, "trigger must have compacted")
      val covered = Store.read(spark, statsDir)
        .select($"file").as[String].collect().toSet
      assert(covered == Store.read(spark, dataDir).inputFiles
        .map(BloomIndex.canonPath).toSet, "heal must ride the same call")
      // and because the default clusterBy = tracked cols, pruning SURVIVED
      val (n, (read, total)) = served(dataDir, statsDir)
      assert(n == expectedCount && read < total,
        s"default order-preserving maintenance must keep pruning: $read/$total")
      // bloom sibling: same trigger, same heal
      val (bData, bStats) = (s"$base/bdata", s"$base/bstats")
      (0 until 2).foreach { i =>
        BloomIndex.admitIndexed(slices(i), bData, bStats, "l_orderkey", s"b$i"): Unit
        BloomIndex.maintainIndexed(spark, bData, bStats, "l_orderkey",
          every = 2, numFiles = 4)
      }
      assert(Store.deltaCount(bData) == 0)
      assert(Store.read(spark, bStats).select($"file").as[String].collect().toSet ==
        Store.read(spark, bData).inputFiles.map(BloomIndex.canonPath).toSet)
    } finally sweep(base)
  }

  test("zone stats serve cache: racing data admit stays exact under a stale cache; heal restores metadata serving") {
    val base = tmp()
    try {
      val (dataDir, statsDir) = (s"$base/data", s"$base/stats")
      val rows = spark.range(0, 10000)
        .select($"id", pmod($"id", lit(1000)).as("v"))
      ZoneMaps.admitIndexed(
        rows.repartitionByRange(8, $"v").sortWithinPartitions($"v"),
        dataDir, statsDir, Seq("v"), "h0"): Unit
      val myPreds = Seq(("v", lit(100L), lit(900L)))
      val expect = rows.filter($"v" >= 100 && $"v" < 900).count()
      val (n0, _) = ZoneMaps.countRangeIndexed(spark, dataDir, statsDir,
        myPreds) // warms the driver-side stats cache
      assert(n0 == expect)
      // racing DATA admit with NO stats: the cached stats are still
      // version-valid, the new file is uncovered -> scanned
      // unconditionally — exact, never lost
      val extra = spark.range(10000, 10500)
        .select($"id", pmod($"id", lit(1000)).as("v"))
      assert(Store.appendIdempotent(extra.coalesce(1), dataDir, "race"))
      val expect2 = expect +
        extra.filter($"v" >= 100 && $"v" < 900).count()
      val (n1, (scan1, _)) = ZoneMaps.countRangeIndexed(spark, dataDir,
        statsDir, myPreds)
      assert(n1 == expect2,
        s"stale stats cache must degrade to scanning, got $n1 want $expect2")
      assert(scan1 >= 1, "the uncovered file must be in the scan set")
      // outside stats writer (mtime bump = content-version drift): the
      // next query must refresh, not serve the stale snapshot forever
      val entry = new java.io.File(statsDir).listFiles()
        .filter(!_.getName.startsWith(".")).head
      assert(entry.setLastModified(entry.lastModified() + 54321L))
      val (n1b, _) = ZoneMaps.countRangeIndexed(spark, dataDir, statsDir,
        myPreds)
      assert(n1b == expect2)
      // heal covers the straggler; metadata serving resumes (fewer scans)
      ZoneMaps.maintainIndex(spark, dataDir, statsDir, Seq("v"))
      val (n2, (scan2, _)) = ZoneMaps.countRangeIndexed(spark, dataDir,
        statsDir, myPreds)
      assert(n2 == expect2 && scan2 <= scan1)
    } finally sweep(base)
  }

  test("wrong tracked column surfaces instead of silently disabling pruning") {
    val base = tmp()
    try {
      val (dataDir, statsDir) = (s"$base/data", s"$base/stats")
      assertThrows[org.apache.spark.sql.AnalysisException](
        ZoneMaps.admitIndexed(shaped(0), dataDir, statsDir,
          Seq("no_such_column"), "h0"))
    } finally sweep(base)
  }
}
