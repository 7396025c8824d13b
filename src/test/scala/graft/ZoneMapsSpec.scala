package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Layout, Tables, ZoneMaps}

/** Zone-map contract: pruning is result-invisible on ANY layout, effective
  * on a clustered one, exact (zero files) on an empty range, and
  * conservative on all-null slices.
  */
class ZoneMapsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmp(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_zm_spec_")

  private def sweep(p: java.nio.file.Path): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile): Unit
  }

  private val lo = lit("1997-01-01").cast("timestamp")
  private val hi = lit("1997-07-01").cast("timestamp")

  private def expected(): Map[Long, Long] = Tables.lineitem(spark, sf)
    .filter($"l_shipdate" >= lo && $"l_shipdate" < hi)
    .groupBy($"l_orderkey").count()
    .as[(Long, Long)].collect().toMap

  test("clustered layout: strictly fewer files read, identical rows") {
    val base = tmp()
    try {
      Layout.writeClustered(Tables.lineitem(spark, sf), s"$base/data",
        Seq("l_shipdate"), numFiles = 16)
      ZoneMaps.build(spark, s"$base/data", Seq("l_shipdate"), s"$base/stats")
      val (df, (read, total)) = ZoneMaps.scanPruned(spark, s"$base/data",
        s"$base/stats", "l_shipdate", lo, hi)
      assert(total == 16, s"expected 16 file slices, saw $total")
      assert(read < total,
        s"a half-year range over a 7-year clustered span must prune ($read/$total)")
      assert(read > 0)
      val got = df.groupBy($"l_orderkey").count()
        .as[(Long, Long)].collect().toMap
      assert(got == expected())
      // surviving files still push the residual predicate to row groups
      val plan = df.queryExecution.sparkPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
        s"residual predicate must still reach parquet:\n$plan")
    } finally sweep(base)
  }

  test("adversarial random layout: nothing prunes, result still identical") {
    val base = tmp()
    try {
      // shuffle rows uniformly: every file straddles every date range
      Tables.lineitem(spark, sf).repartition(16)
        .write.parquet(s"$base/data")
      ZoneMaps.build(spark, s"$base/data", Seq("l_shipdate"), s"$base/stats")
      val (df, (read, total)) = ZoneMaps.scanPruned(spark, s"$base/data",
        s"$base/stats", "l_shipdate", lo, hi)
      assert(read == total,
        s"random layout cannot prune a mid-span range ($read/$total)")
      val got = df.groupBy($"l_orderkey").count()
        .as[(Long, Long)].collect().toMap
      assert(got == expected())
    } finally sweep(base)
  }

  test("range beyond the data: zero files read, empty frame, no data scan") {
    val base = tmp()
    try {
      Layout.writeClustered(Tables.lineitem(spark, sf), s"$base/data",
        Seq("l_shipdate"), numFiles = 8)
      ZoneMaps.build(spark, s"$base/data", Seq("l_shipdate"), s"$base/stats")
      val (df, (read, _)) = ZoneMaps.scanPruned(spark, s"$base/data",
        s"$base/stats", "l_shipdate",
        lit("2050-01-01").cast("timestamp"), lit("2051-01-01").cast("timestamp"))
      assert(read == 0)
      assert(df.count() == 0)
      assert(df.schema.fieldNames.contains("l_orderkey"),
        "empty result must keep the data schema")
    } finally sweep(base)
  }

  test("all-null file slices are conservatively kept, not pruned") {
    val base = tmp()
    try {
      // two files: one real dates, one all-null tracked column
      Seq((1L, Some(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))),
        (2L, Some(java.sql.Timestamp.valueOf("1996-06-01 00:00:00"))))
        .toDF("id", "d").coalesce(1).write.parquet(s"$base/data")
      Seq((3L, None: Option[java.sql.Timestamp]), (4L, None))
        .toDF("id", "d").coalesce(1)
        .write.mode("append").parquet(s"$base/data")
      ZoneMaps.build(spark, s"$base/data", Seq("d"), s"$base/stats")
      val (df, (read, total)) = ZoneMaps.scanPruned(spark, s"$base/data",
        s"$base/stats", "d",
        lit("1996-01-01").cast("timestamp"), lit("1997-01-01").cast("timestamp"))
      assert(total == 2 && read == 2,
        s"a NULL-bounds file can never be excluded ($read/$total)")
      // the residual filter still removes the null rows from the result
      assert(df.select($"id").as[Long].collect().toSet == Set(1L, 2L))
    } finally sweep(base)
  }

  test("2-D box over z-order: both conjuncts prune; 1-D clustering can't prune the other dim") {
    val zBase = tmp()
    val cBase = tmp()
    try {
      val li = Tables.lineitem(spark, sf)
      // z-ordered on (partkey, suppkey): every file is a small 2-D box
      Layout.writeZOrdered(li, s"$zBase/data",
        Seq("l_partkey", "l_suppkey"), numFiles = 16)
      ZoneMaps.build(spark, s"$zBase/data",
        Seq("l_partkey", "l_suppkey"), s"$zBase/stats")
      // linearly clustered on partkey only: suppkey spans every file
      Layout.writeClustered(li, s"$cBase/data",
        Seq("l_partkey"), numFiles = 16)
      ZoneMaps.build(spark, s"$cBase/data",
        Seq("l_partkey", "l_suppkey"), s"$cBase/stats")

      val pk = li.agg(max($"l_partkey")).head().getLong(0)
      val sk = li.agg(max($"l_suppkey")).head().getLong(0)
      val box = Seq(
        ("l_partkey", lit(0L), lit(pk / 4 + 1)),
        ("l_suppkey", lit(0L), lit(sk / 4 + 1)))

      val (zdf, (zRead, zTotal)) =
        ZoneMaps.scanPrunedAll(spark, s"$zBase/data", s"$zBase/stats", box)
      val (cdf, (cRead, cTotal)) =
        ZoneMaps.scanPrunedAll(spark, s"$cBase/data", s"$cBase/stats", box)
      assert(zRead < zTotal, s"z-order must prune the 2-D box ($zRead/$zTotal)")
      // on the linear layout only the partkey conjunct prunes; the z-order
      // layout must do at least as well BECAUSE the suppkey conjunct also
      // bites there (a quarter-range box on 16 z-files)
      assert(zRead <= cRead,
        s"2-D layout must not read more than 1-D for a 2-D box ($zRead vs $cRead)")
      // suppkey-only predicate: linear-on-partkey layout reads EVERYTHING
      val (_, (sRead, sTotal)) = ZoneMaps.scanPrunedAll(
        spark, s"$cBase/data", s"$cBase/stats",
        Seq(("l_suppkey", lit(0L), lit(sk / 4 + 1))))
      assert(sRead == sTotal,
        s"the unclustered dimension cannot prune on a linear layout ($sRead/$sTotal)")
      // and both layouts agree with each other on the rows
      val key = (df: org.apache.spark.sql.DataFrame) =>
        df.select($"l_orderkey", $"l_linenumber")
          .as[(Long, Int)].collect().toSet
      assert(key(zdf) == key(cdf) && key(zdf).nonEmpty)
    } finally { sweep(zBase); sweep(cBase) }
  }

  test("stats build is |files|-scale: footer-derived (zero data scans) or one aggregate pass") {
    val base = tmp()
    try {
      Layout.writeClustered(Tables.lineitem(spark, sf), s"$base/data",
        Seq("l_shipdate"), numFiles = 8)
      ZoneMaps.build(spark, s"$base/data", Seq("l_shipdate"), s"$base/stats")
      val stats = spark.read.parquet(s"$base/stats")
      assert(stats.count() == 8)
      // r13: build goes through statsForPaths, which also records the
      // null counts the COUNT/MIN-MAX pushdown faces guard on (footer
      // path and scan path emit the identical shape — ZoneFooterStatsSpec
      // pins value equality between the two)
      assert(stats.columns.toSet ==
        Set("file", "n_rows", "min_l_shipdate", "max_l_shipdate",
          "nnull_l_shipdate"))
      // per-file counts must reconcile with the table: stats lie → prune lies
      val nTotal = stats.agg(sum($"n_rows")).head().getLong(0)
      assert(nTotal == Tables.lineitem(spark, sf).count())
    } finally sweep(base)
  }
}
