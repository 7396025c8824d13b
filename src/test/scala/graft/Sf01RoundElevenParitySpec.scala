package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{BloomIndex, Store, Tables, ZoneMaps}

/** sf0.1 parity for the round-11 store faces, extending the
  * Sf01RoundNineParitySpec pattern: the DuckDB oracle gates at sf0.01;
  * these re-check at sf0.1, where 10x the rows mean 10x the files per
  * admission, real multi-file boundary straddles for the count pushdown,
  * and a dim key set (382 orders) wide enough to exercise the any-match
  * probe across many stats rows. Every check compares the indexed serve
  * against an independent direct computation over the same raw table. */
class Sf01RoundElevenParitySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val sfBig = "/root/testdata/sf0.1"
  private def li = Tables.lineitem(spark, sfBig)

  private def tmpBase(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_r11_sf01_")
  private def sweep(p: java.nio.file.Path): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile): Unit
  }

  test("zone-indexed store at sf0.1: admit → clusterBy compact → heal serves exact, pruned, metadata-counted", SlowTest) {
    val base = tmpBase()
    try {
      val (dataDir, statsDir) = (s"$base/data", s"$base/stats")
      def shaped(half: Int) = li
        .filter(pmod(xxhash64($"l_orderkey"), lit(2)) === half)
        .repartitionByRange(16, $"l_shipdate")
        .sortWithinPartitions($"l_shipdate")
      ZoneMaps.admitIndexed(shaped(0), dataDir, statsDir, Seq("l_shipdate"), "h0"): Unit
      Store.compact(spark, dataDir, numFiles = 16, clusterBy = Seq("l_shipdate"))
      ZoneMaps.admitIndexed(shaped(1), dataDir, statsDir, Seq("l_shipdate"), "h1"): Unit
      ZoneMaps.maintainIndex(spark, dataDir, statsDir, Seq("l_shipdate"))
      val lo = lit("1997-01-01").cast("timestamp")
      val hi = lit("1997-04-01").cast("timestamp")
      val want = li.filter($"l_shipdate" >= lo && $"l_shipdate" < hi).count()
      val (df, (read, total)) = ZoneMaps.lookupRangeIndexed(spark, dataDir,
        statsDir, Seq(("l_shipdate", lo, hi)))
      assert(df.count() == want && want > 0)
      assert(read * 2 < total,
        s"a quarter of 7 years must skip most of a clustered store: $read/$total")
      val (n, (scanned, _)) = ZoneMaps.countRangeIndexed(spark, dataDir,
        statsDir, Seq(("l_shipdate", lo, hi)))
      assert(n == want)
      assert(scanned <= read,
        s"count pushdown must scan at most the lookup's files: $scanned vs $read")
    } finally sweep(base)
  }

  test("join-driven file pruning at sf0.1: 382-key urgent-month dim, pruned join ≡ plain join", SlowTest) {
    val base = tmpBase()
    try {
      val (dataDir, statsDir) = (s"$base/data", s"$base/stats")
      BloomIndex.admitIndexed(
        li.repartitionByRange(64, $"l_orderkey").sortWithinPartitions($"l_orderkey"),
        dataDir, statsDir, "l_orderkey", "all"): Unit
      val dim = Tables.orders(spark, sfBig)
        .filter($"o_orderdate" >= lit("1997-03-01").cast("timestamp") &&
          $"o_orderdate" < lit("1997-04-01").cast("timestamp") &&
          $"o_orderpriority" === "1-URGENT")
      val (fact, (read, total)) = BloomIndex.prunedJoinScan(spark, dataDir,
        statsDir, "l_orderkey", dim.select($"o_orderkey"))
      val got = fact.join(broadcast(dim), $"l_orderkey" === $"o_orderkey")
        .agg(count(lit(1)), sum($"l_quantity").cast("long"))
        .as[(Long, Long)].head()
      val want = li.join(broadcast(dim), $"l_orderkey" === $"o_orderkey")
        .agg(count(lit(1)), sum($"l_quantity").cast("long"))
        .as[(Long, Long)].head()
      assert(got == want && want._1 > 0)
      assert(read <= total, s"pruning stayed conservative: $read/$total")
      // batched lookup over 8 keys that provably have lines (a dim order
      // with NO lineitem rows correctly attributes zero candidate files):
      // one stats pass, exact rows, every key attributed
      val keys = li.join(broadcast(dim), $"l_orderkey" === $"o_orderkey")
        .select($"l_orderkey").distinct().orderBy($"l_orderkey").limit(8)
        .as[Long].collect().toSeq
      val (rows, perKey, _) = BloomIndex.lookupIndexedBatch(spark, dataDir,
        statsDir, "l_orderkey", keys.map(lit(_)))
      assert(rows.count() == li.filter($"l_orderkey".isInCollection(keys)).count())
      assert(perKey.size == keys.size && perKey.forall(_.nonEmpty))
    } finally sweep(base)
  }
}
