package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{BloomIndex, Store}

/** The composite-key bloom index contract (cited by q90's doc in
  * queries/ZoneScan.scala): the per-file bloom holds `xxhash64(c1, c2, …)`
  * over the EXACT key-column tuple recorded in the `.keycols` sidecar.
  * A probe that disagrees with the sidecar — different arity, different
  * order, different names — would hash differently and WRONGLY prune
  * every file, so it must be rejected loudly, never guessed:
  *
  *  - arity/order/name mismatches rejected on lookup (single probe,
  *    batch probe) and on admission into an existing index;
  *  - single-column stores reject composite probes and vice versa; a
  *    pre-sidecar store (sidecar absent) accepts only single-column;
  *  - a heal under the wrong keyCols fails fast instead of rebuilding
  *    stats under the wrong hash;
  *  - the payoff: on a per-batch file layout a composite point probe
  *    reads ≤3/16 files with zero false negatives.
  */
class CompositeKeyBloomSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmp(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_compkey_")
  private def sweep(p: java.nio.file.Path): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(p.toFile): Unit
  }

  private def batch(grp: Int, n: Int) =
    spark.range(0, n.toLong)
      .select(lit(grp.toLong).as("grp"), $"id".as("sub"),
        concat(lit(s"v$grp-"), $"id").as("payload"))
      .coalesce(1)

  test("mismatched arity, order, and names are rejected on probe and admission") {
    val base = tmp()
    try {
      val (dataDir, statsDir) = (s"$base/data", s"$base/stats")
      assert(BloomIndex.admitIndexedMulti(batch(0, 100), dataDir, statsDir,
        Seq("grp", "sub"), "b0"))
      // single-column probe against a composite index
      intercept[IllegalArgumentException] {
        BloomIndex.lookupIndexed(spark, dataDir, statsDir, "grp", lit(0L))
      }
      // wrong ORDER (same columns — hashes differently)
      intercept[IllegalArgumentException] {
        BloomIndex.lookupIndexedMulti(spark, dataDir, statsDir,
          Seq("sub", "grp"), Seq(lit(5L), lit(0L)))
      }
      // wrong names
      intercept[IllegalArgumentException] {
        BloomIndex.lookupIndexedMulti(spark, dataDir, statsDir,
          Seq("grp", "payload"), Seq(lit(0L), lit("x")))
      }
      // batch probe face verifies too
      intercept[IllegalArgumentException] {
        BloomIndex.lookupIndexedBatch(spark, dataDir, statsDir, "grp",
          Seq(lit(0L)))
      }
      // admission into an existing index under different keyCols
      intercept[IllegalArgumentException] {
        BloomIndex.admitIndexedMulti(batch(1, 100), dataDir, statsDir,
          Seq("grp"), "b1")
      }
      // probe arity must match keyCols arity before anything else
      intercept[IllegalArgumentException] {
        BloomIndex.lookupIndexedMulti(spark, dataDir, statsDir,
          Seq("grp", "sub"), Seq(lit(0L)))
      }
    } finally sweep(base)
  }

  test("single-column stores reject composite probes; a pre-sidecar store accepts only single-column") {
    val base = tmp()
    try {
      val (dataDir, statsDir) = (s"$base/data", s"$base/stats")
      assert(BloomIndex.admitIndexed(batch(0, 100), dataDir, statsDir,
        "sub", "b0"))
      intercept[IllegalArgumentException] {
        BloomIndex.lookupIndexedMulti(spark, dataDir, statsDir,
          Seq("grp", "sub"), Seq(lit(0L), lit(5L)))
      }
      // a store that PREDATES the sidecar (single-column by construction):
      // single-column probes accepted, composite rejected
      assert(new File(statsDir + ".keycols").delete())
      val (hit, _) = BloomIndex.lookupIndexed(spark, dataDir, statsDir,
        "sub", lit(5L))
      assert(hit.count() == 1L)
      intercept[IllegalArgumentException] {
        BloomIndex.lookupIndexedMulti(spark, dataDir, statsDir,
          Seq("grp", "sub"), Seq(lit(0L), lit(5L)))
      }
    } finally sweep(base)
  }

  test("heal under the wrong keyCols fails fast, never rebuilds under the wrong hash") {
    val base = tmp()
    try {
      val (dataDir, statsDir) = (s"$base/data", s"$base/stats")
      assert(BloomIndex.admitIndexedMulti(batch(0, 100), dataDir, statsDir,
        Seq("grp", "sub"), "b0"))
      // put the index behind the data (uncovered file), then heal wrong
      assert(Store.appendIdempotent(batch(1, 100), dataDir, "b1"))
      intercept[IllegalArgumentException] {
        BloomIndex.maintainIndexMulti(spark, dataDir, statsDir, Seq("grp"))
      }
      intercept[IllegalArgumentException] {
        BloomIndex.maintainIndexMulti(spark, dataDir, statsDir,
          Seq("sub", "grp"))
      }
      // the RIGHT heal covers the straggler and the probe prunes again
      BloomIndex.maintainIndexMulti(spark, dataDir, statsDir,
        Seq("grp", "sub"))
      val (hit, (read, total)) = BloomIndex.lookupIndexedMulti(spark,
        dataDir, statsDir, Seq("grp", "sub"), Seq(lit(1L), lit(7L)))
      assert(hit.count() == 1L)
      assert(read < total, s"healed index must prune: $read/$total")
    } finally sweep(base)
  }

  test("composite point probe on a per-batch layout reads <=3/16 files, zero false negatives") {
    val base = tmp()
    try {
      val (dataDir, statsDir) = (s"$base/data", s"$base/stats")
      (0 until 16).foreach { g =>
        assert(BloomIndex.admitIndexedMulti(batch(g, 1000), dataDir,
          statsDir, Seq("grp", "sub"), s"b$g"))
      }
      // probes across the keyspace: every one must find its row (a bloom
      // has false POSITIVES only), and each must read a near-minimal
      // candidate set — fpp 0.01 over 15 non-owning files leaves the
      // expected extra reads at ~0.15, so <=3/16 has huge margin
      val probes = Seq((0L, 0L), (5L, 500L), (15L, 999L), (7L, 123L),
        (12L, 1L), (3L, 998L))
      probes.foreach { case (g, s) =>
        val (hit, (read, total)) = BloomIndex.lookupIndexedMulti(spark,
          dataDir, statsDir, Seq("grp", "sub"), Seq(lit(g), lit(s)))
        assert(total == 16, s"expected 16 live files, got $total")
        assert(read >= 1 && read <= 3,
          s"probe ($g,$s) read $read/16 files — pruning lost")
        val rows = hit.collect()
        assert(rows.length == 1 &&
          rows.head.getAs[String]("payload") == s"v$g-$s",
          s"probe ($g,$s): zero false negatives violated: ${rows.toSeq}")
      }
      // a key that exists in NEITHER half of any tuple pairing reads 0
      // files (up to fpp stragglers)
      val (miss, (readM, _)) = BloomIndex.lookupIndexedMulti(spark,
        dataDir, statsDir, Seq("grp", "sub"), Seq(lit(99L), lit(99999L)))
      assert(miss.count() == 0L)
      assert(readM <= 1, s"absent key should prune ~all files, read $readM")
    } finally sweep(base)
  }
}
