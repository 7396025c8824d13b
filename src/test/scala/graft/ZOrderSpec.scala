package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Layout, Tables}

/** Z-order layout: interleave correctness and the data-skipping property —
  * per-file bounding boxes must shrink in BOTH dimensions, where a linear
  * sort only narrows its leading column. */
class ZOrderSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("zValue interleaves bucket bits (identity ranges)") {
    // ranges 0..65535 make bucket == value, so z is the pure Morton code
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L)).toDF("a", "b")
    val z = df.select(Layout.zValue(Seq(
      (col("a"), 0.0, 65535.0), (col("b"), 0.0, 65535.0))).as("z"))
      .as[Long].collect().toSeq
    // interleave(3,5): spread(3)=0b101, spread(5)=0b10001 -> 5 | (17<<1) = 39
    assert(z == Seq(0L, 1L, 2L, 39L))
  }

  test("z-ordered files have small bounding boxes in both dimensions") {
    val li = Tables.lineitem(spark, sf).select($"l_partkey", $"l_suppkey")
    val zDir = java.nio.file.Files.createTempDirectory("graft_z_").toString + "/t"
    val linDir = java.nio.file.Files.createTempDirectory("graft_lin_").toString + "/t"
    Layout.writeZOrdered(li, zDir, Seq("l_partkey", "l_suppkey"), 16)
    Layout.writeClustered(li, linDir, Seq("l_partkey"), 16)

    def fileBoxes(path: String): Seq[(Double, Double)] = {
      val (pLo, pHi, sLo, sHi) = li.select(
        min($"l_partkey").cast("double"), max($"l_partkey").cast("double"),
        min($"l_suppkey").cast("double"), max($"l_suppkey").cast("double"))
        .as[(Double, Double, Double, Double)].head()
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(((max($"l_partkey") - min($"l_partkey")) / (pHi - pLo)).as("pr"),
          ((max($"l_suppkey") - min($"l_suppkey")) / (sHi - sLo)).as("sr"))
        .select($"pr", $"sr").as[(Double, Double)].collect().toSeq
    }
    val zBoxes = fileBoxes(zDir)
    val linBoxes = fileBoxes(linDir)
    assert(zBoxes.size >= 16 && linBoxes.size >= 16)
    def avg(xs: Seq[Double]) = xs.sum / xs.size
    // Total bounding-box AREA scales ~1/numFiles for both layouts; z-order's
    // property is BALANCE — every dimension stays prunable. Linear sort makes
    // the leading column narrow and leaves the second spanning ~everything
    // (a suppkey-only predicate scans every file); z-order bounds both.
    val zS = avg(zBoxes.map(_._2)); val linS = avg(linBoxes.map(_._2))
    assert(zS < 0.6 * linS, s"z avg suppkey range $zS vs linear $linS")
    val zP = avg(zBoxes.map(_._1))
    assert(zP < 0.6, s"z avg partkey range $zP not bounded")
  }

  test("partitioned layout: static AND dynamic partition pruning both fire") {
    // hive-layout fact partitioned by order year; a 100 TB fact table's
    // partition-key predicates must never touch non-matching directories
    val dir = java.nio.file.Files.createTempDirectory("graft_part_").toString + "/t"
    val fact = Tables.orders(spark, sf)
      .withColumn("o_yr", year($"o_orderdate").cast("int"))
    Layout.writePartitioned(fact, dir, Seq("o_yr"))
    val factR = spark.read.parquet(dir)
    val years = fact.select($"o_yr").distinct().as[Int].collect().sorted
    assert(years.length > 1, "fixture should span multiple years")

    // STATIC pruning: a literal partition-key filter reads one directory
    val static = factR.filter($"o_yr" === years.head)
    val staticScan = static.queryExecution.executedPlan.toString
    assert(staticScan.contains("PartitionFilters"), staticScan)
    assert(static.count() == fact.filter($"o_yr" === years.head).count())

    // DYNAMIC pruning: joining against a FILTERED dim on the partition key
    // must inject a runtime dynamicpruning predicate into the fact scan —
    // the dim's surviving keys prune fact directories before the join reads
    // them (Catalyst PlanDynamicPruningFilters + broadcast reuse)
    // the dim must be a real SCAN with a surviving Filter: a filtered
    // in-memory relation constant-folds to a bare LocalRelation
    // (ConvertToLocalRelation), leaving no selective predicate for DPP's
    // heuristic to see — exactly why a literal IN list doesn't get DPP but
    // a filtered dimension table does. The filter is a comparison on a
    // NON-join column (bare boolean attrs also fail isLikelySelective).
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dim_").toString + "/d"
    years.toSeq.toDF("yr")
      .withColumn("tag", when($"yr" === years.head, "focus").otherwise("other"))
      .write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = factR.join(broadcast(dim.filter($"tag" === "focus")),
      factR("o_yr") === $"yr")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"fact scan must carry a runtime partition-pruning predicate:\n$plan")
    assert(joined.count() == fact.filter($"o_yr" === years.head).count())
  }

  test("manifest: rewrite-stable content rows, any changed value detected") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text", $"source")
    def write(df: org.apache.spark.sql.DataFrame): String = {
      val p = java.nio.file.Files.createTempDirectory("graft_mani_").toString + "/t"
      Layout.writeClustered(df, p, Seq("doc_id"), numFiles = 4)
      p
    }
    // content rows (everything but the uuid part-file name)
    def content(path: String) = Layout.manifest(spark, path, Seq("doc_id"))
      .select($"n_rows", $"fingerprint", $"min_doc_id", $"max_doc_id")
      .as[(Long, Long, Long, Long)].collect().toSet
    val a = content(write(docs))
    val b = content(write(docs))
    assert(a == b, "same rows + same layout must give identical manifests")
    assert(a.toSeq.map(_._1).sum == docs.count(), "row counts cover the dataset")
    // flip ONE character of one row: exactly one file's fingerprint changes
    val mutated = docs.withColumn("text",
      when($"doc_id" === 137L, concat($"text", lit("X"))).otherwise($"text"))
    val c = content(write(mutated))
    assert(a != c, "a single changed value must change the manifest")
    assert(a.map(t => (t._1, t._3, t._4)) == c.map(t => (t._1, t._3, t._4)),
      "counts and key ranges unchanged — only a fingerprint moved")
    assert((a -- c).size == 1 && (c -- a).size == 1,
      "exactly one file's fingerprint differs")
  }
}
