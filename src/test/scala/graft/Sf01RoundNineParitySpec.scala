package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{GraphQueries, IncrementalGraph, MaterializedAgg}
import graft.sources.Tables

/** sf0.1 parity for the round-9-continuation operators, extending the
  * Sf01DedupParitySpec pattern: the DuckDB oracle gates at sf0.01; these
  * re-check the numerics that SHIFT with scale at sf0.1 against
  * independent in-engine paths — 10× more users multiplies boundary
  * transitions across incremental slices, and 10× more orders populates
  * every (day, status) cell the MV merge folds.
  */
class Sf01RoundNineParitySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val sfBig = "/root/testdata/sf0.1"

  test("incremental pagerank store at sf0.1 equals the one-shot window pass", SlowTest) {
    val store = java.nio.file.Files
      .createTempDirectory("graft_pg_sf01_").toString
    try {
      val events = Tables.events(spark, sfBig)
      val b = events.agg(min(unix_micros($"ts")), max(unix_micros($"ts"))).head()
      val (t0, t1) = (b.getLong(0), b.getLong(1))
      val cuts = (0 to 5).map(i => t0 + i * ((t1 - t0) / 5 + 1))
      (0 until 5).foreach { i =>
        IncrementalGraph.admitEvents(spark, store,
          events.filter(unix_micros($"ts") >= cuts(i) &&
            unix_micros($"ts") < cuts(i + 1)),
          maintainEvery = 2, id = Some(s"sf01b$i"))
      }
      val stored = IncrementalGraph.edgesFromStore(spark, store)
        .as[(String, String, Long)].collect()
        .map(e => (e._1, e._2) -> e._3).toMap
      val oneShot = GraphQueries.transitionEdges(events)
        .as[(String, String, Long)].collect()
        .map(e => (e._1, e._2) -> e._3).toMap
      assert(stored == oneShot)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store)):
        Unit
    }
  }

  test("materialized view at sf0.1: 6-way interleaved admission equals one groupBy", SlowTest) {
    val store = java.nio.file.Files
      .createTempDirectory("graft_mv_sf01_").toString
    try {
      val orders = Tables.orders(spark, sfBig)
      (0 until 6).foreach { i =>
        MaterializedAgg.admitOrders(spark, store,
          orders.filter($"o_orderkey" % 6 === i), maintainEvery = 2,
          id = Some(s"sf01m$i"))
      }
      val got = MaterializedAgg.serveOrders(spark, store)
        .select($"day".cast("string"), $"o_orderstatus", $"n",
          round($"revenue" * 100).cast("long"))
        .as[(String, String, Long, Long)].collect()
        .map { case (d, s, n, r) => (d, s) -> ((n, r)) }.toMap
      val direct = orders
        .groupBy(to_date($"o_orderdate").cast("string").as("day"),
          $"o_orderstatus")
        .agg(count(lit(1)).as("n"),
          round(sum($"o_totalprice".cast("decimal(18,2)")).cast("double") * 100)
            .cast("long").as("r"))
        .as[(String, String, Long, Long)].collect()
        .map { case (d, s, n, r) => (d, s) -> ((n, r)) }.toMap
      assert(got.size == direct.size && got == direct)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store)):
        Unit
    }
  }
}
