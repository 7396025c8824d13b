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

  test("BM25 index at sf0.1: served top-10 equals the dense recompute", SlowTest) {
    import graft.functions.{TextFunctions => TF}
    val store = java.nio.file.Files
      .createTempDirectory("graft_bm25_sf01_").toString
    try {
      val docs = Tables.documents(spark, sfBig)
      (0 until 3).foreach { i =>
        graft.queries.Bm25.admitDocs(spark, store,
          docs.filter($"doc_id" % 3 === i), maintainEvery = 2,
          id = Some(s"sfb$i"))
      }
      val terms = Seq("join", "hash", "window")
      val got = graft.queries.Bm25.rankFromStore(spark, store, terms)
        .as[(Long, Double, Long)].collect().toSeq
      // dense driver recompute at 10x corpus — the df/avgdl constants and
      // the tf distribution all shift with scale
      val toks = docs.select($"doc_id", TF.wordTokens($"text").as("ts"))
        .as[(Long, Seq[String])].collect()
      val n = toks.length
      val avgdl = toks.map(_._2.length.toLong).sum.toDouble / n
      val df = terms.map(t => t -> toks.count(_._2.contains(t))).toMap
      val (k1, b) = (1.2, 0.75)
      val expect = toks.flatMap { case (id, ts) =>
        val contribs = terms.flatMap { t =>
          val tf = ts.count(_ == t)
          if (tf == 0) None
          else Some(math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
            (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * ts.length / avgdl)))
        }
        if (contribs.isEmpty) None else Some((id, contribs.sum, contribs.size.toLong))
      }.sortBy { case (id, s, _) => (-s, id) }.take(10)
        .map { case (id, s, nt) => (id, math.round(s * 1e4) / 1e4, nt) }
        .toSeq
      assert(got == expect)
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
