package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.MaterializedAgg
import graft.sources.{Store, Tables}

/** The incremental materialized-view contract: admission in any order and
  * granularity, compaction, keyed replay, and streaming micro-batches must
  * all serve a view byte-identical to the one-shot recompute — and since
  * the measures are sums (+ is NOT replay-idempotent, unlike the bitmap
  * store's OR), the idempotency id must be demonstrably load-bearing.
  */
class MaterializedAggSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def freshStore(): String = java.nio.file.Files
    .createTempDirectory("graft_mv_spec_").toString

  private def sweep(dir: String): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)): Unit
  }

  private def served(store: String): Seq[(String, String, Long, Long, Long, Long)] =
    MaterializedAgg.serveOrders(spark, store)
      .select($"day".cast("string"), $"o_orderstatus", $"n",
        // cents grids — revenue/min/max are exact at 2 decimals; avg is a
        // double division of exact inputs, stable far beyond 4 decimals
        round($"revenue" * 100).cast("long"),
        round($"avg_price" * 10000).cast("long"),
        (round($"min_price" * 100) * 1000000 + round($"max_price" * 100))
          .cast("long"))
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq

  test("interleaved half+half admission serves the one-shot view exactly") {
    val (one, inc) = (freshStore(), freshStore())
    try {
      val orders = Tables.orders(spark, sf)
      MaterializedAgg.admitOrders(spark, one, orders)
      MaterializedAgg.admitOrders(spark, inc, orders.filter($"o_orderkey" % 2 === 0))
      MaterializedAgg.admitOrders(spark, inc, orders.filter($"o_orderkey" % 2 =!= 0))
      val (a, b) = (served(one), served(inc))
      assert(a.nonEmpty && a == b)
    } finally { sweep(one); sweep(inc) }
  }

  test("keyed replay is a no-op; an UNKEYED replay double-counts (id is load-bearing)") {
    val store = freshStore()
    try {
      val orders = Tables.orders(spark, sf)
      assert(MaterializedAgg.admitOrders(spark, store, orders, id = Some("b0")))
      val before = served(store)
      // replay with the same id: refused, view unchanged
      assert(!MaterializedAgg.admitOrders(spark, store, orders, id = Some("b0")))
      assert(served(store) == before)
      // replay WITHOUT an id: + happily double-counts — the property that
      // makes the id mandatory for this store, unlike the OR-merged bitmaps
      assert(MaterializedAgg.admitOrders(spark, store, orders, id = None))
      val doubled = served(store)
      assert(doubled.map(_._3).sum == 2 * before.map(_._3).sum,
        "unkeyed replay must double the counts (that is WHY admission is keyed)")
    } finally sweep(store)
  }

  test("many tiny admissions + triggered compaction: same view, bounded deltas") {
    val store = freshStore()
    try {
      val orders = Tables.orders(spark, sf)
      // 12 single-shard admissions with compaction every 4 — the store is
      // rewritten by mergeCells repeatedly mid-stream
      (0 until 12).foreach { i =>
        MaterializedAgg.admitOrders(spark, store,
          orders.filter($"o_orderkey" % 12 === i), maintainEvery = 4,
          id = Some(s"shard$i"))
      }
      assert(Store.deltaCount(store) < 12,
        "compaction must have folded delta directories")
      val direct = MaterializedAgg.mvOrdersDaily(spark, sf)
        .select($"day".cast("string"), $"o_orderstatus", $"n",
          round($"revenue" * 100).cast("long"),
          round($"avg_price" * 10000).cast("long"),
          (round($"min_price" * 100) * 1000000 + round($"max_price" * 100))
            .cast("long"))
        .as[(String, String, Long, Long, Long, Long)].collect().toSeq
      assert(served(store) == direct)
    } finally sweep(store)
  }

  test("cells scale with |keys|, not |facts|: store rows = distinct view keys after compaction") {
    val store = freshStore()
    try {
      val orders = Tables.orders(spark, sf)
      (0 until 4).foreach { i =>
        MaterializedAgg.admitOrders(spark, store,
          orders.filter($"o_orderkey" % 4 === i), maintainEvery = 2,
          id = Some(s"s$i"))
      }
      // force a final fold so the bound is exact, then compare
      Store.maintain(spark, store, every = 1,
        rewrite = MaterializedAgg.mergeCells _)
      val nKeys = orders
        .select(to_date($"o_orderdate"), $"o_orderstatus").distinct().count()
      assert(Store.read(spark, store).count() == nKeys)
    } finally sweep(store)
  }

  test("streaming micro-batches (foreachBatch) serve the one-shot view; batchId keys replays") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = freshStore()
    try {
      val raw = Tables.orders(spark, sf)
        .select($"o_orderkey", $"o_orderdate".cast("string"), $"o_orderstatus",
          $"o_totalprice")
        .as[(Long, String, String, Double)].collect()
      val input = MemoryStream[(Long, String, String, Double)]
      val stream = input.toDF()
        .toDF("o_orderkey", "ts_s", "o_orderstatus", "o_totalprice")
        .withColumn("o_orderdate", $"ts_s".cast("timestamp")).drop("ts_s")
      val q = MaterializedAgg.ordersStreamingAdmission(stream, store).start()
      try {
        raw.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1).foreach {
          case (_, s) => input.addData(s.map(_._1).toSeq); q.processAllAvailable()
        }
      } finally q.stop()
      val one = freshStore()
      try {
        MaterializedAgg.admitOrders(spark, one, Tables.orders(spark, sf))
        assert(served(store) == served(one))
      } finally sweep(one)
    } finally sweep(store)
  }

  test("admission plan: one partial aggregate over the batch, no fact rescan at serve") {
    // the partials frame shuffles the BATCH once on the view key
    val partials = MaterializedAgg.orderPartials(Tables.orders(spark, sf))
    partials.collect()
    val plan = partials.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("orders\\.parquet".r.findAllIn(plan).size == 1,
      s"one batch scan:\n$plan")
    assert(plan.contains("HashAggregate"), s"hash partials expected:\n$plan")
    // serving reads ONLY the store — never the fact table
    val store = freshStore()
    try {
      MaterializedAgg.admitOrders(spark, store, Tables.orders(spark, sf))
      val serve = MaterializedAgg.serveOrders(spark, store)
      serve.collect()
      val splan = serve.queryExecution.executedPlan.toString
      assert(!splan.contains("orders.parquet"),
        s"serve must read cells only:\n$splan")
    } finally sweep(store)
  }
}
