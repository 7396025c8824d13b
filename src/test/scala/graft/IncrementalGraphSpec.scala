package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{GraphQueries, IncrementalGraph}
import graft.sources.{Store, Tables}

/** Incremental transition-graph contract: chronological admission yields
  * edges provably identical to the one-shot window pass (boundary
  * transitions included), replay is keyed, compaction is invisible, the
  * two row kinds commit in one atomic batch, out-of-order admission is
  * demonstrably corrupt (the documented contract), and micro-batch
  * streaming serves the batch ranks.
  */
class IncrementalGraphSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def freshStore(): String = java.nio.file.Files
    .createTempDirectory("graft_pg_spec_").toString

  private def sweep(dir: String): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)): Unit
  }

  private def oneShotEdges(): Map[(String, String), Long] =
    GraphQueries.transitionEdges(Tables.events(spark, sf))
      .as[(String, String, Long)].collect()
      .map(e => (e._1, e._2) -> e._3).toMap

  private def storedEdges(store: String): Map[(String, String), Long] =
    IncrementalGraph.edgesFromStore(spark, store)
      .as[(String, String, Long)].collect()
      .map(e => (e._1, e._2) -> e._3).toMap

  private def chronoSlices(k: Int): Seq[org.apache.spark.sql.DataFrame] = {
    val events = Tables.events(spark, sf)
    val b = events.agg(min(unix_micros($"ts")), max(unix_micros($"ts"))).head()
    val (t0, t1) = (b.getLong(0), b.getLong(1))
    val cuts = (0 to k).map(i => t0 + i * ((t1 - t0) / k + 1))
    (0 until k).map { i =>
      events.filter(unix_micros($"ts") >= cuts(i) &&
        unix_micros($"ts") < cuts(i + 1))
    }
  }

  test("chronological slices reproduce the one-shot edges exactly (boundaries included)") {
    val store = freshStore()
    try {
      chronoSlices(4).zipWithIndex.foreach { case (s, i) =>
        IncrementalGraph.admitEvents(spark, store, s, id = Some(s"s$i"))
      }
      assert(storedEdges(store) == oneShotEdges())
      // and therefore the served ranks match the batch operator
      val served = IncrementalGraph.pagerankFromStore(spark, store)
        .as[(String, Double)].collect().toMap
      val batch = GraphQueries.eventsPagerank(spark, sf)
        .as[(String, Double)].collect().toMap
      assert(served == batch)
    } finally sweep(store)
  }

  test("boundary edges are really derived from the frontier (hand case)") {
    val store = freshStore()
    try {
      def mk(rows: Seq[(Long, String, Long, String)]) = rows
        .toDF("user_id", "ts_s", "event_id", "event_type")
        .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
      // user 1: A then (next batch) B — the edge A>B exists in NO single batch
      IncrementalGraph.admitEvents(spark, store,
        mk(Seq((1L, "2024-01-01 10:00:00", 1L, "A"))), id = Some("b0"))
      IncrementalGraph.admitEvents(spark, store,
        mk(Seq((1L, "2024-01-01 11:00:00", 2L, "B"))), id = Some("b1"))
      assert(storedEdges(store) == Map(("A", "B") -> 1L))
    } finally sweep(store)
  }

  test("keyed replay is a no-op on edges AND frontier") {
    val store = freshStore()
    try {
      val Seq(s0, s1) = chronoSlices(2)
      IncrementalGraph.admitEvents(spark, store, s0, id = Some("b0"))
      assert(!IncrementalGraph.admitEvents(spark, store, s0, id = Some("b0")))
      IncrementalGraph.admitEvents(spark, store, s1, id = Some("b1"))
      assert(storedEdges(store) == oneShotEdges(),
        "replayed first slice must not double its edges or stall the frontier")
    } finally sweep(store)
  }

  test("compaction mid-stream is invisible; delta count bounded") {
    val store = freshStore()
    try {
      chronoSlices(8).zipWithIndex.foreach { case (s, i) =>
        IncrementalGraph.admitEvents(spark, store, s, maintainEvery = 3,
          id = Some(s"c$i"))
      }
      assert(Store.deltaCount(store) < 8, "compaction must fold deltas")
      assert(storedEdges(store) == oneShotEdges())
    } finally sweep(store)
  }

  test("one admission = one atomic store batch carrying both row kinds") {
    val store = freshStore()
    try {
      val Seq(s0, s1) = chronoSlices(2)
      IncrementalGraph.admitEvents(spark, store, s0, id = Some("b0"))
      IncrementalGraph.admitEvents(spark, store, s1, id = Some("b1"))
      assert(Store.deltaCount(store) == 2,
        "edges+frontier must share one delta per admission — two would tear")
      // each delta holds both kinds (the second sees a frontier to extend)
      val kinds = Store.read(spark, store).select($"kind").distinct()
        .as[String].collect().toSet
      assert(kinds == Set("e", "f"))
    } finally sweep(store)
  }

  test("out-of-order admission corrupts boundary edges — the contract is real") {
    val store = freshStore()
    try {
      val Seq(s0, s1) = chronoSlices(2)
      IncrementalGraph.admitEvents(spark, store, s1, id = Some("b0")) // late first
      IncrementalGraph.admitEvents(spark, store, s0, id = Some("b1"))
      assert(storedEdges(store) != oneShotEdges(),
        "reversed admission must NOT accidentally equal the one-shot edges " +
          "(if it did, the chronological contract would be documentation theater)")
    } finally sweep(store)
  }

  test("streamed chronological micro-batches serve the batch ranks") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = freshStore()
    try {
      val raw = Tables.events(spark, sf)
        .select($"user_id", unix_micros($"ts").as("tus"), $"event_id",
          $"event_type")
        .as[(Long, Long, Long, String)].collect().sortBy(r => (r._2, r._3))
      val input = MemoryStream[(Long, Long, Long, String)]
      val stream = input.toDF()
        .toDF("user_id", "tus", "event_id", "event_type")
        .withColumn("ts", timestamp_micros($"tus")).drop("tus")
      val q = IncrementalGraph.pagerankStreamingAdmission(stream, store).start()
      try {
        // time-ordered thirds — the shape a watermarked source delivers
        raw.grouped((raw.length + 2) / 3).foreach { chunk =>
          input.addData(chunk.toSeq); q.processAllAvailable()
        }
      } finally q.stop()
      val served = IncrementalGraph.pagerankFromStore(spark, store)
        .as[(String, Double)].collect().toMap
      val batch = GraphQueries.eventsPagerank(spark, sf)
        .as[(String, Double)].collect().toMap
      assert(served == batch)
    } finally sweep(store)
  }

  test("admission plan: batch firsts broadcast INTO the frontier, never the reverse") {
    val Seq(s0, s1) = chronoSlices(2)
    // the frontier side at production scale is |all users|; give it an
    // explicit identity here so the pin reads the roles, not the data sizes
    val frontier = s0.groupBy($"user_id")
      .agg(max_by($"event_type", struct($"ts", $"event_id")).as("last_type"))
    val boundary = IncrementalGraph.boundaryEdges(s1, frontier)
    boundary.collect()
    val plan = boundary.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"),
      s"boundary join must be a broadcast probe:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the frontier must never be shuffled for the boundary join:\n$plan")
  }
}
