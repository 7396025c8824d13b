package graft

import java.sql.Timestamp

import org.apache.commons.io.FileUtils
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{EventsSketches, IncrementalDedup, IncrementalGraph, IvfIndex, MaterializedAgg, Resample, SimilaritySearch}
import graft.sources.{ProtocolPoints, Store}

/** Checkpoint kill-and-restart for every store-backed streaming admission
  * face (VERDICT r9 task 5). The idempotent-id replay of each face was
  * previously pinned only by hand-invoked duplicate admissions; here each
  * family is driven through a REAL StreamingQuery checkpoint cycle:
  *
  *  1. a reference query ingests all batches uninterrupted into store A;
  *  2. the query under test ingests batch 1 into store B, is STOPPED,
  *     batch 2 arrives while it is down, and a new query resumed from the
  *     SAME checkpoint delivers it, then batch 3;
  *  3. a third restart against committed offsets only must admit nothing
  *     (replayed micro-batch ids no-op);
  *  4. the served result from store B must equal store A's.
  *
  * One family (resample) additionally drives the true torn window: a
  * fault hook kills the sink AFTER the store commit rename but BEFORE the
  * streaming checkpoint commits, so the restarted query REPLAYS that
  * micro-batch id against an already-committed delta — the exactly-once
  * upgrade the `.admitted-` markers exist for, now exercised through the
  * real recovery path instead of a hand-called duplicate. */
class StreamingAdmissionRestartSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def fresh(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def sweep(dirs: String*): Unit =
    dirs.foreach(d => FileUtils.deleteQuietly(new java.io.File(d)): Unit)

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Run the interrupted protocol: start from `ckpt`, feed+process batch 0,
    * stop; feed batch 1 while down; restart, drain, feed+process batch 2,
    * stop; restart once more with nothing new (committed offsets only). */
  private def interrupted(start: () => StreamingQuery,
      feeds: Seq[() => Unit]): Unit = {
    require(feeds.size == 3)
    val q1 = start()
    try { feeds(0)(); q1.processAllAvailable() } finally q1.stop()
    feeds(1)() // arrives while no query is running
    val q2 = start()
    try { q2.processAllAvailable(); feeds(2)(); q2.processAllAvailable() }
    finally q2.stop()
    val q3 = start() // replays committed offsets only
    try q3.processAllAvailable() finally q3.stop()
  }

  /** Run all three batches through one uninterrupted query. */
  private def uninterrupted(start: () => StreamingQuery,
      feeds: Seq[() => Unit]): Unit = {
    val q = start()
    try { feeds.foreach { f => f(); q.processAllAvailable() } }
    finally q.stop()
  }

  // ---- events fixture shared by pagerank / bitmap / resample ------------
  private val eventBatches: Seq[Seq[(Long, Timestamp, Long, String, Double)]] = Seq(
    Seq((1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
      (1L, ts("2024-01-01 10:05:00"), 2L, "click", 2.0),
      (2L, ts("2024-01-01 10:10:00"), 3L, "view", 3.0)),
    Seq((1L, ts("2024-01-01 11:00:00"), 4L, "buy", 4.0),
      (2L, ts("2024-01-01 11:30:00"), 5L, "click", 1.5),
      (3L, ts("2024-01-01 12:00:00"), 6L, "view", 2.5)),
    Seq((2L, ts("2024-01-01 13:00:00"), 7L, "buy", 0.5),
      (3L, ts("2024-01-01 13:05:00"), 8L, "click", 9.0),
      (1L, ts("2024-01-01 14:00:00"), 9L, "view", 7.0)))

  private def eventsDF(in: MemoryStream[(Long, Timestamp, Long, String, Double)]): DataFrame =
    in.toDF().toDF("user_id", "ts", "event_id", "event_type", "value")

  private def runEventsFamily(mkWriter: (DataFrame, String) =>
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row],
      serve: String => Seq[String]): Unit = {
    implicit val sql = spark.sqlContext
    val (refStore, refCkpt) = (fresh("graft_sar_ref_"), fresh("graft_sar_refck_"))
    val (store, ckpt) = (fresh("graft_sar_store_"), fresh("graft_sar_ck_"))
    try {
      val refIn = MemoryStream[(Long, Timestamp, Long, String, Double)]
      uninterrupted(
        () => mkWriter(eventsDF(refIn), refStore)
          .option("checkpointLocation", refCkpt).start(),
        eventBatches.map(b => () => { refIn.addData(b); () }))
      val in = MemoryStream[(Long, Timestamp, Long, String, Double)]
      interrupted(
        () => mkWriter(eventsDF(in), store)
          .option("checkpointLocation", ckpt).start(),
        eventBatches.map(b => () => { in.addData(b); () }))
      assert(serve(store) == serve(refStore),
        "kill/restart must be invisible in the served result")
    } finally sweep(refStore, refCkpt, store, ckpt)
  }

  test("pagerank admission: kill/restart from checkpoint equals uninterrupted run") {
    runEventsFamily(
      (df, store) => IncrementalGraph.pagerankStreamingAdmission(df, store),
      store => IncrementalGraph.pagerankFromStore(spark, store)
        .collect().map(_.toString).toSeq)
  }

  test("bitmap admission: kill/restart from checkpoint equals uninterrupted run") {
    runEventsFamily(
      (df, store) => EventsSketches.bitmapStreamingAdmission(df, store),
      store => EventsSketches.distinctFromStore(spark, store)
        .collect().map(_.toString).toSeq)
  }

  test("bloom-indexed store admission: kill/restart from checkpoint equals uninterrupted run") {
    import org.apache.spark.sql.functions.lit
    runEventsFamily(
      (df, store) => graft.sources.BloomIndex.streamingAdmission(
        df, s"$store/data", s"$store/stats", "event_id"),
      store => (1L to 9L).flatMap { k =>
        val (df, _) = graft.sources.BloomIndex.lookupIndexed(spark,
          s"$store/data", s"$store/stats", "event_id", lit(k))
        df.select("event_id", "user_id", "event_type")
          .collect().map(_.toString).toSeq
      })
  }

  test("zone-mapped store admission: kill/restart from checkpoint equals uninterrupted run") {
    import org.apache.spark.sql.functions.lit
    runEventsFamily(
      (df, store) => graft.sources.ZoneMaps.streamingAdmission(
        df, s"$store/data", s"$store/stats", Seq("ts")),
      store => {
        val (df, _) = graft.sources.ZoneMaps.lookupRangeIndexed(spark,
          s"$store/data", s"$store/stats",
          Seq(("ts", lit("2024-01-01 10:00:00").cast("timestamp"),
            lit("2024-01-01 12:30:00").cast("timestamp"))))
        df.select("event_id", "user_id", "event_type")
          .collect().map(_.toString).toSeq.sorted
      })
  }

  test("resample admission: kill/restart from checkpoint equals uninterrupted run") {
    runEventsFamily(
      (df, store) => Resample.streamingAdmission(df, store),
      store => Resample.gridFromStore(spark, store)
        .collect().map(_.toString).toSeq)
  }

  test("resample admission: sink killed AFTER the store commit but BEFORE the checkpoint commit — replay no-ops (true torn window)") {
    implicit val sql = spark.sqlContext
    val (refStore, refCkpt) = (fresh("graft_sar_ref_"), fresh("graft_sar_refck_"))
    val (store, ckpt) = (fresh("graft_sar_store_"), fresh("graft_sar_ck_"))
    try {
      val refIn = MemoryStream[(Long, Timestamp, Long, String, Double)]
      uninterrupted(
        () => Resample.streamingAdmission(eventsDF(refIn), refStore)
          .option("checkpointLocation", refCkpt).start(),
        eventBatches.map(b => () => { refIn.addData(b); () }))
      val in = MemoryStream[(Long, Timestamp, Long, String, Double)]
      def start() = Resample.streamingAdmission(eventsDF(in), store)
        .option("checkpointLocation", ckpt).start()
      val q1 = start()
      try { in.addData(eventBatches(0)); q1.processAllAvailable() }
      finally q1.stop()
      // arm the torn window for the NEXT micro-batch: die right after the
      // delta's commit rename lands, before foreachBatch returns — the
      // streaming checkpoint never records the batch as done
      val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
      ProtocolPoints.installGlobal { point =>
        if (point == "store.committed" && fired.compareAndSet(false, true))
          throw new RuntimeException("injected crash after store commit")
      }
      try {
        in.addData(eventBatches(1))
        val q2 = start()
        val died = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q2.processAllAvailable()
          q2.awaitTermination(30000): Unit
        }
        assert(died.getMessage.contains("injected crash") ||
          Option(died.getCause).exists(_.getMessage.contains("injected crash")))
      } finally ProtocolPoints.uninstallGlobal()
      // the batch IS in the store (commit landed) though the query died
      assert(Store.deltaCount(store) >= 1 || Store.hasData(store))
      // restart: Structured Streaming REPLAYS the uncommitted micro-batch;
      // the idempotent id finds the delta and no-ops — exactly once
      val q3 = start()
      try { q3.processAllAvailable(); in.addData(eventBatches(2)); q3.processAllAvailable() }
      finally q3.stop()
      val got = Resample.gridFromStore(spark, store).collect().map(_.toString).toSeq
      val want = Resample.gridFromStore(spark, refStore).collect().map(_.toString).toSeq
      assert(got == want, "torn-window replay must be invisible in the grid")
    } finally sweep(refStore, refCkpt, store, ckpt)
  }

  test("mv orders admission: kill/restart from checkpoint equals uninterrupted run") {
    implicit val sql = spark.sqlContext
    val batches: Seq[Seq[(Long, String, String, Double)]] = Seq(
      Seq((1L, "1995-01-01", "O", 100.10), (2L, "1995-01-01", "F", 20.25)),
      Seq((3L, "1995-01-02", "O", 33.33), (4L, "1995-01-01", "O", 4.00)),
      Seq((5L, "1995-01-03", "F", 55.50), (6L, "1995-01-02", "O", 6.75)))
    def df(in: MemoryStream[(Long, String, String, Double)]): DataFrame =
      in.toDF().toDF("o_orderkey", "o_orderdate", "o_orderstatus", "o_totalprice")
    val (refStore, refCkpt) = (fresh("graft_sar_ref_"), fresh("graft_sar_refck_"))
    val (store, ckpt) = (fresh("graft_sar_store_"), fresh("graft_sar_ck_"))
    try {
      val refIn = MemoryStream[(Long, String, String, Double)]
      uninterrupted(
        () => MaterializedAgg.ordersStreamingAdmission(df(refIn), refStore)
          .option("checkpointLocation", refCkpt).start(),
        batches.map(b => () => { refIn.addData(b); () }))
      val in = MemoryStream[(Long, String, String, Double)]
      interrupted(
        () => MaterializedAgg.ordersStreamingAdmission(df(in), store)
          .option("checkpointLocation", ckpt).start(),
        batches.map(b => () => { in.addData(b); () }))
      val serve = (s: String) => MaterializedAgg.serveOrders(spark, s)
        .collect().map(_.toString).toSeq
      assert(serve(store) == serve(refStore))
    } finally sweep(refStore, refCkpt, store, ckpt)
  }

  test("chunk-dedup admission: kill/restart from checkpoint equals uninterrupted run (span index byte-equivalent)") {
    implicit val sql = spark.sqlContext
    val batches: Seq[Seq[(Long, String)]] = Seq(
      Seq((1L, Seq.fill(3)((1 to 16).map(i => s"w$i").mkString(" ")).mkString(" ")),
        (2L, (1 to 16).map(i => s"w$i").mkString(" ") + " " +
          (17 to 32).map(i => s"x$i").mkString(" "))),
      Seq((3L, (17 to 32).map(i => s"x$i").mkString(" ")),
        (4L, (100 to 115).map(i => s"y$i").mkString(" "))),
      Seq((5L, (100 to 115).map(i => s"y$i").mkString(" ") + " " +
        (200 to 215).map(i => s"z$i").mkString(" "))))
    def df(in: MemoryStream[(Long, String)]): DataFrame =
      in.toDF().toDF("doc_id", "text")
    val (refStore, refCkpt) = (fresh("graft_sar_ref_"), fresh("graft_sar_refck_"))
    val (store, ckpt) = (fresh("graft_sar_store_"), fresh("graft_sar_ck_"))
    try {
      val refIn = MemoryStream[(Long, String)]
      uninterrupted(
        () => IncrementalDedup.chunkStreamingAdmission(df(refIn), refStore)
          .option("checkpointLocation", refCkpt).start(),
        batches.map(b => () => { refIn.addData(b); () }))
      val in = MemoryStream[(Long, String)]
      interrupted(
        () => IncrementalDedup.chunkStreamingAdmission(df(in), store)
          .option("checkpointLocation", ckpt).start(),
        batches.map(b => () => { in.addData(b); () }))
      val spans = (s: String) => Store.read(spark, s)
        .select($"ck", $"doc_id", $"idx")
        .collect().map(_.toString).sorted.toSeq
      assert(spans(store).nonEmpty)
      assert(spans(store) == spans(refStore),
        "the persisted span index must be identical across the restart")
    } finally sweep(refStore, refCkpt, store, ckpt)
  }

  test("ivf admission: kill/restart from checkpoint equals uninterrupted run (served top-k identical)") {
    implicit val sql = spark.sqlContext
    val dim = 8
    def vec(seed: Int): Seq[Float] =
      (0 until dim).map(i => (((seed * 31 + i * 17) % 97) / 97.0f - 0.5f))
    val all: Seq[(Long, Seq[Float])] = (0L until 30L).map(id => id -> vec(id.toInt))
    val batches = Seq(all.slice(0, 10), all.slice(10, 20), all.slice(20, 30))
    val codebook: Array[Array[Double]] =
      (0 until 4).map(c => vec(1000 + c).map(_.toDouble).toArray).toArray
    def df(in: MemoryStream[(Long, Seq[Float])]): DataFrame =
      in.toDF().toDF("vec_id", "embedding")
    val (refIdx, refCkpt) = (fresh("graft_sar_ref_"), fresh("graft_sar_refck_"))
    val (idx, ckpt) = (fresh("graft_sar_idx_"), fresh("graft_sar_ck_"))
    try {
      IvfIndex.writeIvfIndex(spark, refIdx, codebook)
      IvfIndex.writeIvfIndex(spark, idx, codebook)
      val refIn = MemoryStream[(Long, Seq[Float])]
      uninterrupted(
        () => IvfIndex.ivfStreamingAdmission(df(refIn), refIdx)
          .option("checkpointLocation", refCkpt).start(),
        batches.map(b => () => { refIn.addData(b); () }))
      val in = MemoryStream[(Long, Seq[Float])]
      interrupted(
        () => IvfIndex.ivfStreamingAdmission(df(in), idx)
          .option("checkpointLocation", ckpt).start(),
        batches.map(b => () => { in.addData(b); () }))
      val queries = spark.createDataset(all.take(5))
        .toDF("query_id", "q")
        .select($"query_id",
          graft.functions.Similarity.toDoubleArray($"q").as("q"))
      def serve(d: String) = IvfIndex.servedIvfTopk(spark, d, queries,
          k = SimilaritySearch.K, nprobe = 2)
        .collect().map(_.toString).toSeq
      assert(serve(idx).nonEmpty)
      assert(serve(idx) == serve(refIdx),
        "served top-k must be identical across the restart")
    } finally sweep(refIdx, refCkpt, idx, ckpt)
  }
}
