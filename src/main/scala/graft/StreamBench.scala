package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{timestamp_micros, unix_micros}

/** Streaming-throughput harness (VERDICT r8 task 10): the streaming faces
  * are correctness-tested batch-parity via MemoryStream; this puts the
  * first NUMBERS on them — rows/sec through three representative sinks at
  * sf0.1, fed as fixed-size micro-batches with `processAllAvailable`
  * between batches (so the measured unit is the full micro-batch
  * round-trip: planning + state/store admission + commit, the number that
  * actually bounds a production trigger interval).
  *
  *  - domain_cap:      flatMapGroupsWithState token-budget admitter
  *                     (pure in-query state, one shuffle per batch);
  *  - chunk_admission: span-rewrite dedup admission into a persisted
  *                     Store index (broadcast-probe + crash-safe append);
  *  - bitmap_admission: day-keyed distinct-user bitmap partials into a
  *                     Store (blind OR-mergeable appends);
  *  - mv_admission:    materialized-view monoid partials (count/sum/min/
  *                     max per key) into a Store — the canonical
  *                     incremental-ETL sink;
  *  - pagerank_admission: transition-graph admission (within-batch lag
  *                     window + frontier probe + edges/frontier append) —
  *                     the face with real per-batch JOIN work against
  *                     stored state.
  *
  * Per face, the FIRST batch is reported separately (it pays codegen/JIT,
  * exactly like the batch bench's warmup argument) and steady-state
  * rows/sec is computed over the remaining batches. One JSON line to
  * stdout + full per-batch times to target/stream_bench.json. Not part of
  * the contractual Bench output — the driver's BENCH protocol is batch;
  * PERF_NOTES carries the numbers. */
object StreamBench {

  private def round1(x: Double): Double = math.rint(x * 10) / 10

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_STREAM_BENCH_OUT",
      "target/stream_bench.json")
    val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stream-bench")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions",
        scala.util.Try(cpus.toInt).getOrElse(32))
      .config("spark.sql.session.timeZone", "UTC")
      // store/index footers must carry ORDERED timestamp stats for the
      // footer-derived zone stats (ZoneMaps.statsForPaths); INT96 (the
      // legacy default) has undefined stats ordering. Values identical:
      // Spark timestamps are micros internally either way.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.streaming.checkpointLocation",
        Files.createTempDirectory("graft_sb_ckpt_").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext

    /** Feed `rows` in `batchSize` chunks through the streaming query built
      * by `start`, returning per-batch seconds. */
    def drive[T](rows: Seq[T], batchSize: Int,
        start: MemoryStream[T] => org.apache.spark.sql.streaming.StreamingQuery)(
        implicit enc: org.apache.spark.sql.Encoder[T]): Seq[Double] = {
      val input = MemoryStream[T]
      val q = start(input)
      try rows.grouped(batchSize).map { chunk =>
        val t0 = System.nanoTime()
        input.addData(chunk)
        q.processAllAvailable()
        (System.nanoTime() - t0) / 1e9
      }.toList
      finally q.stop()
    }

    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect().toSeq
    val events = graft.sources.Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type")
      .as[(Long, java.sql.Timestamp, Long, String)].collect().toSeq

    def tempStore(): String =
      Files.createTempDirectory("graft_sb_store_").toString
    def sweep(d: String): Unit =
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)): Unit

    val results = scala.collection.mutable.LinkedHashMap.empty[String, (Int, Int, Seq[Double])]

    // 1. domain-cap admitter: docs rows, in-query state only
    results("domain_cap") = (docs.size, 500, drive[(Long, String, String)](
      docs, batchSize = 500,
      in => queries.DataPipeline
        .domainCapStream(in.toDF().toDF("doc_id", "source", "text"),
          budget = 1300)
        .writeStream.outputMode("append").format("noop").start()))

    // 2. span-rewrite chunk admission into a persisted index
    val chunkStore = tempStore()
    results("chunk_admission") = (docs.size, 500, drive[(Long, String, String)](
      docs, batchSize = 500,
      in => queries.IncrementalDedup
        .chunkStreamingAdmission(
          in.toDF().toDF("doc_id", "source", "text"), chunkStore)
        .option("checkpointLocation",
          Files.createTempDirectory("graft_sb_ck1_").toString)
        .start()))
    sweep(chunkStore)

    // 3. bitmap distinct-user admission (events rows — the volume face)
    val bmStore = tempStore()
    results("bitmap_admission") = (events.size, 10000,
      drive[(Long, java.sql.Timestamp, Long, String)](
        events, batchSize = 10000,
        in => queries.EventsSketches
          .bitmapStreamingAdmission(
            in.toDF().toDF("event_id", "ts", "user_id", "event_type"), bmStore)
          .option("checkpointLocation",
            Files.createTempDirectory("graft_sb_ck2_").toString)
          .start()))
    sweep(bmStore)

    // 4. materialized-view admission (orders rows: keyed monoid partials)
    val orders = graft.sources.Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_orderdate", $"o_orderstatus", $"o_totalprice")
      .as[(Long, java.sql.Timestamp, String, Double)].collect().toSeq
    val mvStore = tempStore()
    results("mv_admission") = (orders.size, 10000,
      drive[(Long, java.sql.Timestamp, String, Double)](
        orders, batchSize = 10000,
        in => queries.MaterializedAgg
          .ordersStreamingAdmission(
            in.toDF().toDF("o_orderkey", "o_orderdate", "o_orderstatus",
              "o_totalprice"), mvStore)
          .option("checkpointLocation",
            Files.createTempDirectory("graft_sb_ck3_").toString)
          .start()))
    sweep(mvStore)

    // 5. transition-graph admission (time-ordered events: edges + frontier).
    // Order at MICROsecond precision — the admission contract's granularity
    // (Timestamp.getTime is millis; sub-ms reordering would corrupt edges).
    val eventsMicros = graft.sources.Tables.events(spark, sfDir)
      .select($"event_id", unix_micros($"ts").as("tus"), $"user_id",
        $"event_type")
      .as[(Long, Long, Long, String)].collect().toSeq
      .sortBy(e => (e._2, e._1))
    val pgStore = tempStore()
    results("pagerank_admission") = (eventsMicros.size, 10000,
      drive[(Long, Long, Long, String)](
        eventsMicros, batchSize = 10000,
        in => queries.IncrementalGraph
          .pagerankStreamingAdmission(
            in.toDF().toDF("event_id", "tus", "user_id", "event_type")
              .withColumn("ts", timestamp_micros($"tus")).drop("tus"),
            pgStore)
          .option("checkpointLocation",
            Files.createTempDirectory("graft_sb_ck4_").toString)
          .start()))
    sweep(pgStore)

    // 6. bloom-indexed store admission (events rows: data + per-file
    // blooms committed under one idempotency id per micro-batch)
    val blBase = tempStore()
    results("bloom_index_admission") = (events.size, 10000,
      drive[(Long, java.sql.Timestamp, Long, String)](
        events, batchSize = 10000,
        in => graft.sources.BloomIndex
          .streamingAdmission(
            in.toDF().toDF("event_id", "ts", "user_id", "event_type"),
            s"$blBase/data", s"$blBase/stats", "event_id")
          .option("checkpointLocation",
            Files.createTempDirectory("graft_sb_ck5_").toString)
          .start()))
    sweep(blBase)

    // 7. zone-mapped store admission (events rows: data + per-file min/max
    // ranges — the range-scan index's streaming face, round 11)
    val zmBase = tempStore()
    results("zone_index_admission") = (events.size, 10000,
      drive[(Long, java.sql.Timestamp, Long, String)](
        events, batchSize = 10000,
        in => graft.sources.ZoneMaps
          .streamingAdmission(
            in.toDF().toDF("event_id", "ts", "user_id", "event_type"),
            s"$zmBase/data", s"$zmBase/stats", Seq("ts"))
          .option("checkpointLocation",
            Files.createTempDirectory("graft_sb_ck6_").toString)
          .start()))
    sweep(zmBase)

    def fmt(f: ((Int, Int, Seq[Double])) => String): String = results
      .map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    // steady-state rate excludes the first (codegen-paying) batch when
    // more than one batch ran. The first chunk of grouped() is always a
    // FULL batch, so the steady row count is exactly rows - batchSize —
    // dividing rows evenly across batches would let a partial last batch
    // inflate the rate.
    def steady(v: (Int, Int, Seq[Double])): String = {
      val (rows, batchSize, ts) = v
      if (ts.size <= 1) round1(rows / ts.sum).toString
      else round1((rows - batchSize).toDouble / ts.drop(1).sum).toString
    }
    val header = s""""metric":"stream_rows_per_sec","sf":"$sfDir","cpus":"$cpus""""
    val full = s"""{$header,"steady":${fmt(steady)},""" +
      s""""total_rows":${fmt(_._1.toString)},""" +
      s""""batch_secs":${fmt(v => v._3.map(round1).mkString("[", ",", "]"))}}"""
    val p = Paths.get(outPath)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, full.getBytes(StandardCharsets.UTF_8))
    println(full)
    Console.out.flush()
    spark.stop()
  }
}
