package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time transforms shared by batch and Structured Streaming paths.
  *
  * The reference has no streaming at all (batch RDD only —
  * `/root/reference/src/main/scala/se/uu/it/mare/MaRe.scala`); this module is
  * part of the declared engine surface (SURVEY.md §2.B "Streaming"). Each
  * transform takes a DataFrame that may come from `spark.read` (batch) or
  * `spark.readStream`/MemoryStream (streaming) — the same Catalyst
  * expressions plan in both modes, which is the Structured Streaming design
  * point. StreamingSpec drives them through MemoryStream with watermarks;
  * the batch-mode equivalents are oracle-checked in EventsQueries.
  *
  * Scale notes: windowed aggregation state is bounded by the watermark
  * (late data beyond it is dropped, state evicted); keys are
  * (window, event_type) or (user, session) — high-cardinality enough to
  * spread across executors without salting.
  */
object EventStreams {

  /** Tumbling event-time window aggregation (counts + value sum). */
  def tumblingCounts(events: DataFrame, windowLen: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding event-time window aggregation. */
  def slidingCounts(events: DataFrame, windowLen: String, slide: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"))

  /** Session windows per user: events closer than `gap` merge into one
    * session (Spark's native session_window — dynamic, state-merging). */
  def sessionStats(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))

  /** Same transform with a watermark, for streaming use: state for windows
    * older than the watermark is finalized + evicted; events later than the
    * watermark are dropped. */
  def tumblingCountsWatermarked(events: DataFrame, windowLen: String,
      watermark: String): DataFrame =
    tumblingCounts(events.withWatermark("ts", watermark), windowLen)

  def sessionStatsWatermarked(events: DataFrame, gap: String,
      watermark: String): DataFrame =
    sessionStats(events.withWatermark("ts", watermark), gap)

  /** Stream-static enrichment join: the streaming side keeps its event-time
    * columns; the static side is re-EXECUTED each micro-batch, but for
    * file-based dims the file LISTING was snapshotted when the DataFrame was
    * created, so rows appended as new files after query start are NOT picked
    * up (and replaced files can fail the scan). A dim that must track
    * updates needs to be re-created per batch (foreachBatch) or come from a
    * format whose index refreshes (a transactional table format). At scale
    * the static side should be broadcast — it participates in every
    * micro-batch, and a shuffle join would re-shuffle the stream's state
    * store keys. */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** foreachBatch keyed-upsert sink (MERGE for plain parquet targets): keep
    * the batch's last row per key (by `orderCol`), drop replaced keys from
    * the current target, rewrite atomically via write-new + swap. The result
    * is a pure function of (target state, batch contents), so re-running a
    * batch after a sink-side failure converges to the identical state — the
    * idempotent-upsert pattern that gives exactly-once EFFECT on a
    * non-transactional sink. On a real deployment the swap step is the one
    * piece to replace with a transactional table format; the dataflow
    * (dedupe → anti-join → union) is unchanged. */
  def upsertByKey(target: String, key: String, orderCol: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import org.apache.spark.sql.expressions.Window
    // tie-break equal orderCol values by a content hash: row_number ties
    // otherwise fall to partition-internal row order, which changes across
    // retries — and a replay that picks a different row breaks the
    // converges-on-replay guarantee this sink exists to provide
    val latest = batch
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(key))
          .orderBy(col(orderCol).desc, xxhash64(struct(batch.columns.map(col): _*)))))
      .filter(col("__rn") === 1).drop("__rn")
    val dir = new java.io.File(target)
    val bak = new java.io.File(target + ".old")
    // recovery: a missing target with a surviving .old means a previous
    // promote died between its two renames — restore the pre-batch state
    // FIRST, so the invariant "target holds the live state (when it exists)"
    // is re-established before anything reads or deletes. Without this, a
    // replay would treat the sink as empty and silently drop every key
    // upserted by earlier batches.
    if (!dir.exists() && bak.exists() && !bak.renameTo(dir))
      throw new java.io.IOException(s"could not restore $bak to $target")
    val merged =
      if (dir.exists()) {
        val current = spark.read.parquet(target)
        current.join(latest.select(col(key)), Seq(key), "left_anti")
          .unionByName(latest)
      } else latest
    val tmp = target + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    // local-FS swap, crash-safe at every boundary: the live state is always
    // in target or .old — never deleted before the new state is promoted.
    // Transactional formats replace exactly this step.
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    if (bak.exists()) rm(bak) // leftover of a fully-promoted prior swap
    if (dir.exists() && !dir.renameTo(bak))
      throw new java.io.IOException(s"could not move $target aside to $bak")
    if (!new java.io.File(tmp).renameTo(dir))
      throw new java.io.IOException(s"could not move $tmp to $target")
    rm(bak)
  }

  /** Watermarked stream-stream join: each left event pairs with right events
    * of the same user in [l_ts, l_ts + maxDelay] — the click→conversion /
    * impression→purchase correlation shape. Both inputs are watermarked and
    * the join condition time-bounds r_ts against l_ts, which is exactly what
    * Structured Streaming needs to bound the join state store: a buffered
    * left row is evictable once the right watermark passes l_ts + maxDelay
    * (and vice versa), so state is O(rate × (maxDelay + watermark)), not
    * unbounded. `joinType` "inner" or "left_outer" — outer emits the
    * null-padded left row only after the watermark proves no match can
    * arrive. Batch DataFrames plan the same expressions (withWatermark is a
    * batch no-op), so the join is differentially testable against a plain
    * batch join (StreamingSpec). */
  def correlatedJoin(left: DataFrame, right: DataFrame, maxDelay: String,
      watermark: String, joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("l_ts"),
        col("event_type").as("l_type"), col("value").as("l_value"))
    val r = right.withWatermark("ts", watermark)
      .select(col("user_id").as("r_user_id"), col("ts").as("r_ts"),
        col("event_type").as("r_type"))
    l.join(r,
      col("user_id") === col("r_user_id") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxDelay"),
      joinType)
      .select(col("user_id"), col("l_ts"), col("l_type"), col("l_value"),
        col("r_ts"), col("r_type"))
  }
}
