package graft.queries

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._


import graft.functions.{TextFunctions => TF}

/** Incremental corpus deduplication — the production shape at 100 TB, where
  * a corpus is never re-deduplicated from scratch: a persisted fingerprint
  * index absorbs each new batch (a daily crawl drop, a stream micro-batch)
  * and batch documents are admitted iff their content is new.
  *
  * The batch-level operators here are deliberately STATE-FREE apart from the
  * index directory itself, so the same call works from a scheduled batch job
  * or inside `foreachBatch` of a Structured Streaming query (the index is
  * the state, and it survives restarts — the cross-RESTART face of
  * streaming dedup, complementing `dropDuplicatesWithinWatermark`'s
  * in-query state).
  *
  * Scale shape (the invariant everything below preserves): THE INDEX IS
  * NEVER SHUFFLED AND NEVER BROADCAST. A delta batch is orders of magnitude
  * smaller than the corpus index; every join broadcasts the batch (or a
  * ≤ batch-sized derivative) into a map-side probe of the index scan.
  * Growth is append-only parquet. Plain parquet append is atomic per task
  * file but not transactional across job failures — a real deployment wraps
  * the append in a table format's commit protocol; the admit-iff-new
  * contract is unchanged.
  */
object IncrementalDedup {

  /** Create (overwrite) the exact-dup index for an initial corpus slice:
    * one (fp, keeper_id) row per distinct md5 text fingerprint. */
  def writeExactIndex(docs: DataFrame, indexDir: String): Unit = {
    import docs.sparkSession.implicits._
    docs.select($"doc_id", TF.fingerprintMd5($"text").as("fp"))
      .groupBy($"fp").agg(min($"doc_id").as("keeper_id"))
      .write.mode(SaveMode.Overwrite).parquet(indexDir)
  }

  /** Admit `batch` (doc_id, text, ...) against the index at `indexDir`:
    * returns the admitted (doc_id, fp) rows — documents whose fingerprint
    * is new to the index AND minimal within the batch — and appends exactly
    * those fingerprints to the index.
    *
    * Join plan, in index-never-moves order:
    *  1. within-batch keep-min — one batch-sized hash aggregate;
    *  2. membership probe — the batch fingerprint set broadcasts INTO the
    *     index scan (inner BHJ, index side streamed map-side);
    *  3. the matched set that comes back is ≤ |batch| rows and broadcasts
    *     into the batch-side LEFT ANTI join (Spark builds anti joins on the
    *     right, which is why step 2's inner probe exists at all: a direct
    *     batch-anti-index would have to build on the corpus-sized index).
    *
    * The admitted frame is materialized with its lineage CUT (eager
    * `localCheckpoint`) BEFORE the append. A persist is not enough: the
    * parquet append refreshes the path's file index and invalidates cache
    * entries whose lineage reads that path, so a merely-persisted frame
    * would re-derive itself against its own appended output and evaluate
    * empty. (Cluster deployments wanting executor-loss durability for the
    * admitted frame swap in reliable `checkpoint()` — the same trade as the
    * CC loop's cut.) */
  def dedupeBatchExact(batch: DataFrame, indexDir: String): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val admitted =
      admissionFrame(batch, spark.read.parquet(indexDir)).localCheckpoint()
    admitted.select($"fp", $"doc_id".as("keeper_id"))
      .write.mode(SaveMode.Append).parquet(indexDir)
    admitted.orderBy($"doc_id")
  }

  /** The admission join of [[dedupeBatchExact]] BEFORE the lineage cut —
    * split out so the spec can assert the index-never-moves plan shape
    * (localCheckpoint executes eagerly, leaving only an RDD scan to
    * inspect on the returned frame). */
  private[graft] def admissionFrame(batch: DataFrame, index: DataFrame): DataFrame = {
    import batch.sparkSession.implicits._
    val batchKeep = batch
      .select($"doc_id", TF.fingerprintMd5($"text").as("fp"))
      .groupBy($"fp").agg(min($"doc_id").as("doc_id"))
    val matched = index.join(broadcast(batchKeep.select($"fp")), "fp")
      .select($"fp")
    batchKeep
      .join(broadcast(matched), Seq("fp"), "left_anti")
      .select($"doc_id", $"fp")
  }
}
