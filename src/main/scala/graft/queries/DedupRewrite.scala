package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.sources.Tables

/** Span-level dedup that REWRITES the corpus (RefinedWeb / Lee et al.
  * ACL'22 "keep one copy" policy) — distinct from the reporting families in
  * [[Dedup]]: `dedup_lines` strips boilerplate occurring in ≥ minDf docs
  * from EVERY document, and `dedup_span_overlap` only reports duplicated
  * spans. This operator keeps exactly ONE copy of every duplicated span —
  * the globally first occurrence — and deletes the rest, then reassembles
  * each document from its surviving spans. Training on the result sees
  * every byte of content once, instead of either nothing (boilerplate
  * strip) or all copies (no dedup).
  *
  * The corpus has no paragraph structure (single-line docs — FIXTURES.md),
  * so the span unit is a fixed window of `chunkWords` consecutive
  * normalized tokens (non-overlapping). First occurrence is the smallest
  * (doc_id, chunk_idx) pair, which makes the output a pure function of the
  * corpus — admission order can never change it.
  *
  * Scale shape (the part that matters at 100 TB): the global
  * first-occurrence decision shuffles ONLY (16-byte md5, doc_id, idx)
  * triples — span text is hashed map-side and never enters the wide
  * shuffle. Winners collapse to an ids-only per-doc index set, and the
  * rebuild re-derives each doc's chunk array from the documents scan and
  * filters it positionally — so full text moves through exactly ONE
  * doc_id equi-join (and at a lake whose documents table is bucketed by
  * doc_id, zero exchanges). Compare dedup_lines, which shuffles line text
  * into its rebuild aggregate: here the heavy column rides the narrow
  * side of the plan the whole way. Spec-pinned: the window input carries
  * no text column.
  */
object DedupRewrite {

  /** Chunk width in normalized tokens. 16 ≈ two sentences of boilerplate —
    * small enough to catch sub-document copying, large enough that chance
    * 16-gram collisions are negligible. */
  val ChunkWords = 16

  /** (doc_id, toks) projection of a documents frame. */
  private[graft] def tokenized(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select($"doc_id", TextFunctions.wordTokens($"text").as("toks"))
  }

  /** The doc's non-overlapping chunk array over a `toks` column,
    * re-derivable from any scan: chunk i = tokens [i*W, i*W + W) (slice is
    * 1-based; `div` because Column./ is double division, and
    * sequence(0, -1) on an empty doc would count DOWN — the empty guard
    * short-circuits both). */
  private[graft] def chunkArr: Column = {
    val toks = col("toks")
    when(size(toks) === 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0),
          expr(s"cast((size(toks) + ${ChunkWords - 1}) div $ChunkWords as int) - 1")),
        i => array_join(slice(toks, i * ChunkWords + 1, lit(ChunkWords)), " ")))
  }

  /** (doc_id, idx, ck) — every chunk of every doc, hashed map-side so no
    * downstream decision operator ever sees span text. */
  private[graft] def hashedChunks(tokDocs: DataFrame): DataFrame = {
    import tokDocs.sparkSession.implicits._
    tokDocs
      .filter(size($"toks") > 0)
      .select($"doc_id", posexplode(chunkArr))
      .toDF("doc_id", "idx", "chunk")
      .select($"doc_id", $"idx", md5($"chunk").as("ck"))
  }

  /** Reassemble docs from a per-doc kept-index set: (doc_id, n_tokens,
    * n_chunks_kept, text_dedup), ordered by doc_id. `keptIdx` must be
    * (doc_id, kept: array<int>); docs absent from it rebuild empty. */
  private[graft] def rebuild(tokDocs: DataFrame, keptIdx: DataFrame): DataFrame = {
    import tokDocs.sparkSession.implicits._
    rebuildUnordered(tokDocs, keptIdx).orderBy($"doc_id")
  }

  /** [[rebuild]] without the presentation sort — the incremental face
    * unions two rebuilds and orders ONCE on top; sorting each branch first
    * would be two redundant range shuffles whose order the union destroys
    * (surfaced by the AQE-on plan lint). */
  private[graft] def rebuildUnordered(tokDocs: DataFrame, keptIdx: DataFrame): DataFrame = {
    import tokDocs.sparkSession.implicits._
    tokDocs
      .join(keptIdx, Seq("doc_id"), "left")
      .select($"doc_id",
        size($"toks").cast("long").as("n_tokens"),
        coalesce(size($"kept"), lit(0)).cast("long").as("n_chunks_kept"),
        // rebuild in original order from the re-derived chunk array,
        // keeping only the surviving positions
        array_join(
          filter(chunkArr, (_, i) => array_contains(
            coalesce($"kept", array().cast("array<int>")), i)),
          " ").as("text_dedup"))
  }

  def dedupChunks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = tokenized(Tables.documents(spark, dir))
    val firstOcc = Window.partitionBy($"ck").orderBy($"doc_id", $"idx")
    val keptIdx = hashedChunks(docs)
      .withColumn("rn", row_number().over(firstOcc))
      .filter($"rn" === 1)
      .groupBy($"doc_id")
      .agg(collect_set($"idx").as("kept"))
    rebuild(docs, keptIdx)
  }

  val dedupChunksSql: String = {
    val toks = OracleFragments.tokens("text")
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    CASE WHEN length(${OracleFragments.norm("text")}) = 0
       |         THEN CAST([] AS VARCHAR[]) ELSE $toks END AS t
       |  FROM documents),
       |c AS (
       |  SELECT doc_id,
       |    CAST((i - 1) / $ChunkWords AS BIGINT) AS idx,
       |    array_to_string(t[i:i + ${ChunkWords - 1}], ' ') AS chunk
       |  FROM toks, unnest(range(1, len(t) + 1, $ChunkWords)) AS r(i)
       |  WHERE len(t) > 0),
       |w AS (
       |  SELECT doc_id, idx, chunk,
       |    row_number() OVER (PARTITION BY md5(chunk)
       |                       ORDER BY doc_id, idx) AS rn
       |  FROM c),
       |r AS (
       |  SELECT doc_id, count(*) AS n_kept,
       |    string_agg(chunk, ' ' ORDER BY idx) AS text_dedup
       |  FROM w WHERE rn = 1 GROUP BY doc_id)
       |SELECT tk.doc_id,
       |  CAST(len(tk.t) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_chunks_kept,
       |  coalesce(r.text_dedup, '') AS text_dedup
       |FROM toks tk LEFT JOIN r ON tk.doc_id = r.doc_id
       |ORDER BY tk.doc_id""".stripMargin
  }

  /** Driver face of the incremental path: admit the corpus in two
    * doc_id-ordered halves through [[IncrementalDedup.dedupeBatchChunks]]'s
    * persisted span index in a throwaway store, then union the rebuilt
    * batches. Sequential first-seen-wins over doc_id-ordered batches equals
    * the batch operator's global min-(doc_id, idx) policy, so the oracle is
    * the SAME SQL as `dedup_chunks` — the hash check itself proves the
    * incremental admission is invisible in the result. (Batches must be
    * id-ordered for that equality; an out-of-order drop changes WHICH copy
    * survives — first-seen — while still keeping exactly one, which is the
    * production contract and is spec-pinned separately.) */
  def dedupChunksIncremental(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft_chunk_store_").toString
    try {
      val docs = Tables.documents(spark, dir)
      // empty corpus: max(doc_id) is NULL — the rewrite of nothing is
      // nothing, same as the batch operator (which handles it natively)
      val maxRow = docs.agg(max($"doc_id")).head()
      if (maxRow.isNullAt(0)) return dedupChunks(spark, dir)
      val mid = maxRow.getLong(0) / 2
      val (out1, out2) = Phases.time("admit") {
        (IncrementalDedup.dedupeBatchChunks(
            docs.filter($"doc_id" <= mid), store, ordered = false),
          IncrementalDedup.dedupeBatchChunks(
            docs.filter($"doc_id" > mid), store, ordered = false))
      }
      // checkpoint past the store files — safe to sweep in finally
      Phases.time("serve") {
        out1.unionAll(out2).orderBy($"doc_id").localCheckpoint(true)
      }
    } finally {
      // finally (not success-path-only): a mid-query failure must not
      // leak the throwaway store directory
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store)):
        Unit
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_chunks" -> (dedupChunks _),
    "dedup_chunks_incremental" -> (dedupChunksIncremental _))

  val oracles: Map[String, String] = Map(
    "dedup_chunks" -> dedupChunksSql,
    "dedup_chunks_incremental" -> dedupChunksSql)
}
