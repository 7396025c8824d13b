package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  def dedupChunks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", TextFunctions.wordTokens($"text").as("toks"))
    // the doc's non-overlapping chunk array, re-derivable from any scan:
    // chunk i = tokens [i*W, i*W + W)  (slice is 1-based; `div` because
    // Column./ is double division, and sequence(0, -1) on an empty doc
    // would count DOWN — the empty guard short-circuits both)
    def chunkArr = when(size($"toks") === 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0),
          expr(s"cast((size(toks) + ${ChunkWords - 1}) div $ChunkWords as int) - 1")),
        i => array_join(slice($"toks", i * ChunkWords + 1, lit(ChunkWords)), " ")))
    val chunks = docs
      .filter(size($"toks") > 0)
      .select($"doc_id", posexplode(chunkArr))
      .toDF("doc_id", "idx", "chunk")
      // hash map-side; the window below never sees span text
      .select($"doc_id", $"idx", md5($"chunk").as("ck"))
    val firstOcc = Window.partitionBy($"ck").orderBy($"doc_id", $"idx")
    val keptIdx = chunks
      .withColumn("rn", row_number().over(firstOcc))
      .filter($"rn" === 1)
      .groupBy($"doc_id")
      .agg(collect_set($"idx").as("kept"))
    docs
      .join(keptIdx, Seq("doc_id"), "left")
      .select($"doc_id",
        size($"toks").cast("long").as("n_tokens"),
        coalesce(size($"kept"), lit(0)).cast("long").as("n_chunks_kept"),
        // rebuild in original order from the re-derived chunk array,
        // keeping only first-occurrence positions
        array_join(
          filter(chunkArr, (_, i) => array_contains(
            coalesce($"kept", array().cast("array<int>")), i)),
          " ").as("text_dedup"))
      .orderBy($"doc_id")
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_chunks" -> (dedupChunks _))

  val oracles: Map[String, String] = Map(
    "dedup_chunks" -> dedupChunksSql)
}
