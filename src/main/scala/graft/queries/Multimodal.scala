package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted in batched partition passes.
  *
  * The Spark-side shape is the real thing — binary column, schema, batched
  * `mapPartitions` (the Scala analog of `mapInPandas`: one iterator pass per
  * partition, amortizing per-batch decoder setup), deterministic output
  * schema. The decode itself is a clearly-marked STUB (no image/audio libs in
  * this container): a deterministic fake that derives metadata from the
  * bytes, so tests are reproducible and the plumbing is honestly exercised.
  * Swapping in a real JNI/FFmpeg decoder changes only [[StubDecoder.decode]].
  */
object Multimodal {

  /** Decoded media metadata (what a real image decoder would yield). */
  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
      format: String)

  object StubDecoder {
    /** STUB: deterministic fake decode. A real implementation would parse
      * image headers / run a decoder over `bytes`; here metadata is derived
      * from a stable byte hash so the pipeline is testable without codecs. */
    def decode(docId: Long, bytes: Array[Byte]): MediaMeta = {
      val h = graft.functions.SimHash64Util.fnv1a64(bytes)
      val width = 64 + math.floorMod(h, 1024L).toInt
      val height = 64 + math.floorMod(h >>> 10, 1024L).toInt
      val format = (math.floorMod(h >>> 20, 3L).toInt: @unchecked) match {
        case 0 => "png"
        case 1 => "jpeg"
        case 2 => "webp"
      }
      MediaMeta(docId, bytes.length, width, height, format)
    }
  }

  /** Batched decode over a binary payload column: documents' text bytes stand
    * in for media blobs. Per-partition iterator pass (setup once per
    * partition, stream records through) — the batch shape a real decoder
    * needs. Rows-only driver check (fake w/h aren't ANSI SQL); the byte
    * lengths inside are verified by `multimodal_bytes` below. */
  def multimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val payloads = Tables.documents(spark, dir)
      .select($"doc_id", $"text".cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    payloads.mapPartitions { batch =>
      // per-partition decoder setup would go here (native handles, etc.)
      batch.map { case (id, bytes) => StubDecoder.decode(id, bytes) }
    }.toDF()
      .groupBy($"format")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_bytes").as("total_bytes"),
        max($"width").as("max_width"),
        max($"height").as("max_height"))
      .orderBy($"format")
  }

  /** Oracle-checkable slice of the multimodal path: binary payload sizes per
    * source (octet_length of the cast bytes — provably flowing through the
    * binary column, not the string). */
  def multimodalBytes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"source", octet_length($"text".cast("binary")).as("n_bytes"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_bytes").as("total_bytes"),
        max($"n_bytes").as("max_bytes"))
      .orderBy($"source")
  }

  val multimodalBytesSql: String =
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
      |  max(octet_length(CAST(text AS BLOB))) AS max_bytes
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_decode" -> (multimodalDecode _),
    "multimodal_bytes" -> (multimodalBytes _))

  val oracles: Map[String, String] = Map(
    "multimodal_bytes" -> multimodalBytesSql)
}
