package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    /** Header-level decode is REAL: PNG IHDR and JPEG SOF markers are plain
      * byte layouts (no codec library needed), so actual image payloads get
      * their true dimensions. Full pixel decode / feature extraction would
      * need codecs absent from this container — payloads that are neither
      * PNG nor JPEG fall back to a clearly-marked deterministic STUB deriving
      * metadata from a stable byte hash. */
    def decode(docId: Long, bytes: Array[Byte]): MediaMeta =
      parsePng(bytes).orElse(parseJpeg(bytes)) match {
        case Some((w, h, fmt)) => MediaMeta(docId, bytes.length, w, h, fmt)
        case None => // STUB fallback for non-image payloads
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

    private def u32(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
        ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

    private def u16(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

    /** PNG: 8-byte signature, then the IHDR chunk holds width/height at
      * fixed offsets 16/20 (big-endian). */
    def parsePng(b: Array[Byte]): Option[(Int, Int, String)] =
      if (b.length >= 24 &&
          (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
        Some((u32(b, 16), u32(b, 20), "png"))
      else None

    /** JPEG: scan marker segments from SOI for a start-of-frame (SOF0-15,
      * excluding DHT/DAC/RST) carrying height/width. */
    def parseJpeg(b: Array[Byte]): Option[(Int, Int, String)] = {
      if (b.length < 4 || (b(0) & 0xff) != 0xFF || (b(1) & 0xff) != 0xD8) return None
      var i = 2
      while (i + 9 < b.length && (b(i) & 0xff) == 0xFF) {
        val marker = b(i + 1) & 0xff
        val isSof = marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC
        if (isSof) return Some((u16(b, i + 7), u16(b, i + 5), "jpeg"))
        i += 2 + u16(b, i + 2) // skip the segment (length includes itself)
      }
      None
    }
  }

  /** Batched decode over a binary payload column: documents' text bytes stand
    * in for media blobs. Per-partition iterator pass (setup once per
    * partition, stream records through) — the batch shape a real decoder
    * needs. Oracle-checked since r9 ([[multimodalDecodeSql]] — UTF-8
    * payloads provably always take the stub path, whose FNV metadata is
    * re-derivable); byte lengths are additionally verified by
    * `multimodal_bytes` below. */
  def multimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val payloads = Tables.documents(spark, dir)
      .filter($"text".isNotNull) // a null payload has nothing to decode
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

  object StubResizer {
    /** Aspect-fit resize planning: REAL math (largest scale of (w,h) fitting
      * in (maxW,maxH) without upscaling, aspect preserved) on the REAL
      * header-decoded dims; the pixel resample itself would be codec work and
      * is out of scope here — swapping in a real resampler consumes exactly
      * this plan. */
    def fitWithin(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) = {
      require(w > 0 && h > 0 && maxW > 0 && maxH > 0)
      if (w <= maxW && h <= maxH) (w, h)
      else {
        // integer-only: pick the tighter axis via cross-multiplication
        if (w.toLong * maxH <= h.toLong * maxW) // height is the tighter fit
          (math.max(1, (w.toLong * maxH / h).toInt), maxH)
        else
          (maxW, math.max(1, (h.toLong * maxW / w).toInt))
      }
    }
  }

  /** Fixed-size frame boundaries (stand-in for the frame index a real
    * demuxer yields), keeping every `stride`-th frame — video pipelines'
    * row-expansion shape. Pure byte slicing: no codec needed, fully real. */
  private[graft] def sampleFrames(bytes: Array[Byte], frameSize: Int,
      stride: Int): Iterator[(Int, Array[Byte])] = {
    require(frameSize > 0 && stride > 0)
    Iterator.range(0, bytes.length, frameSize * stride).zipWithIndex.map {
      case (off, k) =>
        (k * stride, java.util.Arrays.copyOfRange(bytes, off,
          math.min(off + frameSize, bytes.length)))
    }
  }

  /** Frame-sampling over binary payloads: 4 KiB frames, every 4th kept, one
    * output row per (doc, sampled frame) before per-doc re-aggregation — the
    * explode-then-reduce plumbing of a video feature pipeline, with the
    * per-partition batching of [[multimodalDecode]]. Oracle-checkable because
    * the sampled-frame count and byte total are integer arithmetic over
    * octet_length. */
  def multimodalFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frameSize = 4096
    val stride = 4
    Tables.documents(spark, dir)
      // null payloads carry no frames — matches the oracle, where the frame
      // range over a NULL length is empty and the doc just drops out
      .filter($"text".isNotNull)
      .select($"doc_id", $"text".cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, bytes) =>
          sampleFrames(bytes, frameSize, stride).map {
            case (idx, fb) => (id, idx, fb)
          }
        }
      }
      .toDF("doc_id", "frame_idx", "frame")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(octet_length($"frame")).as("sampled_bytes"))
      .orderBy($"doc_id")
  }

  // Same frame/stride arithmetic over octet_length: frame i covers bytes
  // [i*4096, min((i+1)*4096, L)); sampled frames are i % 4 == 0.
  val multimodalFramesSql: String =
    """SELECT doc_id, count(*) AS n_frames,
      |  CAST(sum(least(4096, octet_length(CAST(text AS BLOB)) - i * 4096)) AS BIGINT)
      |    AS sampled_bytes
      |FROM documents,
      |  LATERAL (SELECT unnest(range(0,
      |    CAST(ceil(octet_length(CAST(text AS BLOB)) / 4096.0) AS BIGINT))) AS i) f
      |WHERE i % 4 = 0
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** Oracle-checkable slice of the multimodal path: binary payload sizes per
    * source (octet_length of the cast bytes — provably flowing through the
    * binary column, not the string). */
  def multimodalBytes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"source", octet_length($"text".cast("binary")).as("n_bytes"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_bytes").as("total_bytes"),
        max($"n_bytes").cast("long").as("max_bytes"))
      .orderBy($"source")
  }

  val multimodalBytesSql: String =
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
      |  max(octet_length(CAST(text AS BLOB))) AS max_bytes
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** Exact media dedup by content hash — the first dedup pass of any image/
    * audio pipeline (LAION-style): md5 over the RAW payload bytes, no
    * normalization of any kind (media must match octet-for-octet, unlike
    * [[Dedup.dedupExact]]'s whitespace/case-normalized text fingerprint).
    * Flows through the BINARY column: the hash input is `cast(text as
    * binary)` like every multimodal operator here, so swapping in a real
    * media column changes nothing. Per-group payload bytes quantify the
    * dedup saving. Fingerprints-only shuffle — scales like dedup_exact. */
  def multimodalExactDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bytes = $"text".cast("binary")
    Tables.documents(spark, dir)
      .select(md5(bytes).as("fp"), $"doc_id", octet_length(bytes).as("n_bytes"))
      .groupBy($"fp")
      .agg(min($"doc_id").as("keeper_id"), count(lit(1)).as("n_copies"),
        sum($"n_bytes").cast("long").as("total_bytes"))
      .orderBy($"fp")
  }

  // DuckDB md5 only binds VARCHAR, but it hashes the string's UTF-8 bytes —
  // exactly the bytes Spark's md5(cast(text as binary)) sees.
  val multimodalExactDedupSql: String =
    """SELECT md5(text) AS fp, min(doc_id) AS keeper_id, count(*) AS n_copies,
      |  CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes
      |FROM documents
      |GROUP BY 1
      |ORDER BY fp""".stripMargin

  /** 64-bit SimHash over a payload's sliding byte 4-grams: every 4-byte
    * window FNV-hashes to 64 bits, each bit position accumulates ±1 by that
    * bit's value, and the output bit is the accumulator's sign (Charikar's
    * scheme, fed by content-defined byte shingles). A near-identical payload
    * (re-encode, small splice) shares almost all windows — only the O(edit)
    * windows overlapping the change differ — so its hash lands within a few
    * bits; unrelated payloads land ~32 bits apart. Position-chunked or
    * histogram hashes both fail here (the former breaks under a 1-byte
    * shift, the latter can't tell two ASCII documents apart); window-content
    * hashing is the shape real binary near-dup uses. For an image pipeline
    * the input would be the decoder's pixel buffer; the hash math, banding,
    * and join plumbing are the real thing either way. Payloads shorter than
    * one window hash to 0. */
  private[graft] def byteSimHash64(bytes: Array[Byte]): Long = {
    val n = bytes.length
    val counts = new Array[Int](64)
    var i = 0
    while (i + 4 <= n) {
      var h = 0xCBF29CE484222325L // FNV-1a over the 4-byte window
      var k = i
      while (k < i + 4) {
        h ^= (bytes(k) & 0xffL)
        h *= 0x100000001B3L
        k += 1
      }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Near-duplicate media detection: banded Hamming search over the 64-bit
    * [[byteSimHash64]] perceptual hash — the image-dedup step after
    * [[multimodalExactDedup]] catches octet-identical copies (re-encoded /
    * lightly-edited media share a perceptual hash neighborhood, not an md5).
    *
    * Same pigeonhole design as `dedup_simhash`: 4 bands of 16 bits; a pair
    * within Hamming ≤ 3 differs in at most 3 bands, so at least one band
    * matches EXACTLY — candidate recall 1.0 by construction, then the full
    * 64-bit popcount verifies. Hashing is a batched `mapPartitions` pass
    * (the decoder-adjacent shape every multimodal op here uses); the join
    * shuffles only (band-key, doc_id, hash) rows — never payload bytes.
    *
    * Scale guard: only DISTINCT payloads are hashed and banded — one
    * representative (min doc_id) per md5 fingerprint. A 100 TB media corpus
    * carries millions of octet-identical copies ([[multimodalExactDedup]]'s
    * whole reason to exist), and every copy shares every band key, so
    * banding raw doc_ids would make the self-join QUADRATIC in copy count;
    * collapsing to representatives first makes exact copies cost one row
    * each, and their pairs are already owned by the exact-dedup operator.
    * Output pairs relate representatives (equivalently: payload equivalence
    * classes). Oracle-checked since r9 ([[multimodalPhashDedupSql]] —
    * the byte-window FNV re-derived in DuckDB, brute force replacing the
    * pigeonhole-exact banding); the spec additionally pins rep-pairs ≡
    * brute-force Hamming ≤ 3 parity and the no-quadratic-blowup property
    * on an all-copies fixture. */
  def multimodalPhashDedup(spark: SparkSession, dir: String): DataFrame =
    multimodalPhashDedupOn(Tables.documents(spark, dir))

  /** [[multimodalPhashDedup]] over any (doc_id, text) frame — split out for
    * the all-copies fixture spec. */
  def multimodalPhashDedupOn(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    phashBandCandidates(distinctPayloadHashes(documents))
      .select($"doc_a", $"doc_b",
        graft.functions.SimHash.hammingDistance($"ph_a", $"ph_b").as("hamming"))
      .distinct()
      .filter($"hamming" <= 3)
      .orderBy($"doc_a", $"doc_b")
  }

  /** (doc_id, ph) with octet-identical payloads collapsed to their min-id
    * representative — the hashing stage shared by [[multimodalPhashDedupOn]]
    * and the incremental phash index (`IncrementalDedup`), 16 bytes per
    * distinct payload. */
  private[graft] def distinctPayloadHashes(documents: DataFrame): DataFrame = {
    import documents.sparkSession.implicits._
    documents
      .filter($"text".isNotNull)
      .select($"doc_id", $"text".cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // both hashes in ONE payload pass (per-partition decoder setup
        // would precede the loop): the shuffle that follows carries only
        // (fp, doc_id, ph) — payload bytes never leave their scan task
        val md = java.security.MessageDigest.getInstance("MD5")
        batch.map { case (id, bytes) =>
          md.reset()
          val fp = md.digest(bytes).map("%02x".format(_)).mkString
          (fp, id, byteSimHash64(bytes))
        }
      }
      .toDF("fp", "doc_id", "ph")
      .groupBy($"fp") // distinct payloads only: copies collapse to one rep
      .agg(min($"doc_id").as("doc_id"), first($"ph").as("ph"))
      .select($"doc_id", $"ph")
  }

  /** The 4×16-bit band keys of a `ph` column, as an explodable column —
    * ONE definition shared by the pair join and the incremental index's
    * writer and prober, so a keying change cannot strand an existing index
    * silently (keys simply stop matching — the `bandKeys` discipline). */
  private[graft] def phashBandStructs: Column =
    explode(array((0 until 4).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("ph"), b * 16).bitwiseAND(lit(0xFFFFL)).as("key"))
    }: _*))

  /** The band-join candidate stage of [[multimodalPhashDedupOn]] over a
    * (doc_id, ph) frame — split out so CandidateVolumeSpec can pin its
    * volume through the production path. One candidate row per (band, key)
    * agreement; the caller dedups and verifies. */
  private[graft] def phashBandCandidates(hashed: DataFrame): DataFrame = {
    import hashed.sparkSession.implicits._
    val banded = hashed.select($"doc_id", $"ph", phashBandStructs.as("bk"))
      .select($"doc_id", $"ph", $"bk.band".as("band"), $"bk.key".as("key"))
    banded.select($"band", $"key", $"doc_id".as("doc_a"), $"ph".as("ph_a"))
      .join(banded.select($"band", $"key", $"doc_id".as("doc_b"), $"ph".as("ph_b")),
        Seq("band", "key"))
      .filter($"doc_a" < $"doc_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_phash_dedup" -> (multimodalPhashDedup _),
    "multimodal_exact_dedup" -> (multimodalExactDedup _),
    "multimodal_decode" -> (multimodalDecode _),
    "multimodal_bytes" -> (multimodalBytes _),
    "multimodal_frames" -> (multimodalFrames _))

  /** DuckDB twin of [[multimodalDecode]]. Sound because every payload
    * PROVABLY takes the stub path on this corpus: payloads are UTF-8 text
    * bytes, and UTF-8 can never begin with PNG's 0x89 (a continuation
    * byte) or JPEG's 0xFF (not a valid UTF-8 byte at all) — so the real
    * header parsers never fire and the deterministic FNV-derived metadata
    * IS the full semantics to re-derive. A corpus of real image blobs
    * would exercise the header path instead (and the header layouts are
    * plain fixed-offset reads, equally SQL-expressible). */
  val multimodalDecodeSql: String = {
    val fnv =
      """list_reduce(
        |      list_prepend(CAST('14695981039346656037' AS HUGEINT),
        |        [16*(strpos('0123456789ABCDEF', hex(text)[2*i-1])-1) +
        |         strpos('0123456789ABCDEF', hex(text)[2*i])-1
        |         FOR i IN range(1, strlen(text)+1)]),
        |      (h, b) -> ((h - (h % 256) + xor(CAST(h % 256 AS BIGINT), CAST(b AS BIGINT)))
        |                 * 1099511628211) % CAST('18446744073709551616' AS HUGEINT))""".stripMargin
    s"""WITH p AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
       |fnv AS (SELECT doc_id, strlen(text) AS n_bytes, $fnv AS h FROM p),
       |meta AS (SELECT doc_id, n_bytes,
       |  64 + CAST(h % 1024 AS INTEGER) AS width,
       |  64 + CAST((h // 1024) % 1024 AS INTEGER) AS height,
       |  CASE CAST((h // 1048576) % 3 AS INTEGER)
       |    WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format
       |  FROM fnv)
       |SELECT format, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       |  max(width) AS max_width, max(height) AS max_height
       |FROM meta GROUP BY format ORDER BY format""".stripMargin
  }

  /** DuckDB twin of [[multimodalPhashDedup]] — the dedup_simhash oracle
    * pattern transposed to the payload byte stream: the 4-byte sliding
    * window FNV-1a runs as a `list_reduce` over hex-decoded payload bytes
    * in HUGEINT mod-2^64 arithmetic (low-byte xor emulation), the sign
    * accumulation works on hi/lo 32-bit halves, payload-equivalence
    * classes collapse through the same md5 grouping, and brute-force
    * pairing replaces the banding (pigeonhole-exact at hamming ≤ 3). */
  val multimodalPhashDedupSql: String = {
    val h0 = "CAST('14695981039346656037' AS HUGEINT)"
    val mod = "CAST('18446744073709551616' AS HUGEINT)"
    val fnv4 =
      s"""list_reduce(list_prepend($h0, bl[i:i+3]),
         |      (h, b) -> ((h - (h % 256) + xor(CAST(h % 256 AS BIGINT), CAST(b AS BIGINT)))
         |                 * 1099511628211) % $mod)""".stripMargin
    s"""WITH rep AS (
       |  SELECT min(doc_id) AS doc_id, min(text) AS text
       |  FROM documents WHERE text IS NOT NULL
       |  GROUP BY md5(text)
       |),
       |bl AS (
       |  SELECT doc_id,
       |    [16*(strpos('0123456789ABCDEF', hex(text)[2*i-1])-1) +
       |     strpos('0123456789ABCDEF', hex(text)[2*i])-1
       |     FOR i IN range(1, strlen(text)+1)] AS bl
       |  FROM rep
       |),
       |win AS (
       |  SELECT doc_id, unnest([$fnv4 FOR i IN range(1, len(bl)-2)]) AS fnv
       |  FROM bl WHERE len(bl) >= 4
       |),
       |wh AS (
       |  SELECT doc_id,
       |    CAST(fnv // CAST(4294967296 AS HUGEINT) AS BIGINT) AS h_hi,
       |    CAST(fnv % CAST(4294967296 AS HUGEINT) AS BIGINT) AS h_lo
       |  FROM win
       |),
       |bitcnt AS (
       |  SELECT doc_id, bb.bit AS bit,
       |    sum(CASE WHEN ((CASE WHEN bb.bit < 32 THEN h_lo >> bb.bit
       |                    ELSE h_hi >> (bb.bit-32) END) & 1) = 1
       |        THEN 1 ELSE -1 END) AS cnt
       |  FROM wh CROSS JOIN (SELECT unnest(range(0,64)) AS bit) bb
       |  GROUP BY doc_id, bb.bit
       |),
       |ph AS (
       |  SELECT r.doc_id, coalesce(s.hi, 0) AS hi, coalesce(s.lo, 0) AS lo
       |  FROM rep r LEFT JOIN (
       |    SELECT doc_id,
       |      sum(CASE WHEN cnt > 0 AND bit >= 32 THEN (CAST(1 AS BIGINT) << (bit-32)) ELSE 0 END) AS hi,
       |      sum(CASE WHEN cnt > 0 AND bit < 32 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS lo
       |    FROM bitcnt GROUP BY doc_id) s ON r.doc_id = s.doc_id
       |)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS INTEGER) AS hamming
       |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "multimodal_exact_dedup" -> multimodalExactDedupSql,
    "multimodal_bytes" -> multimodalBytesSql,
    "multimodal_frames" -> multimodalFramesSql,
    "multimodal_phash_dedup" -> multimodalPhashDedupSql,
    "multimodal_decode" -> multimodalDecodeSql)
}
