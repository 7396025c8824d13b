package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps — data skipping for plain parquet directories.
  *
  * A zone map is the tiny table of per-file column ranges (`file, count,
  * min_c/max_c per tracked column`) that lets a range query prune whole
  * files BEFORE the scan's file index ever lists them. It is the
  * Delta/Iceberg `add.stats` idea reduced to its engine core: statistics
  * live OUTSIDE the data files, pruning is a metadata operation, and the
  * scan only pays for files that can possibly match.
  *
  * Relationship to what parquet already gives: row-group min/max footers
  * prune AFTER a file is opened — at 100 TB with millions of files, opening
  * footers IS the bottleneck (one S3 GET per file just to discover
  * irrelevance). The zone map answers "which files?" from one small
  * driver-side table. It composes with, not replaces, footer pruning:
  * surviving files still push the residual predicate down to row groups.
  *
  * Effectiveness is a LAYOUT property: ranges prune iff the layout
  * correlates the column with file boundaries ([[Layout.writeClustered]] /
  * z-order). On a random layout every file straddles the predicate and
  * nothing prunes — correctness is unaffected (the spec pins both).
  *
  * Scale discipline: building is ONE distributed scan grouped by
  * `_metadata.file_path` (the stats shuffle is |files|-scale, not
  * row-scale). Pruning collects the zone map to the driver — a BOUNDED
  * collect by construction (one row per file; a lake region with 10^6
  * files collects ~10^6 short rows, the same order as the file listing
  * Spark's own InMemoryFileIndex already drivers through). */
object ZoneMaps {

  /** One distributed pass over `dataPath`: per-file row count + min/max of
    * each tracked column, written (overwrite) to `statsDir`. */
  def build(spark: SparkSession, dataPath: String, cols: Seq[String],
      statsDir: String): Unit = {
    require(cols.nonEmpty, "track at least one column")
    // footer-derived when exact (r13, guide §6) — the build pass otherwise
    // re-reads every tracked column of the whole layout just to recompute
    // numbers the writer left in the footers; scan fallback is unchanged.
    // (The static face predates nnull_c — statsForPaths now records it,
    // which only ADDS information consumers guard on.)
    statsForPaths(spark, Store.liveFiles(dataPath), cols)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(statsDir)
  }

  /** Files whose `[min_c, max_c]` range intersects `[lo, hi)` for EVERY
    * conjunct — the candidate set a conjunction of range predicates must
    * read. NULL bounds (all-null file slice) are kept: the zone map may
    * only ever prune files that provably cannot match. Conjuncts compose
    * multiplicatively on a layout that correlates several columns with
    * file boundaries (z-order): each dimension independently excludes
    * files the other cannot. */
  /** Scan `dataPath` for rows satisfying every `col in [lo, hi)` conjunct,
    * reading ONLY files the zone map cannot exclude. Returns the filtered
    * frame plus (filesRead, filesTotal) for observability — the pair every
    * data-skipping report is built from. The residual predicate is still
    * applied (and still pushes to parquet row groups): surviving files
    * straddle the boundary, so pruning alone is never assumed exact.
    *
    * Metadata cost: ONE read of the tiny stats table decides both the
    * candidate list and the total (the bounded collect from the header).
    * The data directory itself is never listed unless the candidate set is
    * empty (only then is its schema read, to shape the empty result) —
    * avoiding a full file listing is the entire point of the zone map. */
  def scanPrunedAll(spark: SparkSession, dataPath: String, statsDir: String,
      preds: Seq[(String, Column, Column)]): (DataFrame, (Int, Int)) = {
    import spark.implicits._
    require(preds.nonEmpty, "at least one range conjunct")
    val keep = preds
      .map { case (c, lo, hi) =>
        col(s"max_$c").isNull || (col(s"max_$c") >= lo && col(s"min_$c") < hi)
      }
      .reduce(_ && _)
    val flagged = spark.read.parquet(statsDir)
      .select($"file", keep.as("keep")).as[(String, Boolean)]
      .collect() // bounded: one row per data file (see header)
    val total = flagged.length
    val files = flagged.collect { case (f, true) => f }.toSeq
    val pred = preds
      .map { case (c, lo, hi) => col(c) >= lo && col(c) < hi }
      .reduce(_ && _)
    val df =
      if (files.isEmpty)
        // nothing can match: empty frame with the data's schema, no scan
        spark.read.parquet(dataPath).filter(lit(false))
      else
        // a file subset shares the directory's writer schema (zone-mapped
        // layouts are single-writer by construction); the driver-statted
        // read (r13) also skips the re-listing of the candidate paths —
        // a distributed job once the survivor list passes 32 files
        Store.readFiles(spark, files).filter(pred)
    (df, (files.length, total))
  }

  /** Single-conjunct convenience face of [[scanPrunedAll]]. */
  def scanPruned(spark: SparkSession, dataPath: String, statsDir: String,
      trackedCol: String, lo: Column, hi: Column): (DataFrame, (Int, Int)) =
    scanPrunedAll(spark, dataPath, statsDir, Seq((trackedCol, lo, hi)))

  // ── Incremental face: a zone-mapped Store ─────────────────────────────
  //
  // The range-scan sibling of [[BloomIndex]]'s bloom-indexed Store, with
  // the identical admission/heal protocol: each admitted delta carries its
  // per-file min/max stats into a SIBLING stats store under the same
  // idempotency id, lookups treat the map as a conservative ACCELERATOR
  // (a live data file the stats do not cover is read unconditionally —
  // crash window and compaction renames degrade pruning to scanning,
  // never correctness), and maintainIndex heals both directions. The one
  // thing the range face needs that the bloom face does not: the DATA
  // store's maintenance compaction must be order-preserving
  // ([[Store.compact]]'s `clusterBy`) — a round-robin rewrite gives every
  // compacted file the full key range and nothing prunes ever again
  // (spec-pinned both ways in ZoneMapStoreSpec).

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def statsFor(dataFiles: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "track at least one column")
    // nnull_c rides along for [[countRangeIndexed]]'s metadata fast path:
    // a fully-contained file contributes n_rows - nnull_c without being
    // read (min/max ignore nulls, so n_rows alone would overcount). Stats
    // written before this column existed read as NULL through mergeSchema
    // — the fast path treats unknown as "scan the file", never guesses.
    // sum_c (NUMERIC tracked columns only) rides along the same way for
    // [[sumRangeIndexed]]: a contained file contributes its stored sum
    // without being read; pre-sum rows read NULL and fall back to scan.
    val numeric: Set[String] = dataFiles.schema.fields
      .filter(_.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
      .map(_.name).toSet
    def perCol(c: String) =
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
        count(when(col(c).isNull, lit(1))).as(s"nnull_$c")) ++
        (if (numeric(c)) Seq(sum(col(c)).as(s"sum_$c")) else Nil)
    def perColNames(c: String) =
      Seq(col(s"min_$c"), col(s"max_$c"), col(s"nnull_$c")) ++
        (if (numeric(c)) Seq(col(s"sum_$c")) else Nil)
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(perCol)
    dataFiles
      .select(col("_metadata.file_path").as("raw") +: cols.map(col): _*)
      .groupBy(col("raw"))
      .agg(aggs.head, aggs.tail: _*)
      // canonicalize AFTER the agg: the udf runs once per FILE, and the
      // canonical form is what set-compares against DataFrame.inputFiles
      .select(BloomIndex.canonPathUdf(col("raw")).as("file") +:
        (col("n_rows") +: cols.flatMap(perColNames)): _*)
  }

  /** Spec-visible count of [[statsForPaths]] calls answered from footers. */
  private[graft] val footerStatsServed =
    new java.util.concurrent.atomic.AtomicLong

  /** Spark types whose parquet column statistics are EXACT and losslessly
    * reconstructible driver-side. Deliberately excludes: every NumericType
    * (the stats row must also carry `sum_c`, which footers cannot supply),
    * strings/binary (parquet-mr may write TRUNCATED min/max for long
    * values — conservative bounds fine for pruning but [[minMaxRangeIndexed]]
    * SERVES these values as exact answers), and float/double (a footer
    * cannot prove NaN-absence, and parquet drops stats around NaN). What
    * remains — timestamp/timestamp_ntz (INT64 micros; INT96's stats
    * ordering is undefined, which is why the session writers pin
    * outputTimestampType=TIMESTAMP_MICROS) and date (INT32 days) — is
    * exactly the time-clustered-store family. */
  private def footerExact(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType |
           org.apache.spark.sql.types.DateType => true
      case _ => false
    }

  /** Per-file zone stats derived from parquet FOOTERS, driver-side — zero
    * Spark jobs and zero data pages read (r13, guide §6): the scan-based
    * [[statsFor]] re-reads the tracked column of every file it stats, plus
    * one scheduler round trip, to compute numbers the writer already left
    * in the footer (row counts, per-column min/max/null-count). Returns
    * None — caller falls back to the scan — unless EVERY tracked column in
    * EVERY file is footer-exact ([[footerExact]] types, matching physical
    * annotation, complete statistics in every row group); the fallback is
    * also the error path, so a racing compaction surfaces exactly as
    * before. Rows match [[statsFor]]'s output exactly, including the
    * skip-empty-file convention (a 0-row file produces no group there). */
  private def footerStatsFor(spark: SparkSession, files: Seq[String],
      cols: Seq[String]): Option[DataFrame] = try {
    import org.apache.spark.sql.types._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    if (files.isEmpty) return None
    val conf = spark.sessionState.newHadoopConf()
    val rows = Vector.newBuilder[org.apache.spark.sql.Row]
    var sparkTypes: Map[String, DataType] = null
    files.foreach { f =>
      val path = new org.apache.hadoop.fs.Path(f)
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in,
        org.apache.parquet.HadoopReadOptions.builder(conf, path).build())
      try {
        val meta = reader.getFooter.getFileMetaData
        val serialized =
          meta.getKeyValueMetaData.get("org.apache.spark.sql.parquet.row.metadata")
        if (serialized == null) return None // not Spark-written: no exact types
        val sparkSchema = DataType.fromJson(serialized).asInstanceOf[StructType]
        val types = cols.map { c =>
          val field = sparkSchema.find(_.name == c).getOrElse(return None)
          if (!footerExact(field.dataType)) return None
          c -> field.dataType
        }.toMap
        if (sparkTypes == null) sparkTypes = types
        else if (sparkTypes != types) return None // cross-file type drift
        val blocks = reader.getFooter.getBlocks
        val nRows = {
          var n = 0L
          blocks.forEach(b => n += b.getRowCount)
          n
        }
        if (nRows > 0) {
          // per tracked column: fold row-group stats; any incomplete chunk
          // (missing stats, unset null count) disqualifies the whole call
          val perCol: Seq[(Any, Any, Long)] = cols.map { c =>
            val dt = types(c)
            var nulls = 0L
            var minV: java.lang.Long = null
            var maxV: java.lang.Long = null
            blocks.forEach { b =>
              val cc = b.getColumns.asScala
                .find(_.getPath.toDotString == c).getOrElse(return None)
              val pt = cc.getPrimitiveType
              val annotationOk = dt match {
                case TimestampType | TimestampNTZType =>
                  pt.getPrimitiveTypeName == PrimitiveTypeName.INT64 &&
                    (pt.getLogicalTypeAnnotation match {
                      case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                        t.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS &&
                          t.isAdjustedToUTC == (dt == TimestampType)
                      case _ => false
                    })
                case DateType =>
                  pt.getPrimitiveTypeName == PrimitiveTypeName.INT32 &&
                    pt.getLogicalTypeAnnotation
                      .isInstanceOf[LogicalTypeAnnotation.DateLogicalTypeAnnotation]
                case _ => false
              }
              if (!annotationOk) return None
              val st = cc.getStatistics
              if (st == null || !st.isNumNullsSet) return None
              nulls += st.getNumNulls
              if (st.hasNonNullValue) {
                val (lo, hi) = dt match {
                  case TimestampType | TimestampNTZType =>
                    (st.genericGetMin.asInstanceOf[java.lang.Long],
                      st.genericGetMax.asInstanceOf[java.lang.Long])
                  case _ =>
                    (java.lang.Long.valueOf(
                       st.genericGetMin.asInstanceOf[java.lang.Integer].longValue),
                      java.lang.Long.valueOf(
                        st.genericGetMax.asInstanceOf[java.lang.Integer].longValue))
                }
                if (minV == null || lo < minV) minV = lo
                if (maxV == null || hi > maxV) maxV = hi
              }
            }
            // all-null must be PROVEN by the counts, never inferred from
            // absent values (a chunk with values but no stats fell out above)
            if (minV == null && nulls != nRows) return None
            val toExternal: java.lang.Long => Any = types(c) match {
              case TimestampType => micros =>
                java.time.Instant.ofEpochSecond(
                  Math.floorDiv(micros.longValue, 1000000L),
                  Math.floorMod(micros.longValue, 1000000L) * 1000L)
              case TimestampNTZType => micros =>
                java.time.LocalDateTime.ofEpochSecond(
                  Math.floorDiv(micros.longValue, 1000000L),
                  (Math.floorMod(micros.longValue, 1000000L) * 1000L).toInt,
                  java.time.ZoneOffset.UTC)
              case _ => days => java.time.LocalDate.ofEpochDay(days.longValue)
            }
            (if (minV == null) null else toExternal(minV),
              if (maxV == null) null else toExternal(maxV), nulls)
          }
          rows += org.apache.spark.sql.Row.fromSeq(
            BloomIndex.canonPath(f) +: nRows +:
              perCol.flatMap { case (lo, hi, nn) => Seq(lo, hi, nn) })
        }
      } finally reader.close()
    }
    if (sparkTypes == null) return None // every file empty: let the scan shape it
    val schema = StructType(
      StructField("file", StringType, nullable = false) +:
        StructField("n_rows", LongType, nullable = false) +:
        cols.flatMap(c => Seq(
          StructField(s"min_$c", sparkTypes(c)),
          StructField(s"max_$c", sparkTypes(c)),
          StructField(s"nnull_$c", LongType, nullable = false))))
    footerStatsServed.incrementAndGet(): Unit
    Some(spark.createDataFrame(
      java.util.Arrays.asList(rows.result(): _*), schema))
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Stats for an explicit file list: footer-derived when exact
    * ([[footerStatsFor]]), else the one-pass scan aggregate. */
  private[graft] def statsForPaths(spark: SparkSession, files: Seq[String],
      cols: Seq[String]): DataFrame =
    footerStatsFor(spark, files, cols).getOrElse(
      statsFor(Store.readFiles(spark, files), cols))

  // ── Serve cache: driver-resident zone stats ────────────────────────────
  //
  // The bloom serve cache's sibling, same protocol (content-version keyed,
  // byte-budgeted, staleness degrades to scanning because live files are
  // listed fresh per query and uncovered files are read unconditionally),
  // different representation: zone stats rows are ~100 B of PLAIN VALUES
  // per file — no filters to deserialize — so the cache holds the
  // COLLECTED ROWS and serves them back as a LOCAL DataFrame. Every
  // decision predicate (intersects/contained/provablyEmpty, with their
  // type-aware comparisons over timestamps/decimals/strings) then runs
  // through the SAME Column expressions as the distributed path —
  // Catalyst folds Project/Filter over a LocalRelation at optimization
  // time — instead of a re-implemented driver-side comparison that could
  // silently diverge. What the cache removes is the per-query parquet
  // read of the stats store, not the semantics.

  private final case class StatsEntry(version: String,
      schema: org.apache.spark.sql.types.StructType,
      rows: java.util.List[org.apache.spark.sql.Row])
  private val statsCache =
    new java.util.concurrent.ConcurrentHashMap[String, StatsEntry]()

  /** Driver-side budget for cached zone stats, per stats store. */
  @volatile private[graft] var statsCacheMaxBytes: Long =
    sys.env.get("GRAFT_ZONE_CACHE_MAX_BYTES").map(_.toLong)
      .getOrElse(256L << 20)

  private def cacheKey(statsDir: String): String =
    new java.io.File(statsDir).getAbsolutePath

  private[graft] def invalidateStatsCache(statsDir: String): Unit =
    statsCache.remove(cacheKey(statsDir)): Unit

  private def diskBytes(f: java.io.File): Long =
    if (f.isFile) f.length()
    else {
      val kids = f.listFiles()
      if (kids == null) 0L else kids.iterator.map(diskBytes).sum
    }

  /** The stats table as a DataFrame — served from the driver cache when
    * the store's content version matches (refreshing once when it
    * drifts), falling back to the parquet read when over budget. Both
    * branches feed the identical decision expressions downstream. */
  private def statsTable(spark: SparkSession, statsDir: String): DataFrame = {
    val key = cacheKey(statsDir)
    val ver = BloomIndex.contentVersion(statsDir)
    val hit = statsCache.get(key)
    if (hit != null && hit.version == ver)
      return spark.createDataFrame(hit.rows, hit.schema)
    if (diskBytes(new java.io.File(statsDir)) > statsCacheMaxBytes) {
      statsCache.remove(key)
      return Store.readFiles(spark, Store.liveFiles(statsDir))
    }
    // liveFiles + readFiles: the refresh pays ONE collect job (Store.read's
    // mergeSchema option would add a distributed footer-merge job first)
    val df = Store.readFiles(spark, Store.liveFiles(statsDir))
    val rows = java.util.Arrays.asList(df.collect(): _*)
    statsCache.put(key, StatsEntry(ver, df.schema, rows)): Unit
    spark.createDataFrame(rows, df.schema)
  }

  /** Admit `df` into the data Store AND its per-file ranges into the
    * sibling stats Store, both under the same idempotency id (the
    * [[BloomIndex.admitIndexed]] protocol — replays no-op on both sides,
    * a replay that finds data admitted but stats missing heals the
    * stats). For the ranges to PRUNE, shape the batch before admitting
    * (`repartitionByRange` + `sortWithinPartitions` on the tracked
    * columns); an unshaped admit is merely unprunable, never wrong.
    * Returns whether this call admitted the data batch. */
  def admitIndexed(df: DataFrame, dataDir: String, statsDir: String,
      cols: Seq[String], id: String): Boolean = {
    val spark = df.sparkSession
    val admitted = Store.appendIdempotent(df, dataDir, id)
    val delta = new java.io.File(dataDir, s"delta-$id")
    if (delta.exists()) {
      try {
        // delta files listed driver-side; stats come from their footers
        // when exact (statsForPaths), else one scan of the tracked columns
        val deltaFiles = Store.liveFiles(delta.toString)
        if (deltaFiles.isEmpty)
          log.warn(s"zone stats for delta-$id skipped (delta compacted " +
            "away mid-admission; maintainIndex heals)")
        else {
          val stats = statsForPaths(spark, deltaFiles, cols)
            .coalesce(1) // |delta files| short rows
          Store.appendIdempotent(stats, statsDir, s"zm-$id"): Unit
        }
      } catch {
        // same tolerance contract as the bloom face: a path-shaped
        // failure is the delta-vs-compaction listing race (heal covers
        // the renamed file); other analysis errors are deterministic
        // misconfiguration and must surface
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage != null && (
              e.getMessage.contains("PATH_NOT_FOUND") ||
              e.getMessage.contains("Path does not exist")) =>
          log.warn(s"zone stats for delta-$id skipped (delta compacted " +
            s"away mid-admission; maintainIndex heals): ${e.getMessage}")
        case e: org.apache.spark.sql.AnalysisException => throw e
        case scala.util.control.NonFatal(e) =>
          log.warn(s"zone stats for delta-$id skipped (data admitted; " +
            s"file stays uncovered until maintainIndex heals)", e)
      }
      invalidateStatsCache(statsDir)
    }
    admitted
  }

  /** Range scan over a zone-mapped Store. Decision per LIVE data file,
    * DISTRIBUTED-side: covered by stats → its ranges decide (NULL bounds
    * keep — an all-null slice may only be pruned by a provable
    * non-match); uncovered (left-join miss: crash window, compaction
    * rename) → read unconditionally, which the same NULL-keeps predicate
    * expresses for free. Stale stats rows for dead files fall out of the
    * join. Only the files-to-READ come back to the driver. Returns the
    * filtered frame plus (filesRead, filesTotal). */
  def lookupRangeIndexed(spark: SparkSession, dataDir: String,
      statsDir: String, preds: Seq[(String, Column, Column)])
      : (DataFrame, (Int, Int)) = {
    import spark.implicits._
    require(preds.nonEmpty, "at least one range conjunct")
    // driver-side listing (no schema-merge job per probe — the
    // BloomIndex.lookupIndexedMulti rationale)
    val live = Store.liveFiles(dataDir).toSet
    val files: Seq[String] =
      if (!Store.hasData(statsDir)) live.toSeq.sorted
      else {
        val keep = preds
          .map { case (c, lo, hi) =>
            col(s"max_$c").isNull || (col(s"max_$c") >= lo && col(s"min_$c") < hi)
          }
          .reduce(_ && _)
        val liveDf = live.toSeq.toDF("file")
        liveDf.join(statsTable(spark, statsDir), Seq("file"), "left_outer")
          .filter(keep)
          .select(col("file")).distinct()
          .as[String].collect().toSeq.sorted
      }
    val pred = preds
      .map { case (c, lo, hi) => col(c) >= lo && col(c) < hi }
      .reduce(_ && _)
    val df =
      if (files.isEmpty) Store.readBounded(spark, dataDir).filter(lit(false))
      else Store.readFiles(spark, files).filter(pred)
    (df, (files.length, live.size))
  }

  /** COUNT(*) over a range conjunction, answered from METADATA wherever
    * possible: a covered file whose tracked ranges lie FULLY inside every
    * conjunct contributes `n_rows - nulls` without being read (nulls are
    * outside any range but inside n_rows — single-conjunct probes
    * subtract the tracked column's null count; multi-conjunct fast-paths
    * only null-free files, since per-column null counts cannot bound
    * rows-with-any-null); only BOUNDARY-straddling files (plus uncovered
    * live files and files whose stats predate the null-count column) are
    * scanned. The aggregate-pushdown-to-metadata idea: "how many events
    * in Q1" on a time-clustered store reads ~2 boundary files however
    * large the interior is. Returns (count, (filesScanned, filesTotal)).
    * Decision pass is ONE distributed job over the stats x live join;
    * duplicate stats rows (heal racing an admit) are dropped before the
    * sum — zone stats for a file are deterministic, so any copy is
    * correct. */
  def countRangeIndexed(spark: SparkSession, dataDir: String,
      statsDir: String, preds: Seq[(String, Column, Column)])
      : (Long, (Int, Int)) = {
    import spark.implicits._
    require(preds.nonEmpty, "at least one range conjunct")
    val live = Store.liveFiles(dataDir).toSet
    val pred = preds
      .map { case (c, lo, hi) => col(c) >= lo && col(c) < hi }
      .reduce(_ && _)
    def scanCount(files: Seq[String]): Long =
      if (files.isEmpty) 0L
      else Store.readFiles(spark, files).filter(pred).count()
    if (!Store.hasData(statsDir))
      return (scanCount(live.toSeq.sorted), (live.size, live.size))
    val intersects = preds
      .map { case (c, lo, hi) =>
        col(s"max_$c").isNull || (col(s"max_$c") >= lo && col(s"min_$c") < hi)
      }
      .reduce(_ && _)
    val containedBounds = preds
      .map { case (c, lo, hi) =>
        col(s"min_$c").isNotNull && col(s"min_$c") >= lo &&
          col(s"max_$c").isNotNull && col(s"max_$c") < hi
      }
      .reduce(_ && _)
    val (contained, contribution) =
      if (preds.size == 1) {
        val c = preds.head._1
        (containedBounds && col(s"nnull_$c").isNotNull,
          col("n_rows") - col(s"nnull_$c"))
      } else {
        // null-SAFE: a stats row whose nnull_c is NULL (pre-nnull rows read
        // through mergeSchema, or stats from the static build) must make
        // `contained` FALSE, never NULL — a NULL contained fails BOTH the
        // metadata branch and the `!contained` scan branch below, silently
        // dropping the file from the count (the statsFor contract is
        // "unknown null counts mean scan the file, never guess")
        val nullFree = preds
          .map { case (c, _, _) => coalesce(col(s"nnull_$c") === 0L, lit(false)) }
          .reduce(_ && _)
        (containedBounds && nullFree, col("n_rows").cast("long"))
      }
    // a file ALL of whose values are null in some tracked conjunct column
    // (nnull == n_rows) provably matches no row: zero contribution, no
    // scan — without this, an all-null slice has NULL min/max bounds and
    // would be scanned forever by the conservative intersects test
    val provablyEmpty = preds
      .map { case (c, _, _) =>
        col(s"nnull_$c").isNotNull && col(s"nnull_$c") === col("n_rows")
      }
      .reduce(_ || _)
    val liveDf = live.toSeq.toDF("file")
    val row = liveDf
      .join(statsTable(spark, statsDir), Seq("file"), "left_outer")
      .dropDuplicates("file")
      .agg(
        sum(when(contained && !provablyEmpty, contribution)).as("meta"),
        collect_list(when(intersects && !contained && !provablyEmpty,
          col("file"))).as("scan"))
      .head()
    val meta = if (row.isNullAt(0)) 0L else row.getLong(0)
    val scanFiles = row.getSeq[String](1).sorted
    (meta + scanCount(scanFiles), (scanFiles.length, live.size))
  }

  /** MIN/MAX over a range conjunction, answered from METADATA wherever
    * possible — the sibling of [[countRangeIndexed]] (round-11 verdict
    * missing-item #4): a covered file whose tracked ranges lie FULLY
    * inside every conjunct AND whose predicate columns are null-free
    * contributes its stored `min_t`/`max_t` without being read; only
    * boundary-straddling files, uncovered live files, and files whose
    * stats predate the null-count column are scanned.
    *
    * Null discipline, stated exactly: a row with a NULL in a PREDICATE
    * column matches no conjunct, but the file-level `min_t`/`max_t`
    * still include that row's target value — so (unlike COUNT's
    * single-conjunct subtraction) the metadata fast path requires
    * null-free predicate columns in every case, and unknown null counts
    * (mergeSchema NULLs) mean "scan the file, never guess"
    * (null-safe via coalesce, the countRangeIndexed fix). NULL
    * `min_t`/`max_t` (an all-null target slice) contribute nothing —
    * exactly MIN/MAX's null semantics.
    *
    * Returns a 1-row frame `(min_<target>, max_<target>)` (NULLs when no
    * row matches) plus (filesScanned, filesTotal). The decision runs over
    * the stats x live join (|files|-scale, touched twice: once to pick
    * the scan set, once lazily inside the final combine); duplicate stats
    * rows are dropped first (deterministic stats — any copy is correct). */
  def minMaxRangeIndexed(spark: SparkSession, dataDir: String,
      statsDir: String, preds: Seq[(String, Column, Column)],
      targetCol: String): (DataFrame, (Int, Int)) = {
    import spark.implicits._
    require(preds.nonEmpty, "at least one range conjunct")
    val live = Store.liveFiles(dataDir).toSet
    val pred = preds
      .map { case (c, lo, hi) => col(c) >= lo && col(c) < hi }
      .reduce(_ && _)
    val (minName, maxName) = (s"min_$targetCol", s"max_$targetCol")
    def scanned(files: Seq[String]): DataFrame =
      if (files.isEmpty)
        Store.readBounded(spark, dataDir).filter(lit(false))
          .agg(min(col(targetCol)).as(minName), max(col(targetCol)).as(maxName))
      else Store.readFiles(spark, files).filter(pred)
        .agg(min(col(targetCol)).as(minName), max(col(targetCol)).as(maxName))
    if (!Store.hasData(statsDir))
      return (scanned(live.toSeq.sorted).localCheckpoint(true),
        (live.size, live.size))
    val stats = statsTable(spark, statsDir)
    require(stats.columns.contains(minName) && stats.columns.contains(maxName),
      s"zone stats at $statsDir do not track '$targetCol' — " +
        s"admit/heal with it in `cols` to serve MIN/MAX from metadata")
    val intersects = preds
      .map { case (c, lo, hi) =>
        col(s"max_$c").isNull || (col(s"max_$c") >= lo && col(s"min_$c") < hi)
      }
      .reduce(_ && _)
    val contained = preds
      .map { case (c, lo, hi) =>
        col(s"min_$c").isNotNull && col(s"min_$c") >= lo &&
          col(s"max_$c").isNotNull && col(s"max_$c") < hi &&
          coalesce(col(s"nnull_$c") === 0L, lit(false))
      }
      .reduce(_ && _) &&
      // target-tracking proof: a stats row admitted before `targetCol`
      // was in `cols` reads min_/max_/nnull_<target> as NULL through
      // mergeSchema — min/max would silently IGNORE its NULLs and drop
      // the file's rows from the answer. Require the row to prove it
      // tracked the target (nnull is written for every tracked column,
      // even an all-null slice, which then correctly contributes
      // nothing); an untracked row falls through to the scan branch via
      // `intersects && !contained`.
      col(s"nnull_$targetCol").isNotNull
    val provablyEmpty = preds
      .map { case (c, _, _) =>
        col(s"nnull_$c").isNotNull && col(s"nnull_$c") === col("n_rows")
      }
      .reduce(_ || _)
    val liveDf = live.toSeq.toDF("file")
    val joined = liveDf
      .join(stats, Seq("file"), "left_outer")
      .dropDuplicates("file")
    val scanFiles = joined
      .agg(collect_list(when(intersects && !contained && !provablyEmpty,
        col("file"))))
      .as[Seq[String]].head().sorted
    // metadata candidates stay a LAZY 1-row frame so the final combine is
    // type-generic (timestamps, decimals, strings all compose through the
    // same min/max) — the stats table is |files|-scale, touched twice
    val metaDf = joined
      .agg(min(when(contained && !provablyEmpty, col(minName))).as(minName),
        max(when(contained && !provablyEmpty, col(maxName))).as(maxName))
    val out = metaDf.unionByName(scanned(scanFiles))
      .agg(min(col(minName)).as(minName), max(col(maxName)).as(maxName))
    (out.localCheckpoint(true), (scanFiles.length, live.size))
  }

  /** SUM + COUNT pushdown to zone metadata — the additive sibling of
    * [[countRangeIndexed]]/[[minMaxRangeIndexed]], completing the
    * aggregate-pushdown family: a covered file fully contained in every
    * range conjunct (null-free on the predicate columns) contributes its
    * stored per-file `sum_<target>` and non-null count (`n_rows -
    * nnull_<target>`) WITHOUT being read; only boundary-straddling,
    * uncovered, and pre-sum-upgrade files are scanned. Returns a lazy
    * 1-row frame `(sum_<target>, cnt_<target>)` — AVG composes as
    * sum/cnt — plus (filesScanned, filesTotal).
    *
    * Metadata eligibility must be PROVEN per row, never guessed: the row
    * carries a non-NULL `sum_<target>`, or it is tracked-and-all-null
    * (`nnull_<target> == n_rows` — a correct zero contribution). A
    * pre-sum-upgrade row (NULL sum through mergeSchema) with live values
    * fails both and falls through to the scan branch; a store whose
    * merged stats schema lacks the target columns entirely serves
    * nothing from metadata but still prunes non-intersecting files.
    *
    * Exactness: integer-typed (and integer-valued double) columns sum
    * exactly in any addition order; true floating-point columns carry
    * the same order-dependence as any distributed sum. */
  def sumRangeIndexed(spark: SparkSession, dataDir: String,
      statsDir: String, preds: Seq[(String, Column, Column)],
      targetCol: String): (DataFrame, (Int, Int)) = {
    import spark.implicits._
    require(preds.nonEmpty, "at least one range conjunct")
    val live = Store.liveFiles(dataDir).toSet
    val pred = preds
      .map { case (c, lo, hi) => col(c) >= lo && col(c) < hi }
      .reduce(_ && _)
    val (sumName, cntName) = (s"sum_$targetCol", s"cnt_$targetCol")
    def scanned(files: Seq[String]): DataFrame =
      if (files.isEmpty)
        Store.readBounded(spark, dataDir).filter(lit(false))
          .agg(sum(col(targetCol)).as(sumName),
            count(col(targetCol)).as(cntName))
      else Store.readFiles(spark, files).filter(pred)
        .agg(sum(col(targetCol)).as(sumName),
          count(col(targetCol)).as(cntName))
    if (!Store.hasData(statsDir))
      return (scanned(live.toSeq.sorted).localCheckpoint(true),
        (live.size, live.size))
    val stats = statsTable(spark, statsDir)
    // a stats column absent from the MERGED schema reads as literal NULL:
    // every eligibility test below is NULL-false, so an untracked target
    // degrades to scanning (still range-pruned), never to a wrong sum
    def sc(n: String): Column =
      if (stats.columns.contains(n)) col(n) else lit(null)
    val intersects = preds
      .map { case (c, lo, hi) =>
        col(s"max_$c").isNull || (col(s"max_$c") >= lo && col(s"min_$c") < hi)
      }
      .reduce(_ && _)
    val sumProof =
      sc(sumName).isNotNull ||
        coalesce(sc(s"nnull_$targetCol") === col("n_rows"), lit(false))
    val contained = preds
      .map { case (c, lo, hi) =>
        col(s"min_$c").isNotNull && col(s"min_$c") >= lo &&
          col(s"max_$c").isNotNull && col(s"max_$c") < hi &&
          coalesce(col(s"nnull_$c") === 0L, lit(false))
      }
      .reduce(_ && _) && sumProof
    val provablyEmpty = preds
      .map { case (c, _, _) =>
        col(s"nnull_$c").isNotNull && col(s"nnull_$c") === col("n_rows")
      }
      .reduce(_ || _)
    val liveDf = live.toSeq.toDF("file")
    val joined = liveDf
      .join(stats, Seq("file"), "left_outer")
      .dropDuplicates("file")
    val scanFiles = joined
      .agg(collect_list(when(intersects && !contained && !provablyEmpty,
        col("file"))))
      .as[Seq[String]].head().sorted
    // the scan leg's sum type anchors the result type: an untracked
    // target's metadata leg sums a literal NULL (NullType -> double) and
    // would otherwise coerce the whole union away from the data's type
    val scanDf = scanned(scanFiles)
    val sumType = scanDf.schema(sumName).dataType
    val metaDf = joined
      .agg(sum(when(contained && !provablyEmpty, sc(sumName)))
          .cast(sumType).as(sumName),
        sum(when(contained && !provablyEmpty,
          col("n_rows") - sc(s"nnull_$targetCol"))).cast("long").as(cntName))
    val out = metaDf.unionByName(scanDf)
      .agg(sum(col(sumName)).cast(sumType).as(sumName),
        coalesce(sum(col(cntName)), lit(0L)).as(cntName))
    (out.localCheckpoint(true), (scanFiles.length, live.size))
  }

  /** Streaming face: the SAME admission as [[admitIndexed]], as a
    * foreachBatch sink with idempotent per-micro-batch ids — the
    * [[BloomIndex.streamingAdmission]] shape. */
  def streamingAdmission(rows: DataFrame, dataDir: String, statsDir: String,
      cols: Seq[String])
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    rows.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitIndexed(batch, dataDir, statsDir, cols, s"zm$batchId"): Unit
      }

  /** Admit-count-triggered maintenance for a zone-mapped Store: once
    * `every` deltas have committed, compact the data store — ORDER-
    * PRESERVING on the tracked columns BY DEFAULT (`clusterBy = cols`),
    * because a range-serving store that bin-packs loses its pruning —
    * then heal the index immediately. Call after each [[admitIndexed]];
    * pass `zOrder = true` when 2+ tracked dimensions should all keep
    * narrow per-file ranges. */
  def maintainIndexed(spark: SparkSession, dataDir: String, statsDir: String,
      cols: Seq[String], every: Int = 16, numFiles: Int = 8,
      clusterBy: Option[Seq[String]] = None, // None → cols; Some(Nil) → bin-pack
      zOrder: Boolean = false,
      minFileBytes: Long = 0L): Unit =
    if (every > 0 && Store.deltaCount(dataDir) >= every) {
      // minFileBytes > 0: selective fold — kept files keep their names so
      // their zone stats stay valid; the folded output is range-clustered
      // on its own slice (kept files keep their narrow ranges, new files
      // get theirs — overlap across the two generations only widens the
      // boundary set, it never breaks the conservative pruning contract)
      if (minFileBytes > 0)
        Store.compactSelective(spark, dataDir, minFileBytes,
          clusterBy = clusterBy.getOrElse(cols), zOrder = zOrder): Unit
      else Store.compact(spark, dataDir, numFiles, identity,
        clusterBy.getOrElse(cols), zOrder)
      maintainIndex(spark, dataDir, statsDir, cols)
    }

  /** Heal the index: build ranges for live-but-uncovered data files (one
    * pass over just those files) and compact the stats store down to rows
    * whose file still exists. Run after [[Store.compact]] on the data
    * store — pass that compaction `clusterBy` on the tracked columns or
    * the healed ranges will all straddle everything (correct, unpruned).
    * The stats rewrite is size-targeted, never a hardcoded single task. */
  def maintainIndex(spark: SparkSession, dataDir: String, statsDir: String,
      cols: Seq[String]): Unit = {
    import spark.implicits._
    // driver-side listing (r13): Store.read(...).inputFiles paid a
    // distributed footer-merge job just to learn the live file NAMES
    val live = Store.liveFiles(dataDir).toSet
    val covered: Set[String] =
      if (Store.hasData(statsDir))
        Store.readFiles(spark, Store.liveFiles(statsDir))
          .select($"file").as[String].collect().toSet
      else Set.empty
    val missing = (live -- covered).toSeq.sorted
    if (missing.nonEmpty)
      Store.append(
        statsForPaths(spark, missing, cols).coalesce(1),
        statsDir)
    // rewrite only when there is something to clean (stale rows for dead
    // files, or enough heal deltas accreted) — the BloomIndex.maintainIndex
    // rationale; stale rows are dropped by the per-lookup live join either
    // way, so a skipped hygiene pass is result-invisible
    val dead = covered -- live
    if (Store.hasData(statsDir) &&
        (dead.nonEmpty || Store.deltaCount(statsDir) >= 8)) {
      // live listing recomputed INSIDE the rewrite, at image time — the
      // same no-lost-stats reasoning as BloomIndex.maintainIndex
      Store.compactToFileSize(spark, statsDir, targetBytes = 64L << 20,
        rewrite = { stats =>
          val liveNow = Store.liveFiles(dataDir).toDF("file")
          stats.join(broadcast(liveNow), Seq("file"), "left_semi")
        }): Unit
    }
    invalidateStatsCache(statsDir)
  }
}
