package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Write-path layout optimization — the other half of scan pruning.
  *
  * Reading 100 TB efficiently starts when the table is WRITTEN: parquet
  * footers carry per-column min/max stats per file (and row group), and the
  * reader skips files whose range can't match a pushed predicate — but only
  * if the writer clustered rows so those ranges are narrow. An append of
  * randomly-ordered rows gives every file the full value range and no scan
  * ever prunes.
  *
  * [[writeClustered]] = `repartitionByRange` on the cluster columns (range
  * shuffle via sampled bounds, so files hold disjoint slices), then
  * `sortWithinPartitions` (narrow row-group ranges inside each file), then a
  * `maxRecordsPerFile` cap (bounds file size regardless of skew in the
  * sampled ranges). Equal keys land in one partition, so point predicates
  * touch exactly one file.
  */
object Layout {

  /** Write `df` to `path` as parquet clustered on `clusterCols`:
    * `numFiles` range slices, rows sorted within each, at most
    * `maxRecordsPerFile` rows per physical file (0 = unlimited). */
  def writeClustered(df: DataFrame, path: String, clusterCols: Seq[String],
      numFiles: Int, maxRecordsPerFile: Long = 0L): Unit = {
    require(clusterCols.nonEmpty && numFiles > 0)
    val cols = clusterCols.map(col)
    df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }

  /** Hive-layout partitioned write: `partitionCols` become directory keys
    * (`path/col=value/…`) — the coarse-grained sibling of [[writeClustered]]'s
    * file-level clustering, and the layout that makes partition-key predicates
    * free at 100 TB. Directory partitioning enables BOTH pruning modes:
    * static (a literal filter on the key never even lists non-matching
    * directories) and DYNAMIC partition pruning (a join against a filtered
    * dimension prunes fact partitions at runtime from the broadcast dim
    * values — Catalyst's PlanDynamicPruningFilters; pinned by the layout
    * spec). Rows are pre-shuffled on the partition keys so each task writes
    * one directory's files — without that, every task holds an open writer
    * per partition value it encounters, the classic small-files/OOM failure
    * of dynamic writes. Pick keys of bounded cardinality (dates, sources):
    * directories are metadata, and millions of them move the bottleneck to
    * listing. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      maxRecordsPerFile: Long = 0L): Unit = {
    require(partitionCols.nonEmpty)
    df.repartition(partitionCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Morton bit-spread: the low `bits` bits of `v` spaced to every `stride`-th
    * bit position (bit i → bit i·stride). Composed entirely from builtin
    * shift/mask functions so the whole z-value stays inside whole-stage
    * codegen — no UDF, no custom expression needed. For stride 2 the classic
    * four-step magic-mask ladder applies; other strides use the generic
    * per-bit fold (bits·4 expression nodes, still codegen'd). */
  private def spreadBits(v: Column, stride: Int, bits: Int): Column = {
    val masked = v.bitwiseAND(lit((1L << bits) - 1))
    if (stride == 1) masked
    else if (stride == 2 && bits == 16) {
      val m = Seq(0x00FF00FFL, 0x0F0F0F0FL, 0x33333333L, 0x55555555L)
      val s = Seq(8, 4, 2, 1)
      m.zip(s).foldLeft(masked) { case (x, (mask, shift)) =>
        (x.bitwiseOR(shiftleft(x, shift))).bitwiseAND(lit(mask))
      }
    } else (0 until bits).map { i =>
      shiftleft(shiftright(masked, i).bitwiseAND(lit(1L)), i * stride)
    }.reduce(_ bitwiseOR _)
  }

  /** Bits per dimension for a k-column z-value: 16 where it fits, else an
    * even split of the 63 usable long bits (e.g. 3 cols → 16, 4 cols → 15). */
  private def bitsPerDim(k: Int): Int = math.min(16, 63 / k)

  /** Z-order (Morton) value over 2+ numeric columns: each value is mapped to
    * a bucket of its [min,max] range ([[bitsPerDim]] bits), buckets are
    * bit-interleaved — column i owns bit positions ≡ i (mod k), so any
    * column count interleaves without collisions. Rows close in z are close
    * in EVERY clustered dimension, which is what makes multi-column data
    * skipping work (a linear sort gives narrow file ranges only on its
    * leading column). NULLs map to bucket 0 (the low corner — explicit, not
    * an artifact of null-skipping comparisons). Uniform buckets via
    * width_bucket — for heavily skewed columns substitute
    * approxQuantile-derived boundaries; the interleave is unchanged. */
  def zValue(colsWithRange: Seq[(Column, Double, Double)]): Column = {
    val k = colsWithRange.size
    require(k >= 2, "z-order needs at least 2 columns")
    val bits = bitsPerDim(k)
    val nBuckets = 1L << bits
    colsWithRange.zipWithIndex.map { case ((c, mn, mx), i) =>
      val bucket = when(c.isNull || lit(mx) <= lit(mn), lit(0L))
        .otherwise(width_bucket(c.cast("double"), lit(mn), lit(mx), lit(nBuckets)) - 1)
      val clamped = greatest(lit(0L), least(lit(nBuckets - 1), bucket))
      shiftleft(spreadBits(clamped, k, bits), i)
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` z-order-clustered on `zCols`: one scan computes the column
    * ranges (a driver-side handful of doubles — the only non-distributed
    * step, same bound as Delta's OPTIMIZE ZORDER stats pass), then rows are
    * range-partitioned and sorted by their interleaved z-value so every file
    * holds a small bounding box in ALL clustered dimensions. */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      numFiles: Int, maxRecordsPerFile: Long = 0L): Unit = {
    require(zCols.size >= 2 && numFiles > 0)
    require(!df.columns.contains("__z"),
      "writeZOrdered: input already has a '__z' column (it would be clobbered and dropped)")
    val statsRows = df.select(
      zCols.flatMap(c => Seq(min(col(c)).cast("double"), max(col(c)).cast("double"))): _*)
      .collect()
    // a global aggregate always yields exactly one row — of NULLs when the
    // input is empty or a column is all-null; fail with the cause rather
    // than an NPE out of Row.getDouble
    val stats = statsRows.head
    val ranges = zCols.zipWithIndex.map { case (c, i) =>
      require(!stats.isNullAt(2 * i) && !stats.isNullAt(2 * i + 1),
        s"writeZOrdered: no non-null values for column '$c' (empty input?)")
      (col(c), stats.getDouble(2 * i), stats.getDouble(2 * i + 1))
    }
    df.withColumn("__z", zValue(ranges))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }

  /** Small-file compaction (the OPTIMIZE half of table maintenance):
    * rewrite a parquet directory into `numFiles` files, re-clustered on
    * `clusterCols` (empty = plain coalesce-style rewrite). Streaming
    * micro-batch sinks and fine-grained appends leave thousands of KB-sized
    * files whose per-file open/footer cost dominates the scan at 100 TB;
    * compaction restores both file-size economics and min/max pruning.
    *
    * The rewrite CANNOT overwrite its own input (the lazy plan reads the
    * source while the write runs), so it writes to a sibling `.compact`
    * directory and promotes it with the same rename-aside-then-promote swap
    * as the streaming upsert sink: the live data is in `path` or
    * `path + ".old"` at every step boundary. On a real deployment a
    * transactional table format replaces exactly the swap step. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      numFiles: Int, clusterCols: Seq[String] = Nil): Unit = {
    require(numFiles > 0)
    val tmp = path + ".compact"
    val df = spark.read.parquet(path)
    if (clusterCols.nonEmpty) writeClustered(df, tmp, clusterCols, numFiles)
    else df.repartition(numFiles).write.mode(SaveMode.Overwrite).parquet(tmp)
    promote(tmp, path)
  }

  /** [[compact]] with the file COUNT derived from a target file SIZE — the
    * knob a production deployment actually owns. A fixed `numFiles` is
    * only right at one data volume: at 100 TB nobody knows the count, but
    * everybody knows the size the scan layer wants (512 MB–1 GB per file:
    * big enough that footer/open cost amortizes, small enough that a task
    * is a sane work unit and min/max pruning has resolution). The current
    * volume comes from the directory's own footer-level byte sizes — a
    * |files|-bounded driver listing, the same order as the file index —
    * and the rewrite targets `ceil(bytes / targetBytes)` files.
    *
    * The estimate is pre-rewrite bytes, so re-clustering that changes
    * compression ratios moves the realized size (documented, not
    * corrected: a second invocation converges, and the knob's job is
    * order-of-magnitude file economics, not byte precision).
    *
    * Scope: PLAIN parquet directories — the same file set the rewrite's
    * `spark.read.parquet(path)` will fold, so the estimate and the
    * rewrite agree by construction. Store-shaped directories (flat base
    * + `delta-*` subdirs) compact through [[Store.compact]], which owns
    * the recursive layout and its admission protocol. */
  def compactToFileSize(spark: org.apache.spark.sql.SparkSession,
      path: String, targetBytes: Long,
      clusterCols: Seq[String] = Nil): Int = {
    require(targetBytes > 0)
    val bytes = parquetBytes(new java.io.File(path))
    val numFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    compact(spark, path, numFiles, clusterCols)
    numFiles
  }

  /** Total bytes of TOP-LEVEL parquet files in `dir` — deliberately
    * non-recursive, mirroring exactly what [[compact]]'s plain
    * `spark.read.parquet` reads (hidden staging/marker entries excluded).
    * A recursive sum would count `delta-*` subdirs the rewrite never
    * folds and derive a file count from bytes that stay behind. */
  private[graft] def parquetBytes(dir: java.io.File): Long = {
    val kids = dir.listFiles()
    if (kids == null) 0L
    else kids.iterator.filter(f =>
      f.isFile && f.getName.endsWith(".parquet") &&
        !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .map(_.length()).sum
  }

  /** The rename-aside swap shared by [[compact]] and [[Store.compact]]:
    * move the live directory aside, promote the rewrite, drop the old copy
    * — the live data is in `path`, `path + ".old"`, or `path + ".compact"`
    * at every step boundary. `salvage(oldDir, imageDir)` runs BETWEEN the
    * two renames so a caller can rescue entries from the superseded copy
    * that the rewrite provably did not include (Store.compact moves raced
    * delta admissions into the image there): rescued entries become
    * visible in the same atomic rename as the rewrite itself, so a reader
    * that succeeds never observes a committed-then-missing entry — the
    * alternative (salvaging after the swap) opens a window of
    * non-monotonic reads where a raced admission is visible, then briefly
    * gone, then back. */
  private[graft] def promote(tmp: String, path: String,
      salvage: (java.io.File, java.io.File) => Unit = (_, _) => ()): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    val dir = new java.io.File(path)
    val bak = new java.io.File(path + ".old")
    if (bak.exists()) rm(bak)
    ProtocolPoints.pause("promote.pre-aside")
    if (!dir.renameTo(bak))
      throw new java.io.IOException(s"could not move $path aside to $bak")
    ProtocolPoints.pause("promote.aside")
    // rescue raced entries INTO the image while nothing is live: they go
    // visible in the same atomic rename as the rewrite
    salvage(bak, new java.io.File(tmp))
    ProtocolPoints.pause("promote.salvaged")
    if (!new java.io.File(tmp).renameTo(dir)) {
      // A writer racing the two-rename window can recreate `path` (its
      // file create mkdirs missing parents), defeating this rename. Roll
      // back rather than strand the data in `.old`: fold whatever the
      // racer recreated into the old copy, restore it wholesale, and
      // surface the failure — the store reads byte-identically to before
      // the compaction attempt and the racer's staging paths are intact.
      // the sweep-then-delete pair is itself racy (a writer can create
      // another entry between listFiles() and delete()), so retry the
      // fold-interlopers/delete loop until the delete lands — bounded, and
      // each iteration makes progress by moving whatever appeared
      var restored = false
      var attempts = 0
      while (!restored && attempts < 64) {
        attempts += 1
        val interlopers = dir.listFiles()
        if (interlopers != null) interlopers.foreach { f =>
          if (!f.renameTo(new java.io.File(bak, f.getName))) {
            // the move collides when the old copy already holds an entry of
            // the same name — only possible for a racer that re-created a
            // path the aside-rename had already captured: a re-staged hidden
            // dir (uncommitted by definition — its commit rename will fail
            // and the writer retries), or a re-committed `delta-<id>` whose
            // id the old copy already witnessed (same admission by the id
            // contract). Both are duplicates of data the restore brings
            // back; drop the interloper copy rather than abort the rollback
            if (new java.io.File(bak, f.getName).exists()) rm(f)
            else throw new java.io.IOException(
              s"promote rollback: could not move racer entry $f into $bak")
          }
        }
        restored = dir.delete()
      }
      // entries the salvage step moved INTO the image are committed data:
      // return them to the old copy before restoring it, or the rollback
      // would strand them invisible inside `.compact` (a later
      // Store.recoverStale would rescue them, but non-monotonically)
      val moved = new java.io.File(tmp).listFiles()
      if (moved != null) moved.filter(_.getName.startsWith("delta-")).foreach { f =>
        if (!f.renameTo(new java.io.File(bak, f.getName))) {
          if (new java.io.File(bak, f.getName).exists()) rm(f)
          else throw new java.io.IOException(
            s"promote rollback: could not return salvaged entry $f to $bak")
        }
      }
      if (!restored || !bak.renameTo(dir))
        throw new java.io.IOException(
          s"promote rollback failed: live data is in $bak")
      throw new java.io.IOException(
        s"could not move $tmp to $path (a writer raced the swap); " +
          "store restored, compacted image left for inspection")
    }
    ProtocolPoints.pause("promote.swapped")
    rm(bak)
  }

  /** Deterministic shard manifest of a written dataset: one row per physical
    * file with row count, an ORDER-INDEPENDENT content fingerprint
    * (bit_xor of a per-row 64-bit hash over every column — commutative, so
    * the fingerprint is a function of the file's row multiset-up-to-xor,
    * not of row order or write parallelism), and min/max of the cluster
    * keys (the same bounds the parquet footer serves to pruning). The
    * reproducibility record a training run should archive next to its data:
    * two writes of the same rows with the same layout produce the same
    * content column set even though part-file NAMES are fresh UUIDs — so
    * manifests compare as sets of content rows (spec-pinned). One pass, one
    * per-file aggregate; xor's known blind spot (a duplicated row pair xors
    * away) is covered by the row count next to it.
    *
    * The per-row hash spans ALL columns via the canonical struct hash —
    * a changed value in any row flips the file's fingerprint (spec-pinned). */
  def manifest(spark: org.apache.spark.sql.SparkSession, path: String,
      keyCols: Seq[String] = Nil): DataFrame = {
    val df = spark.read.parquet(path)
    val rowHash = xxhash64(struct(df.columns.map(col): _*))
    val keyAggs = keyCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    val aggs = Seq(count(lit(1)).as("n_rows"),
      expr("bit_xor(rh)").as("fingerprint")) ++ keyAggs
    df.withColumn("rh", rowHash)
      .withColumn("file", regexp_extract(input_file_name(), "[^/]+$", 0))
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("file"))
  }
}
