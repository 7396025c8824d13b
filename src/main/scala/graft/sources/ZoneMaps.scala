package graft.sources

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
    val df = spark.read.parquet(dataPath)
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.select(col("_metadata.file_path").as("file") +: cols.map(col): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
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
        // layouts are single-writer by construction), so no schema pin is
        // needed and the full directory is never listed
        spark.read.parquet(files: _*).filter(pred)
    (df, (files.length, total))
  }

  /** Single-conjunct convenience face of [[scanPrunedAll]]. */
  def scanPruned(spark: SparkSession, dataPath: String, statsDir: String,
      trackedCol: String, lo: Column, hi: Column): (DataFrame, (Int, Int)) =
    scanPrunedAll(spark, dataPath, statsDir, Seq((trackedCol, lo, hi)))
}
