package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.BloomSketch

/** File-level Bloom-filter index — data skipping for POINT LOOKUPS on
  * high-cardinality keys, the case zone maps cannot serve.
  *
  * [[ZoneMaps]] prune on per-file `[min, max]` ranges, which works iff the
  * layout correlates the column with file boundaries AND the predicate is
  * a range. An equality probe on a high-cardinality key (order id, doc id,
  * user id) against an UNCLUSTERED layout defeats ranges completely —
  * every file's min/max straddles every key. A per-file Bloom filter
  * answers "which files might contain THIS key" regardless of layout:
  * expected files read = (files actually holding the key) + fpp x |files|,
  * against a full-directory scan otherwise. This is the Parquet
  * bloom-filter / Delta deletion-vector-lookup idea with the stats held
  * OUTSIDE the data files, so deciding "which files?" costs one scan of a
  * |files|-row metadata table instead of one footer GET per file.
  *
  * Scale discipline (the part that matters at 100 TB):
  *  - BUILD is one distributed pass grouped by `_metadata.file_path`; the
  *    shuffle carries partially-merged filters, |files|-scale, never rows.
  *  - PROBE never collects filters: blooms can be ~100 KB each (a million
  *    files -> ~100 GB — driver-fatal, unlike zone maps' ~100 B rows), so
  *    the membership test runs as a DISTRIBUTED filter over the stats
  *    table and only the surviving file NAMES come back to the driver —
  *    bounded by true hits + fpp stragglers, not by |files|.
  *  - Keys are pre-hashed with codegen'd `xxhash64` on both sides, so the
  *    aggregate and probe are monomorphic longs and the filter never
  *    stores raw key bytes. */
object BloomIndex {

  /** One distributed pass over `dataPath`: per-file row count + Bloom
    * filter of `xxhash64(keyCol)`, written (overwrite) to `statsDir`.
    *
    * `expectedPerFile` declares the filter size (bits are fixed at
    * creation): size it to the layout's target rows-per-file. Oversizing
    * wastes ~1.2 KB per 1000 declared items at 1% fpp; undersizing only
    * degrades the false-positive rate — a bloom's "definitely absent" is
    * unconditional, so pruning stays CORRECT either way. */
  def build(spark: SparkSession, dataPath: String, keyCol: String,
      statsDir: String, expectedPerFile: Long = 100000L,
      fpp: Double = 0.01): Unit = {
    spark.read.parquet(dataPath)
      .select(col("_metadata.file_path").as("file"),
        xxhash64(col(keyCol)).as("h"))
      .groupBy(col("file"))
      .agg(count(lit(1)).as("n_rows"),
        BloomSketch.bloomAgg(col("h"), expectedPerFile, fpp).as("bloom"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(statsDir)
  }

  /** Scan `dataPath` for rows with `keyCol === key`, reading ONLY files
    * whose Bloom filter might contain the key. Returns the filtered frame
    * plus (filesRead, filesTotal) for observability. The equality
    * predicate is still applied (and still pushes down to parquet row
    * groups): a bloom's "maybe" is never trusted as a hit.
    *
    * `key` must be a literal/column of the SAME type as the indexed
    * column — `xxhash64` is type-aware, so an int probe of a long-keyed
    * index would hash differently and (correctly but uselessly) prune
    * everything. */
  def scanPointLookup(spark: SparkSession, dataPath: String,
      statsDir: String, keyCol: String, key: Column): (DataFrame, (Int, Int)) = {
    import spark.implicits._
    // ONE distributed pass over the stats table decides both the candidate
    // list and the total (the ZoneMaps.scanPrunedAll shape); the probe runs
    // where the blooms live and only (file, keep) pairs reach the driver —
    // the bloom column itself never does
    val flagged = spark.read.parquet(statsDir)
      .select(col("file"),
        BloomSketch.mightContain(col("bloom"), xxhash64(key)).as("keep"))
      .as[(String, Boolean)].collect()
    val total = flagged.length
    val files = flagged.collect { case (f, true) => f }.toSeq
    val pred = col(keyCol) === key
    val df =
      if (files.isEmpty)
        // definitely-absent everywhere: empty frame, no data scan at all
        spark.read.parquet(dataPath).filter(lit(false))
      else spark.read.parquet(files: _*).filter(pred)
    (df, (files.length, total))
  }
}
