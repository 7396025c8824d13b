package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

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
}
