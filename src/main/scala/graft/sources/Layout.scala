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

  /** Morton bit-spread: the low 16 bits of `v` spaced out to every other bit
    * position. Composed entirely from builtin shift/mask functions so the
    * whole z-value stays inside whole-stage codegen — no UDF, no custom
    * expression needed. */
  private def spread16(v: Column): Column = {
    val m = Seq(0x00FF00FFL, 0x0F0F0F0FL, 0x33333333L, 0x55555555L)
    val s = Seq(8, 4, 2, 1)
    m.zip(s).foldLeft(v.bitwiseAND(lit(0xFFFFL))) { case (x, (mask, shift)) =>
      (x.bitwiseOR(shiftleft(x, shift))).bitwiseAND(lit(mask))
    }
  }

  /** Z-order (Morton) value over 2+ numeric columns: each value is mapped to
    * a 16-bit bucket of its [min,max] range, buckets are bit-interleaved.
    * Rows close in z are close in EVERY clustered dimension, which is what
    * makes multi-column data skipping work (a linear sort gives narrow file
    * ranges only on its leading column). Uniform buckets via width_bucket —
    * for heavily skewed columns substitute approxQuantile-derived boundaries;
    * the interleave is unchanged. */
  def zValue(colsWithRange: Seq[(Column, Double, Double)]): Column = {
    require(colsWithRange.size >= 2, "z-order needs at least 2 columns")
    colsWithRange.zipWithIndex.map { case ((c, mn, mx), i) =>
      val bucket = when(lit(mx) > lit(mn),
        width_bucket(c.cast("double"), lit(mn), lit(mx), lit(65536)) - 1)
        .otherwise(lit(0L))
      val clamped = greatest(lit(0L), least(lit(65535L), bucket))
      shiftleft(spread16(clamped), i)
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
    val stats = df.select(
      zCols.flatMap(c => Seq(min(col(c)).cast("double"), max(col(c)).cast("double"))): _*)
      .head()
    val ranges = zCols.zipWithIndex.map { case (c, i) =>
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
}
