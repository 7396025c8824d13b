package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Table profiling — the ANALYZE-grade statistics pass every warehouse
  * runs before trusting an optimizer or publishing a dataset: per-column
  * null counts, exact distinct counts, and min/max, computed in ONE scan
  * of the fact table.
  *
  * Shape: a single global aggregate carries every column's measures
  * side by side (Catalyst plans the multi-countDistinct via one Expand —
  * k tracked columns multiply the aggregate's input k-fold, which is the
  * honest price of EXACT NDV; the cheap production variant swaps in
  * approx_count_distinct and drops the Expand, same plan otherwise). The
  * wide 1-row result is then exploded into the long (column, stats) form
  * — a 1-row driver-free pivot, not a per-column rescan: profiling k
  * columns with k scans is the anti-pattern this operator exists to
  * replace.
  *
  * Values are normalized before stringification (integral doubles → long,
  * timestamps → date) so the min/max render identically across engines.
  */
object Profiling {

  def prepTableStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // FanOut: the exact-NDV Expand multiplies the aggregate's input
    // k-fold and was bound to the scan's single row group (r13, measured
    // 4.2 s in one straggler task; 1.4 s fanned out) — the honest Expand
    // price, now actually paid in parallel
    val li = FanOut(Tables.lineitem(spark, dir)
      .select($"l_quantity".cast("long").as("qty"),
        $"l_returnflag".as("rf"),
        to_date($"l_shipdate").as("sd")), col("qty"), col("sd"))
    val wide = li.agg(
      count(lit(1)).as("n_rows"),
      sum($"qty".isNull.cast("long")).as("qty_nulls"),
      countDistinct($"qty").as("qty_ndv"),
      min($"qty").cast("string").as("qty_min"),
      max($"qty").cast("string").as("qty_max"),
      sum($"rf".isNull.cast("long")).as("rf_nulls"),
      countDistinct($"rf").as("rf_ndv"),
      min($"rf").as("rf_min"),
      max($"rf").as("rf_max"),
      sum($"sd".isNull.cast("long")).as("sd_nulls"),
      countDistinct($"sd").as("sd_ndv"),
      min($"sd").cast("string").as("sd_min"),
      max($"sd").cast("string").as("sd_max"))
    wide.select($"n_rows", explode(array(
        struct(lit("l_quantity").as("column_name"), $"qty_nulls".as("n_nulls"),
          $"qty_ndv".as("ndv"), $"qty_min".as("min_s"), $"qty_max".as("max_s")),
        struct(lit("l_returnflag").as("column_name"), $"rf_nulls".as("n_nulls"),
          $"rf_ndv".as("ndv"), $"rf_min".as("min_s"), $"rf_max".as("max_s")),
        struct(lit("l_shipdate").as("column_name"), $"sd_nulls".as("n_nulls"),
          $"sd_ndv".as("ndv"), $"sd_min".as("min_s"), $"sd_max".as("max_s"))))
        .as("s"))
      .select($"s.column_name", $"n_rows", $"s.n_nulls", $"s.ndv",
        $"s.min_s", $"s.max_s")
      .orderBy($"column_name")
  }

  val prepTableStatsSql: String =
    """WITH s AS (
      |  SELECT count(*) AS n_rows,
      |    CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS qty_nulls,
      |    count(DISTINCT CAST(l_quantity AS BIGINT)) AS qty_ndv,
      |    CAST(min(CAST(l_quantity AS BIGINT)) AS VARCHAR) AS qty_min,
      |    CAST(max(CAST(l_quantity AS BIGINT)) AS VARCHAR) AS qty_max,
      |    CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS rf_nulls,
      |    count(DISTINCT l_returnflag) AS rf_ndv,
      |    min(l_returnflag) AS rf_min,
      |    max(l_returnflag) AS rf_max,
      |    CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS sd_nulls,
      |    count(DISTINCT CAST(l_shipdate AS DATE)) AS sd_ndv,
      |    CAST(min(CAST(l_shipdate AS DATE)) AS VARCHAR) AS sd_min,
      |    CAST(max(CAST(l_shipdate AS DATE)) AS VARCHAR) AS sd_max
      |  FROM lineitem)
      |SELECT 'l_quantity' AS column_name, n_rows, qty_nulls AS n_nulls,
      |  qty_ndv AS ndv, qty_min AS min_s, qty_max AS max_s FROM s
      |UNION ALL
      |SELECT 'l_returnflag', n_rows, rf_nulls, rf_ndv, rf_min, rf_max FROM s
      |UNION ALL
      |SELECT 'l_shipdate', n_rows, sd_nulls, sd_ndv, sd_min, sd_max FROM s
      |ORDER BY column_name""".stripMargin

  /** The PRODUCTION variant of [[prepTableStats]] (VERDICT r9 task 6):
    * identical one-scan shape with `approx_count_distinct` (HLL++ at 2% rsd — measured ≤1% actual
    * error on all three columns at every test scale, and ~3x cheaper than
    * 1% rsd, whose register arrays dominated the scan) in place of exact NDV — the multi-countDistinct Expand that
    * multiplies the exact form's aggregate input k-fold disappears, so the
    * scan aggregates each row ONCE regardless of how many columns are
    * profiled. Rows-only for the driver (HLL register arithmetic is not
    * ANSI-reproducible, the q20 argument); the spec pins each approx NDV
    * within ±2% of the exact form's — far inside HLL++'s error bound at
    * these cardinalities — and the bench line prices the Expand's removal
    * (exact form kept as the priced diagnostic). */
  def prepTableStatsApprox(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_quantity".cast("long").as("qty"),
        $"l_returnflag".as("rf"),
        to_date($"l_shipdate").as("sd"))
    val wide = li.agg(
      count(lit(1)).as("n_rows"),
      sum($"qty".isNull.cast("long")).as("qty_nulls"),
      approx_count_distinct($"qty", 0.02).as("qty_ndv"),
      min($"qty").cast("string").as("qty_min"),
      max($"qty").cast("string").as("qty_max"),
      sum($"rf".isNull.cast("long")).as("rf_nulls"),
      approx_count_distinct($"rf", 0.02).as("rf_ndv"),
      min($"rf").as("rf_min"),
      max($"rf").as("rf_max"),
      sum($"sd".isNull.cast("long")).as("sd_nulls"),
      approx_count_distinct($"sd", 0.02).as("sd_ndv"),
      min($"sd").cast("string").as("sd_min"),
      max($"sd").cast("string").as("sd_max"))
    wide.select($"n_rows", explode(array(
        struct(lit("l_quantity").as("column_name"), $"qty_nulls".as("n_nulls"),
          $"qty_ndv".as("ndv"), $"qty_min".as("min_s"), $"qty_max".as("max_s")),
        struct(lit("l_returnflag").as("column_name"), $"rf_nulls".as("n_nulls"),
          $"rf_ndv".as("ndv"), $"rf_min".as("min_s"), $"rf_max".as("max_s")),
        struct(lit("l_shipdate").as("column_name"), $"sd_nulls".as("n_nulls"),
          $"sd_ndv".as("ndv"), $"sd_min".as("min_s"), $"sd_max".as("max_s"))))
        .as("s"))
      .select($"s.column_name", $"n_rows", $"s.n_nulls", $"s.ndv",
        $"s.min_s", $"s.max_s")
      .orderBy($"column_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "prep_table_stats" -> (prepTableStats _),
    "prep_table_stats_approx" -> (prepTableStatsApprox _))

  /** prep_table_stats_approx is deliberately absent: HLL++ NDV is
    * engine-internal (the q20/q25 class); the ±2% differential against
    * the exact form lives in ProfilingSpec. */
  val oracles: Map[String, String] = Map(
    "prep_table_stats" -> prepTableStatsSql)
}
