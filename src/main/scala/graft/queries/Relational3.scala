package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Round-5 relational widening: pivot/unpivot reshaping, exact-moment
  * statistical aggregates, distribution window functions, and date/interval
  * arithmetic. Float policy follows the repo rule (Relational.scala header):
  * money sums stay in exact DECIMAL until a single final cast to double, and
  * every ratio is a ratio of bitwise-identical numerators/denominators, so
  * the DuckDB oracle hash-matches without a rounding grid. */
object Relational3 {

  private def decQty = col("l_quantity").cast("decimal(12,2)")
  private def decPrice = col("l_extendedprice").cast("decimal(12,2)")

  /** Pivot: per returnflag row, one quantity-sum column per linestatus.
    * The pivot values are enumerated (F/O) so Catalyst plans a single
    * partial+final hash aggregate with no extra pass to discover keys —
    * the form that scales (value-discovery pivot is two jobs). */
  def q27Pivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(decQty).cast("double"))
      .withColumnRenamed("F", "qty_f")
      .withColumnRenamed("O", "qty_o")
      .orderBy($"l_returnflag")
  }

  val q27Sql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_f,
      |  CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_o
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Unpivot (wide → long): the two measure columns of a per-flag aggregate
    * become (measure, value) rows. Uses Dataset.unpivot — Catalyst's Expand,
    * one pass, no union of re-scans. */
  def q28Unpivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wide = Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(sum(decQty).cast("double").as("sum_qty"),
        sum(decPrice).cast("double").as("sum_price"))
    wide.unpivot(
      ids = Array($"l_returnflag"),
      values = Array($"sum_qty", $"sum_price"),
      variableColumnName = "measure",
      valueColumnName = "value")
      .orderBy($"l_returnflag", $"measure")
  }

  val q28Sql: String =
    """WITH wide AS (
      |  SELECT l_returnflag,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
      |UNION ALL
      |SELECT l_returnflag, 'sum_price' AS measure, sum_price AS value FROM wide
      |ORDER BY l_returnflag, measure""".stripMargin

  /** Statistical aggregates (variance / stddev / correlation) computed from
    * EXACT decimal moments: n, Σx, Σy, Σx², Σy², Σxy accumulate in DECIMAL
    * (order-independent, no float error), are cast to double once, and the
    * closed-form moment formulas run identically on both engines — the only
    * way stddev/corr can hash-match across engines, since their native
    * implementations accumulate doubles in engine-specific orders. Same
    * single partial+final hash-agg shape (6 decimal sums) as a native corr,
    * so the scale cost is identical. */
  def q30StatsMoments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // FanOut: the six decimal-product moment sums are the heavy stage and
    // were bound to the scan's single row group (r13, measured 1.55 s in
    // one 3-task job); decimal sums are exact so the extra exchange is
    // result-invisible
    val m = FanOut(Tables.lineitem(spark, dir)
        .select($"l_returnflag", $"l_quantity", $"l_extendedprice"),
        $"l_quantity", $"l_extendedprice")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).cast("double").as("n"),
        sum(decQty).cast("double").as("sx"),
        sum(decPrice).cast("double").as("sy"),
        sum(decQty * decQty).cast("double").as("sxx"),
        sum(decPrice * decPrice).cast("double").as("syy"),
        sum(decQty * decPrice).cast("double").as("sxy"))
    // degenerate groups return NULL exactly like native var_samp/corr would:
    // n=1 makes the sample denominator 0 and a zero variance makes the corr
    // denominator 0, and 0-division doubles are where Spark (NaN/Inf) and
    // DuckDB (NULL) part ways
    val varNum = $"n" * $"sxx" - $"sx" * $"sx"
    val varNumY = $"n" * $"syy" - $"sy" * $"sy"
    m.select($"l_returnflag",
      $"n".cast("long").as("n"),
      when($"n" > 1, varNum / ($"n" * ($"n" - 1))).as("var_qty"),
      when($"n" > 1, sqrt(varNum / ($"n" * ($"n" - 1)))).as("stddev_qty"),
      when($"n" > 1 && varNum > 0 && varNumY > 0,
        ($"n" * $"sxy" - $"sx" * $"sy") / (sqrt(varNum) * sqrt(varNumY)))
        .as("corr_qty_price"))
      .orderBy($"l_returnflag")
  }

  /** Per-group least-squares regression of price on quantity: slope,
    * intercept, r² — the `regr_slope`/`regr_intercept`/`regr_r2` family,
    * lowered through the same exact-DECIMAL moment sums as [[q30StatsMoments]]
    * (the native regr_* aggregates accumulate doubles in partition order, so
    * their last ulp is not reproducible across engines; decimal sums are
    * exact, and the closed-form combination of six exact numbers is the
    * same IEEE expression on both sides). One partial+final hash aggregate —
    * the moment sums ARE the partial state, so this costs exactly one
    * shuffle of 7 numbers per group at any scale. RelationalSpec cross-checks
    * the lowering against native regr_slope/regr_intercept to 1e-9. */
  def q38Regression(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // FanOut: same single-row-group-bound moment stage as q30 (r13)
    val m = FanOut(Tables.lineitem(spark, dir)
        .select($"l_returnflag", $"l_quantity", $"l_extendedprice"),
        $"l_quantity", $"l_extendedprice")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).cast("double").as("n"),
        sum(decQty).cast("double").as("sx"),
        sum(decPrice).cast("double").as("sy"),
        sum(decQty * decQty).cast("double").as("sxx"),
        sum(decPrice * decPrice).cast("double").as("syy"),
        sum(decQty * decPrice).cast("double").as("sxy"))
    val covNum = $"n" * $"sxy" - $"sx" * $"sy"
    val varNumX = $"n" * $"sxx" - $"sx" * $"sx"
    val varNumY = $"n" * $"syy" - $"sy" * $"sy"
    // slope/intercept need var(x) > 0; r² additionally var(y) > 0 — the
    // NULL-on-degenerate convention both engines share (vs NaN/Inf doubles)
    m.select($"l_returnflag",
      $"n".cast("long").as("n"),
      when(varNumX > 0, covNum / varNumX).as("slope"),
      when(varNumX > 0, ($"sy" - (covNum / varNumX) * $"sx") / $"n").as("intercept"),
      when(varNumX > 0 && varNumY > 0, (covNum * covNum) / (varNumX * varNumY))
        .as("r2"))
      .orderBy($"l_returnflag")
  }

  val q38Sql: String =
    """WITH m AS (
      |  SELECT l_returnflag,
      |    CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag,
      |  CAST(n AS BIGINT) AS n,
      |  CASE WHEN (n * sxx - sx * sx) > 0
      |       THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS slope,
      |  CASE WHEN (n * sxx - sx * sx) > 0
      |       THEN (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n END AS intercept,
      |  CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
      |       THEN ((n * sxy - sx * sy) * (n * sxy - sx * sy))
      |            / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END AS r2
      |FROM m
      |ORDER BY l_returnflag""".stripMargin

  val q30Sql: String =
    """WITH m AS (
      |  SELECT l_returnflag,
      |    CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag,
      |  CAST(n AS BIGINT) AS n,
      |  CASE WHEN n > 1 THEN (n * sxx - sx * sx) / (n * (n - 1)) END AS var_qty,
      |  CASE WHEN n > 1 THEN sqrt((n * sxx - sx * sx) / (n * (n - 1))) END AS stddev_qty,
      |  CASE WHEN n > 1 AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
      |       THEN (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
      |  END AS corr_qty_price
      |FROM m
      |ORDER BY l_returnflag""".stripMargin

  /** Distribution window functions: ntile / percent_rank / cume_dist over a
    * UNIQUE ordering (totalprice, orderkey) — uniqueness makes peer groups
    * singletons, so both engines' rank-ratio doubles are identical integer
    * ratios. One window sort per priority partition. Scale note: parallelism
    * is capped by the partition-key cardinality (5 priorities here) —
    * rank-family windows need the whole partition sorted, so at 100 TB pick
    * a higher-cardinality partition key or pre-bucket the data; there is no
    * shuffle-free form of a global rank. */
  def q31WindowExtras(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice", $"o_orderkey")
    Tables.orders(spark, dir)
      .select($"o_orderpriority", $"o_orderkey",
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy($"o_orderpriority", $"o_orderkey")
  }

  val q31Sql: String =
    """SELECT o_orderpriority, o_orderkey,
      |  ntile(4) OVER w AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  /** Date/interval arithmetic rolled into a per-(year, quarter) aggregate:
    * calendar extraction, day spans, interval shifts, month boundaries. All
    * date outputs are formatted to strings (the repo's timestamp rule) and
    * all numbers are integer counts — nothing floats. */
  def q33DateArith(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Two-level rollup instead of countDistinct-beside-other-aggs: the mixed
    // distinct agg planned an Expand that doubled every scan row before the
    // shuffle. Pre-aggregating to the month grain (one ~#months-key hash agg,
    // map-side partials do the heavy lifting) makes the distinct a plain
    // count and shrinks the second agg to ~#months rows. Every output
    // decomposes through the month: last_day and date_add(·, 30) are monotone
    // in d, so max/min commute with them, and yyyy-MM-dd strings order like
    // their dates.
    val monthly = Tables.lineitem(spark, dir)
      .select($"l_shipdate".cast("date").as("d"))
      .groupBy(trunc($"d", "month").as("mo"))
      .agg(count(lit(1)).as("n_m"), max($"d").as("mx"), min($"d").as("mn"))
    monthly
      .groupBy(year($"mo").cast("long").as("yr"),
        quarter($"mo").cast("long").as("qtr"))
      .agg(sum($"n_m").as("n"),
        count(lit(1)).as("n_months"),
        datediff(max($"mx"), min($"mn")).cast("long").as("day_span"),
        date_format(last_day(max($"mx")), "yyyy-MM-dd").as("max_month_end"),
        date_format(date_add(min($"mn"), 30), "yyyy-MM-dd").as("min_plus30"))
      .orderBy($"yr", $"qtr")
  }

  val q33Sql: String =
    """WITH d AS (SELECT CAST(l_shipdate AS DATE) AS d FROM lineitem)
      |SELECT year(d) AS yr, quarter(d) AS qtr,
      |  count(*) AS n,
      |  count(DISTINCT date_trunc('month', d)) AS n_months,
      |  date_diff('day', min(d), max(d)) AS day_span,
      |  strftime(max(last_day(d)), '%Y-%m-%d') AS max_month_end,
      |  strftime(min(d + INTERVAL 30 DAY), '%Y-%m-%d') AS min_plus30
      |FROM d
      |GROUP BY 1, 2
      |ORDER BY yr, qtr""".stripMargin

  /** Fact-fact join accelerated by a RUNTIME BLOOM FILTER: Catalyst's
    * InjectRuntimeFilter builds a bloom filter from the selectively-filtered
    * orders side and pushes a `might_contain` probe into the lineitem scan,
    * so the big side drops non-qualifying rows BEFORE the shuffle — the
    * standard 100 TB trick for joins whose small side is filtered but too big
    * to broadcast. False positives only cost shuffle bytes; the join itself
    * stays exact, which is why this hash-matches a plain-SQL oracle.
    *
    * Runs on an isolated `newSession()` (shared context, private conf): the
    * rule needs `autoBroadcastJoinThreshold=-1` (shuffle join) and a lowered
    * `applicationSideScanSizeThreshold` to fire at test scale, and those
    * must not leak into sibling queries. */
  def q32BloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    import s.implicits._
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    val urgent = Tables.orders(s, dir)
      .filter($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 400000.0)
    Tables.lineitem(s, dir)
      .join(urgent, $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(decPrice * (lit(BigDecimal(1).setScale(2)) - col("l_discount").cast("decimal(4,2)")))
          .cast("double").as("revenue"))
      .orderBy($"l_returnflag")
  }

  val q32Sql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |           (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 400000.0
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_pivot" -> (q27Pivot _),
    "q28_unpivot" -> (q28Unpivot _),
    "q30_stats_moments" -> (q30StatsMoments _),
    "q31_window_extras" -> (q31WindowExtras _),
    "q32_bloom_join" -> (q32BloomJoin _),
    "q33_date_arith" -> (q33DateArith _),
    "q38_regression" -> (q38Regression _))

  val oracles: Map[String, String] = Map(
    "q27_pivot" -> q27Sql,
    "q28_unpivot" -> q28Sql,
    "q30_stats_moments" -> q30Sql,
    "q31_window_extras" -> q31Sql,
    "q32_bloom_join" -> q32Sql,
    "q33_date_arith" -> q33Sql,
    "q38_regression" -> q38Sql)
}
