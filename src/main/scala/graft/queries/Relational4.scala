package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Fourth relational widening: argmin/argmax aggregates and an
  * effective-dated (SCD2) dimension build — two shapes warehouse users reach
  * for constantly that the surface did not yet exercise.
  */
object Relational4 {

  /** Deterministic total order for argmin/argmax: (o_totalprice, o_orderkey)
    * as a struct — argmax by price alone is nondeterministic under price
    * ties (both engines leave the tie-winner unspecified), and any
    * single-BIGINT encoding of the pair has a finite key range it silently
    * collides beyond. Spark's max_by/min_by order structs lexicographically,
    * so ties break to the larger (max_by) / smaller (min_by) orderkey. */
  private val priceKeyOrd = struct(col("o_totalprice"), col("o_orderkey"))

  /** Per-priority argmin/argmax: which order carries the highest / lowest
    * total price. `max_by`/`min_by` are single-pass hash-agg accumulators —
    * the scalable replacement for the self-join-on-max antipattern (scan ×2
    * plus a shuffle) and for a full per-group window sort. One partial+final
    * hash aggregate; nothing but (priority, ord, key) crosses the wire. */
  def q34MinmaxBy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        max_by($"o_orderkey", priceKeyOrd).as("best_key"),
        min_by($"o_orderkey", priceKeyOrd).as("worst_key"),
        max($"o_totalprice").as("max_price"),
        min($"o_totalprice").as("min_price"))
      .orderBy($"o_orderpriority")
  }

  // DuckDB arg_max cannot order by a struct, so the oracle expresses the
  // same deterministic argmin/argmax as rank-1 rows of two windows with the
  // identical (price, key) tie-break.
  val q34Sql: String =
    """WITH ranked AS (
      |  SELECT o_orderpriority, o_orderkey,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey DESC) AS rb,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice ASC, o_orderkey ASC) AS rw
      |  FROM orders),
      |agg AS (
      |  SELECT o_orderpriority, count(*) AS n_orders,
      |    max(o_totalprice) AS max_price, min(o_totalprice) AS min_price
      |  FROM orders GROUP BY o_orderpriority)
      |SELECT a.o_orderpriority, a.n_orders,
      |  b.o_orderkey AS best_key, w.o_orderkey AS worst_key,
      |  a.max_price, a.min_price
      |FROM agg a
      |JOIN ranked b ON b.o_orderpriority = a.o_orderpriority AND b.rb = 1
      |JOIN ranked w ON w.o_orderpriority = a.o_orderpriority AND w.rw = 1
      |ORDER BY a.o_orderpriority""".stripMargin

  /** Slowly-changing-dimension type 2 build: each customer's order stream
    * becomes effective-dated versions — valid_from = the order's date,
    * valid_to = the next order's date (open-ended sentinel for the latest),
    * is_current flagging the live row. The standard lead()-over-entity
    * window; at scale this is ONE shuffle on the entity key and a
    * within-partition sort — the same cost as any windowed scan, with no
    * self-join. Ties on the date are ordered by o_orderkey so the version
    * chain is total and deterministic. Timestamps are formatted to strings
    * per the repo's timestamp output rule. */
  def q35Scd2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val nextDate = lead($"o_orderdate", 1).over(w)
    Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice",
        date_format($"o_orderdate", "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        coalesce(date_format(nextDate, "yyyy-MM-dd HH:mm:ss"),
          lit("9999-12-31 00:00:00")).as("valid_to"),
        nextDate.isNull.cast("long").as("is_current"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  val q35Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS valid_from,
      |  coalesce(strftime(lead(o_orderdate) OVER w, '%Y-%m-%d %H:%M:%S'),
      |           '9999-12-31 00:00:00') AS valid_to,
      |  CAST(lead(o_orderdate) OVER w IS NULL AS BIGINT) AS is_current
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Time-RANGE window frame: per customer, the rolling 30-day order total
    * and count — frame bounds defined by the ORDER-BY VALUE (epoch days),
    * not row offsets, so tied dates are peers and gaps shrink the frame.
    * The ROWS-frame ops are covered by q08/q31; this pins the RANGE form,
    * which is the one sliding-window analytics actually needs. One entity
    * shuffle + in-partition sort, same cost envelope as any windowed scan.
    * Sums are exact DECIMAL cast to double at the end (the repo's big-sum
    * rule); both engines' frames are inclusive of the 30-days-ago instant.
    * The order value is epoch-DAYS (orderdates are date-grained TIMESTAMP_NTZ
    * midnights): a direct NTZ→epoch-seconds cast would route through the
    * session timezone, whose DST shifts could move frame boundaries relative
    * to the oracle's timezone-free interval arithmetic. */
  def q36RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy(datediff($"o_orderdate".cast("date"), lit("1970-01-01")))
      .rangeBetween(-30L, 0L)
    Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd HH:mm:ss").as("o_date"),
        sum($"o_totalprice".cast("decimal(12,2)")).over(w).cast("double").as("sum_30d"),
        count(lit(1)).over(w).cast("long").as("n_30d"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  val q36Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_date,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_30d,
      |  CAST(count(*) OVER w AS BIGINT) AS n_30d
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
      |             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** EXISTS / IN / NOT EXISTS predicate subqueries in one query (the TPC-H
    * Q4 shape plus an IN and an anti clause) — exercised through the SQL
    * front end so the subquery-to-join REWRITES are what is being pinned:
    * Catalyst plans EXISTS as a left-semi join, NOT EXISTS as a left-anti
    * join, and the uncorrelated IN as a semi join on the build side — no
    * per-row re-execution of the inner query anywhere (that driver-side
    * shape wouldn't survive any scale). The Column-API faces of these plans
    * are q04/q05; this pins the SQL path. */
  def q37ExistsIn(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_q37")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_q37")
    Tables.customer(spark, dir).createOrReplaceTempView("customer_q37")
    spark.sql(
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders_q37 o
        |WHERE EXISTS (SELECT 1 FROM lineitem_q37 l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        |  AND o_custkey IN (SELECT c_custkey FROM customer_q37
        |                    WHERE c_acctbal > 5000)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem_q37 r
        |                  WHERE r.l_orderkey = o.o_orderkey
        |                    AND r.l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  val q37Sql: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
      |  AND o_custkey IN (SELECT c_custkey FROM customer
      |                    WHERE c_acctbal > 5000)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem r
      |                  WHERE r.l_orderkey = o.o_orderkey
      |                    AND r.l_returnflag = 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** The q31 distribution-window family at HIGH partition-key cardinality:
    * partitioned by o_custkey (≈ |customers| keys) instead of 5 priorities,
    * so the window sort parallelizes with the data — the shape q31's scale
    * note prescribes for 100 TB (rank-family windows need each partition
    * sorted whole; parallelism = key cardinality, so pick an entity key).
    * Same uniqueness argument as q31: (totalprice, orderkey) ordering makes
    * peer groups singletons, so the rank-ratio doubles are identical integer
    * ratios in both engines. One hash shuffle on custkey + in-partition
    * sort; no global sort until the presentation ORDER BY. */
  def q39WindowHicard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice", $"o_orderkey")
    Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey",
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  val q39Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  ntile(4) OVER w AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** `NOT IN (subquery)` over nullable keys — the NULL-AWARE ANTI JOIN plan
    * shape, the one subquery rewrite q04/q05/q37 do NOT cover. Parquet
    * columns read as nullable, so Catalyst cannot legally degrade
    * `c_custkey NOT IN (SELECT o_custkey ...)` to the plain left-anti join
    * of q05: three-valued logic says one NULL in the subquery empties the
    * result and a NULL outer key can never pass. The single-column form
    * plans as a BroadcastHashJoin LeftAnti BuildRight marked NULL-AWARE
    * (`spark.sql.optimizeNullAwareAntiJoin`, on by default) — the build
    * side carries one extra "saw a null" bit instead of the quadratic
    * BroadcastNestedLoopJoin the bare `(k = v) OR isnull(k = v)` condition
    * would need. Plan-pinned in PlanSpec. At 100 TB the build side is the
    * DISTINCT filtered key set (here: very-large-order' custkeys), exactly what
    * q05's scale note prescribes for anti joins with small right sides; a
    * large build side falls back to the regular null-aware rewrite and
    * should be re-expressed as q05's NOT EXISTS (null-free key) instead. */
  def q40NullAnti(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_q40")
    Tables.orders(spark, dir).createOrReplaceTempView("orders_q40")
    spark.sql(
      """SELECT c_custkey, c_name, c_nationkey
        |FROM customer_q40
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders_q40
        |                        WHERE o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin)
  }

  val q40Sql: String =
    """SELECT c_custkey, c_name, c_nationkey
      |FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
      |                        WHERE o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin

  /** Correlated LATERAL subquery with ORDER BY ... LIMIT — per-nation top-2
    * customers by balance, the "top-k per group as a join" front end.
    * Catalyst DECORRELATES the lateral limit into a window (rank over the
    * correlation key) + join — no per-outer-row re-execution of the inner
    * query survives planning (the shape that cannot scale), and the window
    * itself gets the WindowGroupLimit pushdown q16/prep_stratified pin. The
    * Column-API face of this result is q07's window top-k; this pins the
    * SQL LATERAL path end to end. */
  def q41Lateral(spark: SparkSession, dir: String): DataFrame = {
    Tables.nation(spark, dir).createOrReplaceTempView("nation_q41")
    Tables.customer(spark, dir).createOrReplaceTempView("customer_q41")
    spark.sql(
      """SELECT n.n_name, t.c_custkey, round(t.c_acctbal, 2) AS acctbal
        |FROM nation_q41 n,
        |LATERAL (SELECT c_custkey, c_acctbal
        |         FROM customer_q41 c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey
        |         LIMIT 2) t
        |ORDER BY n.n_name, acctbal DESC, t.c_custkey""".stripMargin)
  }

  val q41Sql: String =
    """SELECT n.n_name, t.c_custkey, round(t.c_acctbal, 2) AS acctbal
      |FROM nation n,
      |LATERAL (SELECT c_custkey, c_acctbal
      |         FROM customer c
      |         WHERE c.c_nationkey = n.n_nationkey
      |         ORDER BY c_acctbal DESC, c_custkey
      |         LIMIT 2) t
      |ORDER BY n.n_name, acctbal DESC, t.c_custkey""".stripMargin

  /** FILTER-clause aggregates: one pass computing differently-predicated
    * aggregates side by side — the ANSI form of the "conditional sum"
    * (q26 does the CASE-expression face; this pins `FILTER (WHERE ...)`,
    * including a filtered DISTINCT). Catalyst folds the non-distinct
    * FILTER aggregates into one partial+final hash aggregate over ONE scan
    * — no per-predicate passes (the multi-scan form is what this replaces
    * at 100 TB). The filtered DISTINCT is the priced exception: it forces
    * an Expand and a second, two-phase distinct aggregation (an extra
    * shuffle keyed on (group, o_custkey)) — still one scan, and the
    * distinct shuffle carries only the post-Expand key columns. Sum on an
    * exact DECIMAL cast per the repo big-sum rule. */
  def q42FilterAgg(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_q42")
    spark.sql(
      """SELECT o_orderpriority,
        |  count(*) AS n_orders,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
        |  count(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 200000)
        |    AS n_big_custs,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2)))
        |       FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS open_value
        |FROM orders_q42
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  val q42Sql: String =
    """SELECT o_orderpriority,
      |  count(*) AS n_orders,
      |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
      |  count(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 200000)
      |    AS n_big_custs,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2)))
      |       FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS open_value
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q21 shape (suppliers-who-kept-orders-waiting): a four-table join
    * with BOTH a correlated EXISTS and a correlated NOT EXISTS against the
    * SAME fact table the outer query scans — the composition stress the
    * surface covered only piecewise (q04/q05 column-API semi/anti, q37 SQL
    * EXISTS, q40 null-aware anti). Here: suppliers with a returned line
    * item on a finished multi-supplier order where NO other supplier on
    * that order had a return.
    *
    * What the plan must do (spec-pinned in Relational4Spec): Catalyst
    * decorrelates the EXISTS into a left-semi and the NOT EXISTS into a
    * left-anti join on l_orderkey, each carrying the `<> l_suppkey`
    * residual as a join condition — no per-row re-execution of the inner
    * queries, no nested-loop join, no cartesian product. At 100 TB all
    * three lineitem legs shuffle on l_orderkey (the semi/anti build sides
    * are the SAME key, so the exchanges reuse partitioning across the
    * joins), and supplier/nation broadcast. The NOT EXISTS leg is an
    * ordinary anti join, not the null-aware form — l_suppkey is non-null
    * by schema, so q40's single-key null-check machinery never engages. */
  def q43LateSuppliers(spark: SparkSession, dir: String): DataFrame = {
    Tables.supplier(spark, dir).createOrReplaceTempView("supplier_q43")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_q43")
    Tables.orders(spark, dir).createOrReplaceTempView("orders_q43")
    Tables.nation(spark, dir).createOrReplaceTempView("nation_q43")
    spark.sql(
      """SELECT s.s_name, n.n_name, count(*) AS numwait
        |FROM supplier_q43 s
        |JOIN lineitem_q43 l1 ON s.s_suppkey = l1.l_suppkey
        |JOIN orders_q43 o ON o.o_orderkey = l1.l_orderkey
        |JOIN nation_q43 n ON n.n_nationkey = s.s_nationkey
        |WHERE o.o_orderstatus = 'F'
        |  AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem_q43 l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem_q43 l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s.s_name, n.n_name
        |ORDER BY numwait DESC, s.s_name""".stripMargin)
  }

  val q43Sql: String =
    """SELECT s.s_name, n.n_name, count(*) AS numwait
      |FROM supplier s
      |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
      |JOIN orders o ON o.o_orderkey = l1.l_orderkey
      |JOIN nation n ON n.n_nationkey = s.s_nationkey
      |WHERE o.o_orderstatus = 'F'
      |  AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s.s_name, n.n_name
      |ORDER BY numwait DESC, s.s_name""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_late_suppliers" -> (q43LateSuppliers _),
    "q42_filter_agg" -> (q42FilterAgg _),
    "q41_lateral" -> (q41Lateral _),
    "q40_null_anti" -> (q40NullAnti _),
    "q34_minmax_by" -> (q34MinmaxBy _),
    "q35_scd2" -> (q35Scd2 _),
    "q36_range_frame" -> (q36RangeFrame _),
    "q37_exists_in" -> (q37ExistsIn _),
    "q39_window_hicard" -> (q39WindowHicard _))

  val oracles: Map[String, String] = Map(
    "q43_late_suppliers" -> q43Sql,
    "q42_filter_agg" -> q42Sql,
    "q41_lateral" -> q41Sql,
    "q40_null_anti" -> q40Sql,
    "q34_minmax_by" -> q34Sql,
    "q35_scd2" -> q35Sql,
    "q36_range_frame" -> q36Sql,
    "q37_exists_in" -> q37Sql,
    "q39_window_hicard" -> q39Sql)
}
