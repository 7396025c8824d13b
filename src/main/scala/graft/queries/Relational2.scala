package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Second tranche of the relational surface (SURVEY.md §2.B): explicit
  * GROUPING SETS, approximate distinct (HLL), exact percentiles, array and
  * map scalar functions. */
object Relational2 {

  /** Explicit GROUPING SETS through the SQL front end. */
  def q19GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_q19")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders_q19
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
  }

  val q19Sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** HLL approximate distinct count next to the exact one. The HLL estimate
    * is engine-specific (Spark's HLL++ vs DuckDB's), so the driver check is
    * rows-only; RelationalSpec pins the [exact*(1±5%)] error bound. */
  def q20ApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Exact-distinct and HLL aggregates are computed in SEPARATE aggregations
    // and joined: mixing them in one agg() makes Catalyst expand the child
    // per distinct group and drop the HLL buffers into a non-codegen
    // object-aggregate path (measured 121s vs ~2s at sf0.1).
    val li = Tables.lineitem(spark, dir)
    val exact = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("exact_orders"))
    val approx = li.groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_orderkey", 0.02).as("approx_orders"),
        approx_count_distinct($"l_partkey", 0.02).as("approx_parts"))
    exact.join(approx, "l_returnflag").orderBy($"l_returnflag")
  }

  /** Exact percentiles (Catalyst `percentile`; continuous interpolation —
    * same definition as DuckDB's quantile_cont). */
  def q21Percentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"),
        count(lit(1)).as("n"))
      .orderBy($"o_orderpriority")
  }

  val q21Sql: String =
    """SELECT o_orderpriority,
      |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
      |  round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
      |  count(*) AS n
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Sketch-based approximate percentiles next to the exact ones (the
    * bounded-memory path for 100 TB percentile queries — exact percentile
    * materializes the group; the sketch is mergeable fixed-size state).
    * Sketch output is engine-specific → rows-only driver check;
    * RelationalSpec pins the accuracy bound vs exact. */
  def q25ApproxPercentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .agg(
        expr("percentile_approx(o_totalprice, 0.5, 10000)").as("p50_approx"),
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50_exact"),
        count(lit(1)).as("n"))
      .orderBy($"o_orderpriority")
  }

  /** Array scalar functions over the embeddings vector column. Floats cast
    * to double on both sides -> identical values. */
  def q22ArrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .filter($"vec_id" % 20 === 0)
      .select(
        $"vec_id",
        size($"embedding").cast("long").as("dim"),
        round(element_at($"embedding", 1).cast("double"), 8).as("first_elem"),
        round(array_max($"embedding").cast("double"), 8).as("max_elem"),
        round(array_min($"embedding").cast("double"), 8).as("min_elem"),
        round(element_at(slice(sort_array($"embedding", asc = false), 1, 3), 3)
          .cast("double"), 8).as("third_largest"),
        size(filter($"embedding", x => x > 0)).cast("long").as("n_positive"))
      .orderBy($"vec_id")
  }

  val q22Sql: String =
    """SELECT vec_id,
      |  len(embedding) AS dim,
      |  round(CAST(embedding[1] AS DOUBLE), 8) AS first_elem,
      |  round(CAST(list_max(embedding) AS DOUBLE), 8) AS max_elem,
      |  round(CAST(list_min(embedding) AS DOUBLE), 8) AS min_elem,
      |  round(CAST(list_reverse_sort(embedding)[3] AS DOUBLE), 8) AS third_largest,
      |  len(list_filter(embedding, x -> x > 0)) AS n_positive
      |FROM embeddings
      |WHERE vec_id % 20 = 0
      |ORDER BY vec_id""".stripMargin

  /** Map scalar functions: build a map, look up, enumerate keys. */
  def q23MapFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val weights = map(
      lit("click"), lit(1), lit("view"), lit(1),
      lit("purchase"), lit(10), lit("signup"), lit(5), lit("error"), lit(0))
    Tables.events(spark, dir)
      .select($"event_type", coalesce(element_at(weights, $"event_type"), lit(0)).as("w"))
      .groupBy($"event_type", $"w")
      .agg(count(lit(1)).as("n"))
      .withColumn("n_keys", size(map_keys(weights)))
      .orderBy($"event_type")
  }

  val q23Sql: String =
    """SELECT event_type,
      |  CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 1
      |       WHEN 'purchase' THEN 10 WHEN 'signup' THEN 5 ELSE 0 END AS w,
      |  count(*) AS n, 5 AS n_keys
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY event_type""".stripMargin

  /** Full outer join: customers ⋈ orders with both-side nulls surfaced. */
  def q24OuterJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
      .filter($"c_custkey" % 3 === 0)
      .select($"c_custkey", $"c_mktsegment")
    val ord = Tables.orders(spark, dir)
      .filter($"o_custkey" % 2 === 0)
      .groupBy($"o_custkey").agg(count(lit(1)).as("n_orders"))
    cust.join(ord, $"c_custkey" === $"o_custkey", "full_outer")
      .select(
        coalesce($"c_mktsegment", lit("NO_CUSTOMER")).as("segment"),
        coalesce($"n_orders", lit(0L)).as("n_orders"))
      .groupBy($"segment")
      .agg(count(lit(1)).as("n_keys"), sum($"n_orders").as("total_orders"))
      .orderBy($"segment")
  }

  val q24Sql: String =
    """WITH cust AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 3 = 0),
      |     ord AS (SELECT o_custkey, count(*) AS n_orders FROM orders
      |             WHERE o_custkey % 2 = 0 GROUP BY o_custkey)
      |SELECT coalesce(c_mktsegment, 'NO_CUSTOMER') AS segment,
      |  count(*) AS n_keys,
      |  CAST(sum(coalesce(n_orders, 0)) AS BIGINT) AS total_orders
      |FROM cust FULL OUTER JOIN ord ON c_custkey = o_custkey
      |GROUP BY 1
      |ORDER BY segment""".stripMargin

  /** Promo revenue share by ship month (TPC-H Q14 shape): lineitem ⋈ part
    * with the part dimension broadcast (~1e-3 of the fact side), conditional
    * revenue sums per month of 1997. Exact DECIMAL sums cast to DOUBLE, then
    * a single double division — both engines divide bitwise-identical
    * operands, so the ratio hash-matches without any rounding grid. */
  def q26PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .filter(year($"l_shipdate") === 1997)
      .select($"l_partkey", month($"l_shipdate").cast("long").as("ship_month"),
        ($"l_extendedprice".cast("decimal(12,2)") *
          (lit(1).cast("decimal(3,2)") - $"l_discount".cast("decimal(4,2)"))).as("rev"))
    val part = Tables.part(spark, dir).select($"p_partkey", $"p_type")
    li.join(broadcast(part), $"l_partkey" === $"p_partkey")
      .groupBy($"ship_month")
      .agg(
        sum(when($"p_type" === "PROMO", $"rev").otherwise(lit(0).cast("decimal(12,2)")))
          .cast("double").as("promo_rev"),
        sum($"rev").cast("double").as("total_rev"),
        count(lit(1)).as("n_items"))
      .withColumn("promo_share_pct", lit(100.0) * $"promo_rev" / $"total_rev")
      .select($"ship_month", $"promo_share_pct", $"promo_rev", $"total_rev", $"n_items")
      .orderBy($"ship_month")
  }

  val q26Sql: String =
    """WITH m AS (
      |  SELECT CAST(month(l_shipdate) AS BIGINT) AS ship_month,
      |    CAST(sum(CASE WHEN p_type = 'PROMO'
      |             THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
      |                  (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
      |             ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS promo_rev,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |             (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_rev,
      |    count(*) AS n_items
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE year(l_shipdate) = 1997
      |  GROUP BY 1)
      |SELECT ship_month, 100.0 * promo_rev / total_rev AS promo_share_pct,
      |  promo_rev, total_rev, n_items
      |FROM m
      |ORDER BY ship_month""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_outer_join" -> (q24OuterJoin _),
    "q26_promo_revenue" -> (q26PromoRevenue _),
    "q19_grouping_sets" -> (q19GroupingSets _),
    "q20_approx_distinct" -> (q20ApproxDistinct _),
    "q21_percentiles" -> (q21Percentiles _),
    "q25_approx_percentiles" -> (q25ApproxPercentiles _),
    "q22_array_funcs" -> (q22ArrayFuncs _),
    "q23_map_funcs" -> (q23MapFuncs _))

  val oracles: Map[String, String] = Map(
    "q24_outer_join" -> q24Sql,
    "q26_promo_revenue" -> q26Sql,
    "q19_grouping_sets" -> q19Sql,
    "q21_percentiles" -> q21Sql,
    "q22_array_funcs" -> q22Sql,
    "q23_map_funcs" -> q23Sql)
}
