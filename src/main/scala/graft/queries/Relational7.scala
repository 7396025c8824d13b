package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Seventh relational widening — the queries that COMPLETE the TPC-H shape
  * deck. After rounds 1-8 covered Q1/Q2/Q7/Q8/Q10/Q13/Q14/Q15/Q17/Q18/Q19/
  * Q20/Q21/Q22 (q01, q47, q44, q52, q68, q60, q26, q46, q58, q59, q64, q51,
  * q43, q45), the eight shapes still missing were Q3, Q4, Q5, Q6, Q9, Q11,
  * Q12, Q16. This file adds each, adapted to the driver schema where the
  * synthetic tables lack a TPC-H column (no partsupp table, no
  * l_commitdate/l_receiptdate/l_shipmode — the adaptations substitute
  * semantically-equivalent predicates and say so per query). With these,
  * every one of the 22 TPC-H query shapes has a named, oracle-checked
  * implementation.
  *
  * House rules (same as Relational6): every comparison that decides row
  * membership runs in exact DECIMAL arithmetic; doubles appear only in
  * display columns after aggregation; every ORDER BY carries a full
  * tie-break so a LIMIT can never flip rows between engines.
  */
object Relational7 {

  private val ts = (s: String) => lit(s).cast("timestamp")

  /** TPC-H Q3 (shipping priority): revenue of not-yet-shipped lines for
    * BUILDING-segment customers — orders placed before the cutoff whose
    * lines ship after it — top 10 orders by revenue.
    *
    * Scale shape: the segment filter prunes customer BEFORE its join
    * (broadcast — customers-with-segment is the small side after
    * projection to one key column), the date filters are pushed into both
    * fact scans, and the final top-10 lowers to `TakeOrderedAndProject`
    * (per-partition bounded heaps, 10 rows to the driver) — never a global
    * sort of the aggregate. Revenue is exact DECIMAL with the orderkey
    * tie-break inside the same ordering the limit uses. */
  def q71ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cutoff = ts("1996-07-01")
    val cust = Tables.customer(spark, dir)
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" < cutoff)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_orderpriority")
    val li = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" > cutoff)
      .select($"l_orderkey",
        ($"l_extendedprice".cast("decimal(14,2)") *
          (lit(1).cast("decimal(3,2)") - $"l_discount".cast("decimal(4,2)")))
          .as("rev"))
    ord
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(li, $"o_orderkey" === $"l_orderkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(sum($"rev").as("rev_exact"))
      .orderBy($"rev_exact".desc, $"l_orderkey")
      .limit(10)
      .select($"l_orderkey", $"rev_exact".cast("double").as("revenue"),
        $"o_orderdate", $"o_orderpriority")
  }

  val q71Sql: String =
    """SELECT l.l_orderkey,
      |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2)) *
      |      (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
      |    AS DOUBLE) AS revenue,
      |  o.o_orderdate, o.o_orderpriority
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |  AND o.o_orderdate < TIMESTAMP '1996-07-01'
      |  AND l.l_shipdate > TIMESTAMP '1996-07-01'
      |GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
      |ORDER BY sum(CAST(l.l_extendedprice AS DECIMAL(14,2)) *
      |    (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) DESC,
      |  l.l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q4 (order-priority checking): orders in one quarter with at
    * least one "late" line, counted per priority.
    *
    * Adaptation: the driver schema has no l_commitdate/l_receiptdate, so
    * "late" is `l_shipdate > o_orderdate + 30 days` — same EXISTS shape,
    * same join-condition-carries-an-interval wrinkle.
    *
    * Scale shape: EXISTS compiles to a LEFT SEMI join on the order key —
    * the probe stops at the first matching line, no line multiplicity ever
    * reaches the aggregate (counting with an inner join would require a
    * DISTINCT someone always forgets). The quarter filter prunes the
    * orders scan; the interval predicate rides the join, evaluated only on
    * key matches. */
  def q72OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= ts("1997-01-01") &&
        $"o_orderdate" < ts("1997-04-01"))
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    val li = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_shipdate")
    ord
      .join(li, $"l_orderkey" === $"o_orderkey" &&
        $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 30 DAYS"), "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  val q72Sql: String =
    """SELECT o.o_orderpriority, count(*) AS order_count
      |FROM orders o
      |WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1997-04-01'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l
      |    WHERE l.l_orderkey = o.o_orderkey
      |      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o.o_orderpriority
      |ORDER BY o.o_orderpriority""".stripMargin

  /** TPC-H Q5 (local supplier volume): revenue from orders where the
    * supplier and the customer sit in the SAME nation, within one region
    * and one year — the canonical 6-table star join.
    *
    * Scale shape: region→nation→customer is a broadcast chain (the two
    * geo dims are tiny; customer survives only region-filtered), supplier
    * joins broadcast too, and the ONLY repartition-scale shuffle is
    * orders⋈lineitem on the order key. The local-supplier condition
    * (`c_nationkey = s_nationkey`) is an extra equality on an
    * already-joined row, not a join in its own right — phrasing it as one
    * (as the textbook SQL visually suggests) would manufacture a second
    * big-big shuffle. */
  def q73LocalSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val geo = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)
        .filter($"r_name" === "ASIA")), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val cust = Tables.customer(spark, dir)
      .join(broadcast(geo), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_nationkey", $"n_name")
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= ts("1997-01-01") &&
        $"o_orderdate" < ts("1998-01-01"))
      .select($"o_orderkey", $"o_custkey")
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_suppkey",
        ($"l_extendedprice".cast("decimal(14,2)") *
          (lit(1).cast("decimal(3,2)") - $"l_discount".cast("decimal(4,2)")))
          .as("rev"))
    ord
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(li, $"o_orderkey" === $"l_orderkey")
      .join(broadcast(Tables.supplier(spark, dir)
        .select($"s_suppkey", $"s_nationkey")),
        $"l_suppkey" === $"s_suppkey" && $"s_nationkey" === $"c_nationkey")
      .groupBy($"n_name")
      .agg(sum($"rev").as("rev_exact"))
      .orderBy($"rev_exact".desc, $"n_name")
      .select($"n_name", $"rev_exact".cast("double").as("revenue"))
  }

  val q73Sql: String =
    """SELECT n.n_name,
      |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(14,2)) *
      |      (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
      |    AS DOUBLE) AS revenue
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  AND s.s_nationkey = c.c_nationkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE r.r_name = 'ASIA'
      |  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n.n_name
      |ORDER BY sum(CAST(l.l_extendedprice AS DECIMAL(14,2)) *
      |    (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) DESC,
      |  n.n_name""".stripMargin

  /** TPC-H Q6 (forecasting revenue change): one filtered scan, one global
    * sum — the query that exists to prove the scan is the whole plan.
    *
    * Scale shape: all three predicates (date range, discount band,
    * quantity cap) must reach the parquet reader as pushed filters, the
    * scan must read exactly four columns, and the aggregate is
    * partial→final with one row crossing the wire. On 100 TB this query
    * is bounded by bytes-scanned and nothing else — which is why the
    * discount band is compared in DECIMAL(4,2): a double `BETWEEN 0.05
    * AND 0.07` is the classic off-by-one-ulp row-membership bug. */
  def q74RevenueChange(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= ts("1997-01-01") &&
        $"l_shipdate" < ts("1998-01-01") && $"l_quantity" < 24)
      .select($"l_extendedprice".cast("decimal(14,2)").as("price"),
        $"l_discount".cast("decimal(4,2)").as("disc"))
      .filter($"disc".between(
        lit(0.05).cast("decimal(4,2)"), lit(0.07).cast("decimal(4,2)")))
      .agg(sum($"price" * $"disc").cast("double").as("revenue_delta"),
        count(lit(1)).as("n_lines"))
  }

  val q74Sql: String =
    """SELECT
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) *
      |      CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue_delta,
      |  count(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_quantity < 24
      |  AND CAST(l_discount AS DECIMAL(4,2))
      |    BETWEEN CAST(0.05 AS DECIMAL(4,2)) AND CAST(0.07 AS DECIMAL(4,2))""".stripMargin

  /** TPC-H Q9 (product-type profit): profit on 'red'-named parts, per
    * supplier nation per order year.
    *
    * Adaptation: the driver schema has no partsupp, so unit cost is the
    * part's retail price (`ps_supplycost` → `p_retailprice`) — the join
    * graph (part⋈lineitem⋈supplier⋈nation⋈orders) and the
    * profit-as-difference aggregate are unchanged.
    *
    * Scale shape: the LIKE filter prunes part before its join and part is
    * the broadcast side; orders joins on the order key (the one big-big
    * shuffle, shared with the groupBy's own repartition), supplier/nation
    * broadcast. Profit is a DECIMAL difference — revenue and cost carry
    * different scales and the subtraction must not round either side. */
  def q75ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parts = Tables.part(spark, dir)
      .filter($"p_name".like("%red%"))
      .select($"p_partkey", $"p_retailprice".cast("decimal(14,2)").as("cost"))
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey",
        ($"l_extendedprice".cast("decimal(14,2)") *
          (lit(1).cast("decimal(3,2)") - $"l_discount".cast("decimal(4,2)")))
          .as("rev"),
        $"l_quantity".cast("decimal(12,0)").as("qty"))
    val geo = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name")
    li
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .join(broadcast(geo), $"l_suppkey" === $"s_suppkey")
      .join(Tables.orders(spark, dir)
        .select($"o_orderkey", year($"o_orderdate").as("o_year")),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"n_name", $"o_year")
      .agg(sum($"rev" - $"cost" * $"qty").cast("double").as("profit"))
      .orderBy($"n_name", $"o_year".desc)
  }

  val q75Sql: String =
    """SELECT n.n_name, CAST(year(o.o_orderdate) AS INT) AS o_year,
      |  CAST(sum(
      |    CAST(l.l_extendedprice AS DECIMAL(14,2)) *
      |      (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))) -
      |    CAST(p.p_retailprice AS DECIMAL(14,2)) *
      |      CAST(l.l_quantity AS DECIMAL(12,0))) AS DOUBLE) AS profit
      |FROM lineitem l
      |JOIN part p ON l.l_partkey = p.p_partkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE p.p_name LIKE '%red%'
      |GROUP BY n.n_name, year(o.o_orderdate)
      |ORDER BY n.n_name, o_year DESC""".stripMargin

  /** TPC-H Q11 (important stock): per-supplier value that exceeds a fixed
    * fraction of the GLOBAL total — the uncorrelated-scalar-threshold
    * shape.
    *
    * Adaptation: no partsupp, so "value" is discounted line revenue per
    * supplier over the whole fact table (fraction 1/200 = 0.5%).
    *
    * Scale shape: per-supplier value and the global total come from the
    * SAME partial-aggregate pass reused twice (the grouped aggregate is
    * computed once, the total re-aggregates its ~|suppliers| rows — not a
    * second fact scan), and the 1-row total is broadcast-appended. The
    * threshold compare multiplies through by the fraction's denominator
    * (`value * 200 > total`) so it stays in exact DECIMAL — dividing the
    * total by 200 would round. */
  def q76ImportantSuppliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perSupp = Tables.lineitem(spark, dir)
      .select($"l_suppkey",
        ($"l_extendedprice".cast("decimal(14,2)") *
          (lit(1).cast("decimal(3,2)") - $"l_discount".cast("decimal(4,2)")))
          .as("rev"))
      .groupBy($"l_suppkey")
      .agg(sum($"rev").as("value_exact"))
    val total = perSupp.agg(sum($"value_exact").as("total_exact"))
    perSupp
      .crossJoin(broadcast(total))
      .filter($"value_exact" * 200 > $"total_exact")
      .orderBy($"value_exact".desc, $"l_suppkey")
      .select($"l_suppkey", $"value_exact".cast("double").as("value"))
  }

  val q76Sql: String =
    """WITH per_supp AS (
      |  SELECT l_suppkey,
      |    sum(CAST(l_extendedprice AS DECIMAL(14,2)) *
      |        (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
      |      AS value_exact
      |  FROM lineitem GROUP BY l_suppkey)
      |SELECT l_suppkey, CAST(value_exact AS DOUBLE) AS value
      |FROM per_supp
      |WHERE value_exact * 200 > (SELECT sum(value_exact) FROM per_supp)
      |ORDER BY value_exact DESC, l_suppkey""".stripMargin

  /** TPC-H Q12 (shipping-mode / priority split): late lines bucketed by
    * ship year, counting high- vs low-priority orders — the
    * conditional-aggregation-over-a-join shape.
    *
    * Adaptation: no l_shipmode/l_receiptdate — the group key is the ship
    * year and "late" is shipping >60 days after the order date.
    *
    * Scale shape: the CASE counters ride the SAME grouped aggregate (one
    * pass, partial+final) — the naive phrasing as two filtered joins
    * unioned would scan the fact twice. The late predicate prunes rows
    * BEFORE the shuffle: only late lines are aggregated at all. */
  def q77LateByPriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hi = Seq("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_shipdate")
      .join(Tables.orders(spark, dir)
        .select($"o_orderkey", $"o_orderdate", $"o_orderpriority"),
        $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"))
      .groupBy(year($"l_shipdate").as("ship_year"))
      .agg(
        sum($"o_orderpriority".isin(hi: _*).cast("long"))
          .as("high_line_count"),
        sum((!$"o_orderpriority".isin(hi: _*)).cast("long"))
          .as("low_line_count"))
      .orderBy($"ship_year")
  }

  val q77Sql: String =
    """SELECT CAST(year(l.l_shipdate) AS INT) AS ship_year,
      |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      |GROUP BY year(l.l_shipdate)
      |ORDER BY ship_year""".stripMargin

  /** TPC-H Q16 (parts/supplier relationship): how many distinct suppliers
    * ship each (brand, type, size) combination, excluding a blacklisted
    * supplier set — NOT IN + COUNT(DISTINCT) over a many-to-many bridge.
    *
    * Adaptation: the (part, supplier) bridge is DISTINCT pairs observed in
    * lineitem (no partsupp table); the blacklist is negative-balance
    * suppliers (no s_comment to pattern-match).
    *
    * Scale shape: the pair bridge is deduplicated BEFORE the dimension
    * join (distinct on two long keys — the narrowest possible shuffle);
    * the blacklist NOT IN compiles to a broadcast LEFT ANTI join (keys are
    * non-null, so anti join ≡ NOT IN; a nullable blacklist would need the
    * null-aware variant q40 pins). COUNT(DISTINCT suppkey) then runs on
    * rows already unique per (part, supp) — Spark's Expand-based distinct
    * aggregate touches the minimum possible row count. */
  def q78PartsSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sizes = Seq(1, 14, 23, 45, 19, 3, 36, 9)
    val bad = Tables.supplier(spark, dir)
      .filter($"s_acctbal" < 0).select($"s_suppkey")
    val bridge = Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_suppkey").distinct()
      .join(broadcast(bad), $"l_suppkey" === $"s_suppkey", "left_anti")
    bridge
      .join(broadcast(Tables.part(spark, dir)
        .filter($"p_brand" =!= "Brand#45" && $"p_size".isin(sizes: _*))
        .select($"p_partkey", $"p_brand", $"p_type", $"p_size")),
        $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }

  val q78Sql: String =
    """SELECT p.p_brand, p.p_type, p.p_size,
      |  count(DISTINCT b.l_suppkey) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
      |JOIN part p ON b.l_partkey = p.p_partkey
      |WHERE p.p_brand <> 'Brand#45'
      |  AND p.p_size IN (1, 14, 23, 45, 19, 3, 36, 9)
      |  AND b.l_suppkey NOT IN
      |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p.p_brand, p.p_type, p.p_size
      |ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q71_shipping_priority" -> (q71ShippingPriority _),
    "q72_order_priority" -> (q72OrderPriority _),
    "q73_local_supplier_volume" -> (q73LocalSupplierVolume _),
    "q74_revenue_change" -> (q74RevenueChange _),
    "q75_product_profit" -> (q75ProductProfit _),
    "q76_important_suppliers" -> (q76ImportantSuppliers _),
    "q77_late_by_priority" -> (q77LateByPriority _),
    "q78_parts_supplier" -> (q78PartsSupplier _))

  val oracles: Map[String, String] = Map(
    "q71_shipping_priority" -> q71Sql,
    "q72_order_priority" -> q72Sql,
    "q73_local_supplier_volume" -> q73Sql,
    "q74_revenue_change" -> q74Sql,
    "q75_product_profit" -> q75Sql,
    "q76_important_suppliers" -> q76Sql,
    "q77_late_by_priority" -> q77Sql,
    "q78_parts_supplier" -> q78Sql)
}
