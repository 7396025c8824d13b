package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Declarative data-quality expectations — the admission gate a production
  * corpus pipeline runs before training data is allowed in: uniqueness,
  * non-emptiness, internal consistency, domain membership, value ranges,
  * referential integrity, and freshness, each reported as one row
  * (expectation, n_violations, min_bad_key) so a green run is auditable and
  * a red run names the first offending key deterministically.
  *
  * Scale shape — rules fold into the minimum number of passes:
  *   - all ROW-LEVEL rules on a table evaluate in ONE conditional-aggregate
  *     scan (`sum(CASE)`/`min(CASE)` per rule — map-side combined, no
  *     shuffle beyond the 1-row final agg), never one scan per rule;
  *   - UNIQUENESS is a groupBy on the key with `HAVING count > 1` — the
  *     only rule that genuinely needs a key shuffle, and it ships only
  *     (key, count) pairs;
  *   - REFERENTIAL rules are left-anti equi-joins that reduce immediately
  *     to (count, min key) — ids-only shuffles, no broadcast assumption on
  *     the parent side (at 100 TB both sides are big; AQE picks BHJ when
  *     the parent fits);
  *   - the report itself is ≤ one row per rule — union of 1-row aggregates.
  *
  * The synthetic corpus genuinely violates two rules (late line-item
  * shipments past the 2001-01-01 freshness bound; documents under 200
  * chars), so the report demonstrates nonzero accounting on real data while
  * the remaining rules pin the clean-table zeros. ExpectationsSpec injects
  * corrupted fixtures (duplicate keys, orphan FKs, out-of-range rows) to
  * prove each rule actually fires.
  */
object Expectations {

  /** Driver face over the standard tables. */
  def check(spark: SparkSession, dir: String): DataFrame =
    checkTables(
      Tables.documents(spark, dir),
      Tables.orders(spark, dir),
      Tables.lineitem(spark, dir),
      Tables.customer(spark, dir))

  /** Fixture entry point: same report over any four conforming tables. */
  def checkTables(docs: DataFrame, orders: DataFrame, lineitem: DataFrame,
                  customer: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    // evaluate a table's row-level rules in ONE conditional-aggregate scan,
    // then explode the single result row into one report row per rule
    def rowRules(table: DataFrame,
                 rules: Seq[(String, org.apache.spark.sql.Column, org.apache.spark.sql.Column)]): DataFrame = {
      val aggCols = rules.zipWithIndex.flatMap { case ((_, violated, key), i) =>
        Seq(sum(when(violated, 1L).otherwise(0L)).as(s"v$i"),
          min(when(violated, key)).as(s"k$i"))
      }
      table.agg(aggCols.head, aggCols.tail: _*)
        .select(explode(array(rules.zipWithIndex.map { case ((name, _, _), i) =>
          struct(lit(name).as("expectation"),
            coalesce(col(s"v$i"), lit(0L)).cast("long").as("n_violations"),
            col(s"k$i").cast("long").as("min_bad_key"))
        }: _*)).as("r"))
        .select($"r.expectation", $"r.n_violations", $"r.min_bad_key")
    }

    // documents: four row-level rules, ONE scan
    val docRows = rowRules(docs, Seq(
      ("docs_text_nonempty", $"text".isNull || length($"text") === 0, $"doc_id"),
      ("docs_nchars_consistent", $"n_chars" =!= length($"text"), $"doc_id"),
      ("docs_min_length_200", length($"text") < 200, $"doc_id"),
      ("docs_lang_allowed", !$"lang".isin("en", "zh", "es", "de", "fr"), $"doc_id")))

    // uniqueness: the one rule that needs a key shuffle — (key, count) only
    val dupDocs = docs.groupBy($"doc_id").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" > 1)
      .agg(coalesce(sum($"cnt" - 1), lit(0L)).cast("long").as("n_violations"),
        min($"doc_id").cast("long").as("min_bad_key"))
      .select(lit("docs_docid_unique").as("expectation"), $"n_violations", $"min_bad_key")

    // orders: row-level rules in one scan
    val orderRows = rowRules(orders, Seq(
      ("orders_price_positive", $"o_totalprice" <= 0, $"o_orderkey")))

    // lineitem: quantity range + freshness, one scan
    val liRows = rowRules(lineitem, Seq(
      ("lineitem_qty_range", $"l_quantity" < 1 || $"l_quantity" > 50, $"l_orderkey"),
      ("lineitem_ship_before_2001",
        $"l_shipdate" >= lit("2001-01-01").cast("timestamp"), $"l_orderkey")))

    // referential integrity: anti joins reduced to (count, min key)
    val orphanOrders = orders.select($"o_orderkey", $"o_custkey")
      .join(customer.select($"c_custkey"), $"o_custkey" === $"c_custkey", "left_anti")
      .agg(count(lit(1)).cast("long").as("n_violations"),
        min($"o_orderkey").cast("long").as("min_bad_key"))
      .select(lit("orders_custkey_fk").as("expectation"), $"n_violations", $"min_bad_key")
    val orphanLines = lineitem.select($"l_orderkey")
      .join(orders.select($"o_orderkey"), $"l_orderkey" === $"o_orderkey", "left_anti")
      .agg(count(lit(1)).cast("long").as("n_violations"),
        min($"l_orderkey").cast("long").as("min_bad_key"))
      .select(lit("lineitem_orderkey_fk").as("expectation"), $"n_violations", $"min_bad_key")

    docRows
      .unionAll(dupDocs)
      .unionAll(orderRows)
      .unionAll(liRows)
      .unionAll(orphanOrders)
      .unionAll(orphanLines)
      .orderBy($"expectation")
  }

  val checkSql: String =
    """SELECT * FROM (
      |  SELECT 'docs_text_nonempty' AS expectation,
      |    CAST(coalesce(sum(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 END), 0) AS BIGINT) AS n_violations,
      |    CAST(min(CASE WHEN text IS NULL OR length(text) = 0 THEN doc_id END) AS BIGINT) AS min_bad_key
      |  FROM documents
      |  UNION ALL
      |  SELECT 'docs_nchars_consistent',
      |    CAST(coalesce(sum(CASE WHEN n_chars <> length(text) THEN 1 END), 0) AS BIGINT),
      |    CAST(min(CASE WHEN n_chars <> length(text) THEN doc_id END) AS BIGINT)
      |  FROM documents
      |  UNION ALL
      |  SELECT 'docs_min_length_200',
      |    CAST(coalesce(sum(CASE WHEN length(text) < 200 THEN 1 END), 0) AS BIGINT),
      |    CAST(min(CASE WHEN length(text) < 200 THEN doc_id END) AS BIGINT)
      |  FROM documents
      |  UNION ALL
      |  SELECT 'docs_lang_allowed',
      |    CAST(coalesce(sum(CASE WHEN lang NOT IN ('en','zh','es','de','fr') THEN 1 END), 0) AS BIGINT),
      |    CAST(min(CASE WHEN lang NOT IN ('en','zh','es','de','fr') THEN doc_id END) AS BIGINT)
      |  FROM documents
      |  UNION ALL
      |  SELECT 'docs_docid_unique',
      |    CAST(coalesce(sum(cnt - 1), 0) AS BIGINT), CAST(min(doc_id) AS BIGINT)
      |  FROM (SELECT doc_id, count(*) AS cnt FROM documents GROUP BY doc_id HAVING count(*) > 1)
      |  UNION ALL
      |  SELECT 'orders_price_positive',
      |    CAST(coalesce(sum(CASE WHEN o_totalprice <= 0 THEN 1 END), 0) AS BIGINT),
      |    CAST(min(CASE WHEN o_totalprice <= 0 THEN o_orderkey END) AS BIGINT)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'lineitem_qty_range',
      |    CAST(coalesce(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END), 0) AS BIGINT),
      |    CAST(min(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN l_orderkey END) AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem_ship_before_2001',
      |    CAST(coalesce(sum(CASE WHEN l_shipdate >= TIMESTAMP '2001-01-01' THEN 1 END), 0) AS BIGINT),
      |    CAST(min(CASE WHEN l_shipdate >= TIMESTAMP '2001-01-01' THEN l_orderkey END) AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'orders_custkey_fk',
      |    CAST(count(*) AS BIGINT), CAST(min(o_orderkey) AS BIGINT)
      |  FROM orders o WHERE NOT EXISTS
      |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |  UNION ALL
      |  SELECT 'lineitem_orderkey_fk',
      |    CAST(count(*) AS BIGINT), CAST(min(l_orderkey) AS BIGINT)
      |  FROM lineitem l WHERE NOT EXISTS
      |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |) ORDER BY expectation""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "prep_expectations" -> (check _))

  val oracles: Map[String, String] = Map(
    "prep_expectations" -> checkSql)
}
