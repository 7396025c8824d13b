package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Sixth relational widening — decorrelation and aggregation shapes the
  * surface had not yet composed, plus the scale-native exact-distinct and
  * higher-order-function faces:
  *
  *   - q58: per-group average as a correlated threshold (TPC-H Q17 shape) —
  *     the classic "l_quantity < 0.2 * avg over the same part" predicate,
  *     decorrelated to ONE windowed pass over the brand-pruned fact slice
  *     instead of a per-row subquery.
  *   - q59: HAVING-filtered aggregate rejoined to its own detail (TPC-H Q18
  *     shape) — big-quantity orders found by a grouped HAVING, then the
  *     surviving keys pull the order/customer detail back in.
  *   - q60: outer join with an ON-clause-only predicate + distribution of
  *     counts (TPC-H Q13 shape) — the predicate must filter the JOIN, not
  *     the customers, so zero-order customers survive into the histogram.
  *   - q61: exact distinct counting via bitmap aggregation (the
  *     Expand-free two-level form that scales where COUNT(DISTINCT) shuffles
  *     every distinct value).
  *   - q62: higher-order array functions (transform/filter/aggregate/
  *     zip_with/reverse) over the embeddings corpus.
  *   - q63: collation-aware grouping (Spark 4 UTF8_LCASE) — case-insensitive
  *     group keys without the lower() rewrite leaking into the output.
  *
  * All threshold comparisons run in exact arithmetic (integral-valued
  * quantities cast to DECIMAL; cents-scaled money), so rows cannot flip
  * between engines on a double ulp.
  */
object Relational6 {

  /** TPC-H Q17 shape (small-quantity order revenue): line items of selected
    * brands whose quantity is below 20% of that part's average quantity;
    * the revenue lost to such small orders, per brand and per year-ish
    * (divided by 7 like the original).
    *
    * Decorrelation: the textbook phrasing is a correlated scalar subquery
    * (`WHERE l_quantity < (SELECT 0.2*avg(l_quantity) FROM lineitem WHERE
    * l_partkey = outer.l_partkey)`). Executing that per row is quadratic;
    * re-aggregating and joining back costs a second scan. This plan does
    * NEITHER: the brand dimension prunes first (broadcast — part is the
    * small side), then ONE window over `l_partkey` attaches (sum_qty, cnt)
    * to every surviving row, so the fact slice is scanned once and shuffled
    * once (on l_partkey). The threshold `l_quantity < 0.2 * sum/cnt` is
    * evaluated as `5 * qty * cnt < sum` — all integral DECIMAL products, no
    * double division anywhere near the comparison.
    *
    * Scale shape: the window partitions by l_partkey — at 100 TB that is
    * the same shuffle a groupBy would pay, with perfect key uniformity
    * (partkey is near-unique-ish and unskewed), and the brand pruning means
    * only the ~2/55 of the fact with matching parts enters it. The revenue
    * sum is exact DECIMAL; the /7.0 is a display-only double. */
  def q58SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parts = Tables.part(spark, dir)
      .filter($"p_brand".isin("Brand#12", "Brand#23"))
      .select($"p_partkey", $"p_brand")
    val slice = Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_quantity", $"l_extendedprice")
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
    val w = Window.partitionBy($"l_partkey")
    slice
      .withColumn("qty_exact", $"l_quantity".cast("decimal(12,0)"))
      .withColumn("sum_qty", sum($"qty_exact").over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter($"qty_exact" * 5 * $"cnt" < $"sum_qty")
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_small"),
        (sum($"l_extendedprice".cast("decimal(14,2)")).cast("double") / 7.0)
          .as("avg_yearly"))
      .orderBy($"p_brand")
  }

  val q58Sql: String =
    """WITH slice AS (
      |  SELECT l.l_partkey, p.p_brand,
      |    CAST(l.l_quantity AS DECIMAL(12,0)) AS qty_exact,
      |    l.l_extendedprice
      |  FROM lineitem l
      |  JOIN part p ON l.l_partkey = p.p_partkey
      |  WHERE p.p_brand IN ('Brand#12', 'Brand#23')),
      |win AS (
      |  SELECT p_brand, qty_exact, l_extendedprice,
      |    sum(qty_exact) OVER (PARTITION BY l_partkey) AS sum_qty,
      |    count(*) OVER (PARTITION BY l_partkey) AS cnt
      |  FROM slice)
      |SELECT p_brand, count(*) AS n_small,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / 7.0
      |    AS avg_yearly
      |FROM win
      |WHERE qty_exact * 5 * cnt < sum_qty
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  /** TPC-H Q18 shape (large-volume orders): orders whose total quantity
    * exceeds 170, rejoined to order and customer detail.
    *
    * The grouped HAVING runs FIRST and on the narrowest possible columns
    * (orderkey, quantity) — the aggregate's output is a tiny fraction of
    * the fact table (the >170 tail), and THAT side drives the detail joins.
    * Under AQE the filtered aggregate falls below the broadcast threshold
    * and both detail joins become broadcasts; the orders/customer scans are
    * never shuffled on a 100 TB input (spec-pinned: no sort-merge join on
    * the detail legs at test scale). Quantities are integral → the
    * DECIMAL(12,0) sum is exact, and the HAVING threshold is an integer
    * compare. */
  def q59BigOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val big = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_quantity".cast("decimal(12,0)").as("qty"))
      .groupBy($"l_orderkey")
      .agg(sum($"qty").as("total_qty"))
      .filter($"total_qty" > 170)
    big
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"o_orderkey",
        $"o_orderdate", $"o_totalprice",
        $"total_qty".cast("long").as("total_qty"))
      .orderBy($"o_orderkey")
  }

  val q59Sql: String =
    """SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
      |  o.o_totalprice, CAST(b.total_qty AS BIGINT) AS total_qty
      |FROM (
      |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,0))) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING sum(CAST(l_quantity AS DECIMAL(12,0))) > 170) b
      |JOIN orders o ON b.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |ORDER BY o.o_orderkey""".stripMargin

  /** TPC-H Q13 shape (customer order-count distribution): how many
    * customers placed exactly k non-urgent orders, INCLUDING k = 0.
    *
    * The semantics corner is the ON-clause-only predicate: the priority
    * filter must restrict which orders MATCH, not which customers appear —
    * pushing it to a WHERE after the join would silently drop the zero-order
    * customers that are the whole point of the histogram. The plan is a
    * LEFT OUTER equi-join with the filter applied on the orders side before
    * the join (Catalyst pushes an ON-clause predicate that references only
    * the inner side into the inner scan — free pruning, same semantics),
    * then two aggregations: count per customer, then customers per count.
    *
    * Scale shape: orders pre-filtered before its shuffle; the first
    * aggregate's key is c_custkey (the join key — no second shuffle between
    * join and count thanks to co-partitioning), and the second aggregate's
    * input is one row per customer with a tiny integer key. count(o_orderkey)
    * counts only matched rows (NULL-skipping) — the exact outer-join
    * count-vs-count trap q49 pins in isolation, exercised here inside a
    * composition. */
  def q60CustDist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir).select($"c_custkey")
    val ord = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_orderpriority")
    val joined = cust.join(ord,
      $"c_custkey" === $"o_custkey" && $"o_orderpriority" =!= "1-URGENT",
      "left_outer")
    joined
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  val q60Sql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      |  FROM customer c
      |  LEFT OUTER JOIN orders o
      |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      |  GROUP BY c.c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Exact distinct users per event type via BITMAP aggregation — the
    * Expand-free form of COUNT(DISTINCT) that scales.
    *
    * Why not COUNT(DISTINCT) at 100 TB: Spark plans it as a two-phase
    * distinct aggregate — every distinct (type, user) pair survives the
    * first shuffle, so the shuffle volume is the distinct cardinality. The
    * bitmap form buckets user ids into fixed 32k-bit segments
    * (`bitmap_bucket_number` / `bitmap_bit_position`), builds one ≤4 KB
    * bitmap per (type, bucket) on the map side, ORs bitmaps in the reduce —
    * shuffle volume is (types × occupied buckets × 4 KB) regardless of how
    * many billions of distinct ids there are, and the result is EXACT
    * (oracle-checked against COUNT(DISTINCT) — not an approximation like
    * q20's HLL). This is the idiom to reach for when HLL's ±2% is not
    * acceptable but the distinct count is too big to shuffle raw.
    *
    * The bitmap functions have no Scala DSL binding — `expr(...)` is the
    * supported spelling (they are registered SQL functions, not UDFs; the
    * whole aggregate stays codegen-eligible). */
  def q61BitmapDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_type", $"user_id")
      .groupBy($"event_type", expr("bitmap_bucket_number(user_id)").as("bucket"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))").as("bm"))
      .groupBy($"event_type")
      .agg(sum(expr("bitmap_count(bm)")).as("n_users"))
      .orderBy($"event_type")
  }

  val q61Sql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Higher-order array functions over the embeddings corpus: per vector,
    * its dimensionality, positive-component count (filter), L2 norm-squared
    * (aggregate — a left fold, same IEEE order both engines), and the
    * palindromic dot product vec·reverse(vec) (zip_with + aggregate).
    *
    * Everything runs INSIDE the row: no explode, no shuffle, no UDF — the
    * lambdas are Catalyst expressions evaluated per-row over the array
    * column, so a 100 TB embedding store pays exactly one scan and zero
    * exchanges (the final orderBy is display-only; spec pins the
    * shuffle-free pre-sort plan). Floats are cast to double BEFORE any
    * arithmetic so both engines fold the identical operand sequence. */
  def q62HigherOrder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select($"vec_id",
        transform($"embedding", x => x.cast("double")).as("v"))
      .select($"vec_id",
        size($"v").as("n_dims"),
        size(filter($"v", x => x > 0d)).as("n_pos"),
        aggregate($"v", lit(0d), (acc, x) => acc + x * x).as("norm2"),
        aggregate(zip_with($"v", reverse($"v"), (a, b) => a * b),
          lit(0d), (acc, x) => acc + x).as("dot_rev"))
      .orderBy($"vec_id")
  }

  val q62Sql: String =
    """WITH v AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings)
      |SELECT vec_id,
      |  CAST(len(v) AS INTEGER) AS n_dims,
      |  CAST(len(list_filter(v, x -> x > 0)) AS INTEGER) AS n_pos,
      |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    list_transform(v, x -> x * x)), (acc, x) -> acc + x) AS norm2,
      |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    list_transform(list_zip(v, list_reverse(v)),
      |      p -> p[1] * p[2])), (acc, x) -> acc + x) AS dot_rev
      |FROM v
      |ORDER BY vec_id""".stripMargin

  /** Collation-aware grouping (Spark 4): group document sources
    * case-insensitively via the UTF8_LCASE collation instead of a lower()
    * rewrite. The corpus sources are single-case, so the query first
    * derives a mixed-case face deterministically (odd doc_ids report
    * upper-cased sources — modelling the ingest-time case drift a real
    * lake accretes), then groups on the collated column.
    *
    * Collation beats the lower() rewrite in two ways that matter at scale:
    * the group key keeps a REPRESENTATIVE original spelling (min — here the
    * uppercase one, pinned deterministic) rather than a lossy lowercase
    * projection, and comparison happens in the hash function itself — no
    * derived column materializes through the shuffle. The oracle mirrors
    * with GROUP BY lower(); the output key is normalized (upper of the min)
    * so both engines agree on the displayed spelling. */
  def q63Collation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", $"n_chars",
        when($"doc_id" % 2 === 1, upper($"source")).otherwise($"source")
          .as("src_mixed"))
      .groupBy(collate($"src_mixed", "UTF8_LCASE").as("src_key"))
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").as("total_chars"))
      // which case survives as the group key is collation-nondeterministic
      // (the class members compare EQUAL) — upper() collapses that to one
      // deterministic spelling; the cast drops the collation from the output
      .select(upper($"src_key".cast("string")).as("source_norm"),
        $"n_docs", $"total_chars")
      .orderBy($"source_norm")
  }

  val q63Sql: String =
    """WITH m AS (
      |  SELECT doc_id, n_chars,
      |    CASE WHEN doc_id % 2 = 1 THEN upper(source) ELSE source END
      |      AS src_mixed
      |  FROM documents)
      |SELECT upper(min(src_mixed)) AS source_norm,
      |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM m
      |GROUP BY lower(src_mixed)
      |ORDER BY source_norm""".stripMargin

  /** TPC-H Q19 shape (disjunctive multi-table predicate): revenue from
    * three brand/size/quantity tiers, written as one OR-of-ANDs filter over
    * the joined tables — the shape that punishes engines which can't tear
    * a disjunction apart for pushdown.
    *
    * What Catalyst does with it (spec-pinned): conjunctive-normal-form
    * extraction pulls the table-local factors out of the OR — the part
    * scan receives `(brand=12 ∧ size∈[1,15]) ∨ (brand=23 ∧ …) ∨ …` and the
    * lineitem scan receives the quantity-range union — so BOTH scans prune
    * before the join instead of the join output being filtered after the
    * fact. At 100 TB the quantity disjunction alone drops ~2/3 of the fact
    * rows at the reader. The residual cross-table disjunction then runs on
    * the survivors. Quantity compares the RAW double column against
    * integer bounds (exact for integral values, and — unlike a DECIMAL
    * cast, which would wrap the column and block parquet filter pushdown —
    * it reaches the scan); revenue sums exact DECIMAL, displays double. */
  def q64DisjunctiveTiers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_quantity", $"l_extendedprice", $"l_discount")
    val part = Tables.part(spark, dir).select($"p_partkey", $"p_brand", $"p_size")
    def tier(brand: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int) =
      $"p_brand" === brand && $"p_size".between(szLo, szHi) &&
        $"l_quantity".between(qLo.toDouble, qHi.toDouble)
    li.join(part, $"l_partkey" === $"p_partkey")
      .filter(tier("Brand#12", 1, 15, 1, 11) ||
        tier("Brand#23", 16, 30, 10, 20) ||
        tier("Brand#5", 31, 50, 20, 30))
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_lines"),
        sum($"l_extendedprice".cast("decimal(14,2)") *
          (lit(1).cast("decimal(3,2)") - $"l_discount".cast("decimal(4,2)")))
          .cast("double").as("revenue"))
      .orderBy($"p_brand")
  }

  val q64Sql: String =
    """SELECT p_brand, count(*) AS n_lines,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) *
      |           (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
      |       AS DOUBLE) AS revenue
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 16 AND 30
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#5' AND p_size BETWEEN 31 AND 50
      |       AND l_quantity BETWEEN 20 AND 30)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  /** Map-typed higher-order functions (the MapType face of q62's array
    * lambdas): per user, build an event_type→count map, derive
    * share-of-total per entry with `transform_values`, keep dominant
    * entries with `map_filter`, and explode the surviving map back to rows.
    *
    * The map machinery is internal to the plan — `map_from_entries` over a
    * collected struct list (entry order is collection-order-nondeterministic
    * but map SEMANTICS are order-free, and the exploded output re-sorts),
    * and both lambdas are per-row Catalyst expressions. Shares are exact
    * integral parts-per-million via `div` (long division) — `v * 1000000`
    * stays well inside long for any real count, where a double ratio would
    * lose integer precision past 2^53 and could flip the ≥20% cut between
    * engines. One shuffle total (the (user, type) count); the map build
    * rides the same grouped pass. */
  def q65MapFunctions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("cnt"))
      .groupBy($"user_id")
      .agg(map_from_entries(collect_list(struct($"event_type", $"cnt")))
        .as("counts"))
      .withColumn("n_types", size($"counts"))
      .withColumn("total", aggregate(map_values($"counts"), lit(0L), _ + _))
      .withColumn("shares",
        expr("transform_values(counts, (k, v) -> (v * 1000000L) div total)"))
      .withColumn("big", expr("map_filter(shares, (k, v) -> v >= 200000)"))
      .select($"user_id", $"n_types", $"total", explode($"big"))
      .toDF("user_id", "n_types", "total_events", "event_type", "share_ppm")
      .select($"user_id", $"event_type", $"n_types", $"total_events", $"share_ppm")
      .orderBy($"user_id", $"event_type")
  }

  val q65Sql: String =
    """WITH c AS (
      |  SELECT user_id, event_type, count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |t AS (
      |  SELECT user_id, CAST(count(*) AS INTEGER) AS n_types,
      |    sum(cnt) AS total_events
      |  FROM c GROUP BY 1)
      |SELECT c.user_id, c.event_type, t.n_types,
      |  CAST(t.total_events AS BIGINT) AS total_events,
      |  CAST((c.cnt * 1000000) // t.total_events AS BIGINT) AS share_ppm
      |FROM c JOIN t USING (user_id)
      |WHERE (c.cnt * 1000000) // t.total_events >= 200000
      |ORDER BY user_id, event_type""".stripMargin

  /** The regexp scalar family over semi-structured payloads (the log-
    * scraping face: extract / extract_all / replace / like over
    * `events.props` JSON strings): per event type, how many payloads carry
    * digits, total digit runs, the max extracted `"k"` value, and the
    * digit-normalized payload template.
    *
    * Cross-engine regex discipline: patterns stay inside the Java∩RE2
    * common dialect (literal space instead of `\s` — RE2's `\s` differs on
    * `\x0B`, the OracleFragments lesson), and the extracted string goes
    * through an explicit empty→NULL guard BEFORE the long cast — Spark 4
    * runs ANSI mode by default, where cast('' AS BIGINT) is a runtime
    * error, and DuckDB errors identically (TRY_CAST would silently mask
    * real garbage instead).
    *
    * Scale shape: all four regex ops are per-row scalar projections
    * folded into the single (type) aggregate pass — one scan, one
    * map-side-combinable shuffle. */
  def q66RegexFamily(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = regexp_extract($"props", "\"k\": ([0-9]+)", 1)
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when($"props".rlike("[0-9]"), 1L).otherwise(0L))
          .as("n_digit_props"),
        sum(size(regexp_extract_all($"props", lit("[0-9]+"), lit(0))))
          .cast("long").as("digit_runs"),
        max(when(k =!= "", k).cast("long")).as("max_k"),
        min(regexp_replace($"props", "[0-9]+", "N")).as("template"))
      .orderBy($"event_type")
  }

  val q66Sql: String =
    """SELECT event_type,
      |  count(*) AS n_events,
      |  CAST(sum(CASE WHEN regexp_matches(props, '[0-9]') THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_digit_props,
      |  CAST(sum(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT)
      |    AS digit_runs,
      |  max(CAST(nullif(regexp_extract(props, '"k": ([0-9]+)', 1), '')
      |           AS BIGINT)) AS max_k,
      |  min(regexp_replace(props, '[0-9]+', 'N', 'g')) AS template
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Schema-drift union (the lake-merge face): a pre-upgrade writer's
    * snapshot lacks columns the current writer emits (`lang`, `n_chars`
    * here); `unionByName(allowMissingColumns = true)` aligns by NAME and
    * NULL-fills the gaps — positional `union` would silently mis-bind
    * columns or reject. Downstream then repairs what it can (`n_chars`
    * recomputes from the text; `lang` stays honestly NULL and is counted).
    * The per-source report a backfill job runs before/after migration.
    *
    * This is [[graft.sources.Store]].read's `mergeSchema` behavior
    * expressed at the API level: both are the same decision — align by
    * name, NULL the holes, never bind by position. */
  def q67SchemaDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val oldSnap = docs.filter($"doc_id" % 3 === 0)
      .select($"doc_id", $"text", $"source") // pre-upgrade writer: 3 cols
    val newSnap = docs.filter($"doc_id" % 3 =!= 0)
    val merged = oldSnap.unionByName(newSnap, allowMissingColumns = true)
    merged
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"lang".isNull.cast("long")).as("n_missing_lang"),
        // repairable hole: recompute chars from the text we do have
        sum(coalesce($"n_chars", length($"text").cast("long")))
          .as("total_chars"))
      .orderBy($"source")
  }

  val q67Sql: String =
    """WITH merged AS (
      |  SELECT doc_id, text, source,
      |    CAST(NULL AS VARCHAR) AS lang, CAST(NULL AS BIGINT) AS n_chars
      |  FROM documents WHERE doc_id % 3 = 0
      |  UNION ALL
      |  SELECT doc_id, text, source, lang, n_chars
      |  FROM documents WHERE doc_id % 3 <> 0)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_missing_lang,
      |  CAST(sum(coalesce(n_chars, length(text))) AS BIGINT) AS total_chars
      |FROM merged
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** TPC-H Q10 shape (top customers by returned-item revenue): aggregate
    * the 'R'-flagged line revenue per customer, keep only the TOP 20.
    *
    * The plan face this adds: a global LIMIT over an ordered aggregate
    * must NOT become a full sort of the aggregate output — Spark lowers
    * ORDER BY + LIMIT k to `TakeOrderedAndProject` (per-partition bounded
    * heaps of k rows, then a k-row merge on one reducer), so the
    * "sort" cost is O(n log k) map-side with k rows crossing the wire —
    * at 100 TB, the difference between a top-20 report and a full
    * customer-table range shuffle (spec-pinned: TakeOrderedAndProject
    * present, no global Sort exchange above the aggregate).
    *
    * Determinism: revenue ties break by c_custkey inside the SAME ordering
    * the limit uses, and revenue itself is exact DECIMAL — a double
    * revenue could flip rank 20/21 between engines. The returnflag filter
    * prunes the fact scan before its shuffle. */
  def q68TopReturns(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val returns = Tables.lineitem(spark, dir)
      .filter($"l_returnflag" === "R")
      .select($"l_orderkey",
        ($"l_extendedprice".cast("decimal(14,2)") *
          (lit(1).cast("decimal(3,2)") - $"l_discount".cast("decimal(4,2)")))
          .as("rev"))
    returns
      .join(Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey")
      .agg(sum($"rev").as("rev_exact"), count(lit(1)).as("n_return_lines"))
      .join(broadcast(Tables.customer(spark, dir)
        .select($"c_custkey", $"c_name", $"c_nationkey")),
        $"o_custkey" === $"c_custkey")
      .orderBy($"rev_exact".desc, $"c_custkey")
      .limit(20)
      .select($"c_custkey", $"c_name", $"c_nationkey",
        $"rev_exact".cast("double").as("revenue"),
        $"n_return_lines")
  }

  val q68Sql: String =
    """SELECT c.c_custkey, c.c_name, c.c_nationkey,
      |  CAST(r.rev_exact AS DOUBLE) AS revenue, r.n_return_lines
      |FROM (
      |  SELECT o.o_custkey,
      |    sum(CAST(l.l_extendedprice AS DECIMAL(14,2)) *
      |        (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
      |      AS rev_exact,
      |    count(*) AS n_return_lines
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE l.l_returnflag = 'R'
      |  GROUP BY o.o_custkey) r
      |JOIN customer c ON r.o_custkey = c.c_custkey
      |ORDER BY r.rev_exact DESC, c.c_custkey
      |LIMIT 20""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q68_top_returns" -> (q68TopReturns _),
    "q67_schema_drift" -> (q67SchemaDrift _),
    "q66_regex_family" -> (q66RegexFamily _),
    "q65_map_functions" -> (q65MapFunctions _),
    "q64_disjunctive_tiers" -> (q64DisjunctiveTiers _),
    "q58_small_qty_revenue" -> (q58SmallQtyRevenue _),
    "q59_big_orders" -> (q59BigOrders _),
    "q60_custdist" -> (q60CustDist _),
    "q61_bitmap_distinct" -> (q61BitmapDistinct _),
    "q62_higher_order" -> (q62HigherOrder _),
    "q63_collation" -> (q63Collation _))

  val oracles: Map[String, String] = Map(
    "q68_top_returns" -> q68Sql,
    "q67_schema_drift" -> q67Sql,
    "q66_regex_family" -> q66Sql,
    "q65_map_functions" -> q65Sql,
    "q64_disjunctive_tiers" -> q64Sql,
    "q58_small_qty_revenue" -> q58Sql,
    "q59_big_orders" -> q59Sql,
    "q60_custdist" -> q60Sql,
    "q61_bitmap_distinct" -> q61Sql,
    "q62_higher_order" -> q62Sql,
    "q63_collation" -> q63Sql)
}
