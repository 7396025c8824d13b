package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TypedAggregators
import graft.sources.Tables

/** Per-group top-k as an AGGREGATE, not a window — the scale-optimal form
  * of the most common analytics question ("each customer's 3 biggest
  * orders").
  *
  * The window phrasing (`row_number() OVER (PARTITION BY g ORDER BY s)`,
  * q07's shape) shuffles EVERY row to its group's reducer and sorts the
  * whole group, then throws away all but k rows — at 100 TB that is a
  * full-fact shuffle and a per-group sort paid to keep 3 rows per
  * customer. The aggregate phrasing bounds state at k rows per group per
  * partition: map-side partial heaps absorb the fact table locally, the
  * shuffle carries at most k rows per (group, partition), and the final
  * merge is k-vs-k per group. Same answer, shuffle volume reduced from
  * |fact| to ≤ k·|groups|·|partitions| — the difference between a report
  * and a repartition of the lake.
  *
  * Ordering is EXACT: scores are cents-scaled longs (the repo's DECIMAL
  * discipline) with the order key as tiebreak, so heap eviction can never
  * disagree with the oracle's ORDER BY on a double ulp. */
object GroupTopK {

  /** Each customer's top-3 orders by total price, via the
    * [[TypedAggregators.TopKBy]] partial-heap aggregate. */
  def q81GroupTopkAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val topk = udaf(new TypedAggregators.TopKBy(3))
    Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey",
        ($"o_totalprice".cast("decimal(14,2)") * 100)
          .cast("long").as("cents"))
      .groupBy($"o_custkey")
      .agg(topk($"cents", $"o_orderkey").as("top"))
      .select($"o_custkey", posexplode($"top").as(Seq("pos", "t")))
      .select($"o_custkey", ($"pos" + 1).cast("long").as("rank"),
        $"t._2".as("o_orderkey"),
        ($"t._1".cast("double") / 100.0).as("price"))
      .orderBy($"o_custkey", $"rank")
  }

  val q81Sql: String =
    """WITH ranked AS (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(o_totalprice AS DECIMAL(14,2)) AS p,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY CAST(o_totalprice AS DECIMAL(14,2)) DESC, o_orderkey)
      |      AS rank
      |  FROM orders)
      |SELECT o_custkey, rank, o_orderkey,
      |  CAST(CAST(p * 100 AS BIGINT) AS DOUBLE) / 100.0 AS price
      |FROM ranked WHERE rank <= 3
      |ORDER BY o_custkey, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q81_group_topk_agg" -> (q81GroupTopkAgg _))

  val oracles: Map[String, String] = Map(
    "q81_group_topk_agg" -> q81Sql)
}
