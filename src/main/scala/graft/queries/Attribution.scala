package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Last-touch conversion attribution — the events-analytics shape the
  * funnel/retention/paths family did not yet cover: every purchase is
  * credited to the LAST non-purchase event the user produced in the 7
  * days strictly before it ("organic" when the window is empty), and
  * conversions roll up per credited channel.
  *
  * One window pass expresses it: a time-RANGE frame (`[t−7d, t−1µs]`,
  * value-based — q36's frame discipline) under an IGNORE NULLS `last`
  * (q48's value-function discipline) picks the credited channel for EVERY
  * event in the same scan that the purchase filter then prunes; no
  * self-join of purchases against history, which is the quadratic
  * phrasing this operator replaces. The frame orders by microsecond
  * epoch, unique per user in this corpus — a tie would make "last"
  * engine-dependent, so uniqueness is asserted by the spec, not assumed.
  *
  * Scale shape: one shuffle on user_id (the same partitioning every
  * per-user events operator shares), frame state bounded by the 7-day
  * density; the rollup is aggregate-sized. */
object Attribution {

  private val WindowMicros = 7L * 86400 * 1000000

  def eventsAttribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", unix_micros($"ts").as("tus"), $"event_type")
    val w = Window.partitionBy($"user_id").orderBy($"tus")
      .rangeBetween(-WindowMicros, -1)
    ev
      .withColumn("chan", coalesce(
        last(when($"event_type" =!= "purchase", $"event_type"),
          ignoreNulls = true).over(w),
        lit("organic")))
      .filter($"event_type" === "purchase")
      .groupBy($"chan")
      .agg(count(lit(1)).as("n_purchases"),
        countDistinct($"user_id").as("n_buyers"))
      .orderBy($"chan")
  }

  val eventsAttributionSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, epoch_us(ts) AS tus, event_type FROM events),
       |att AS (
       |  SELECT user_id, event_type,
       |    coalesce(
       |      last_value(CASE WHEN event_type <> 'purchase'
       |                 THEN event_type END IGNORE NULLS)
       |        OVER (PARTITION BY user_id ORDER BY tus
       |              RANGE BETWEEN $WindowMicros PRECEDING
       |                        AND 1 PRECEDING),
       |      'organic') AS chan
       |  FROM ev)
       |SELECT chan, count(*) AS n_purchases,
       |  count(DISTINCT user_id) AS n_buyers
       |FROM att WHERE event_type = 'purchase'
       |GROUP BY chan ORDER BY chan""".stripMargin

  /** Linear multi-touch: every non-purchase event in the purchase's 7-day
    * window shares the credit equally (1/n each) — the other standard
    * attribution model, and a different SHAPE: the frame must surface the
    * whole touch LIST (collect_list over the RANGE frame), which then
    * explodes into fractional credits. Credit fractions are exact
    * rationals evaluated identically (1.0/n of the same n) and sums are
    * rounded on the 1e-4 grid, the repo's float-aggregate discipline.
    *
    * Scale note: the frame materializes each purchase's touch list —
    * bounded by the 7-day per-user event density, the same bound the
    * last-touch frame's state already carries; the explode is
    * |purchases × touches-per-window|, the model's intrinsic output. */
  def eventsAttributionLinear(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", unix_micros($"ts").as("tus"), $"event_type")
    val w = Window.partitionBy($"user_id").orderBy($"tus")
      .rangeBetween(-WindowMicros, -1)
    ev
      .withColumn("touches", collect_list(
        when($"event_type" =!= "purchase", $"event_type")).over(w))
      .filter($"event_type" === "purchase")
      .select(explode(
        when(size($"touches") === 0, array(lit("organic")))
          .otherwise($"touches")).as("chan"),
        when(size($"touches") === 0, lit(1.0))
          .otherwise(lit(1.0) / size($"touches")).as("credit"))
      .groupBy($"chan")
      .agg(round(sum($"credit"), 4).as("credit"),
        count(lit(1)).as("n_touches"))
      .orderBy($"chan")
  }

  val eventsAttributionLinearSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, epoch_us(ts) AS tus, event_type FROM events),
       |win AS (
       |  SELECT user_id, event_type,
       |    list_filter(
       |      list(CASE WHEN event_type <> 'purchase' THEN event_type END)
       |        OVER (PARTITION BY user_id ORDER BY tus
       |              RANGE BETWEEN $WindowMicros PRECEDING
       |                        AND 1 PRECEDING),
       |      x -> x IS NOT NULL) AS touches
       |  FROM ev),
       |credits AS (
       |  SELECT unnest(CASE WHEN touches IS NULL OR len(touches) = 0
       |           THEN ['organic'] ELSE touches END) AS chan,
       |    CASE WHEN touches IS NULL OR len(touches) = 0 THEN 1.0
       |         ELSE 1.0 / len(touches) END AS credit
       |  FROM win WHERE event_type = 'purchase')
       |SELECT chan, round(sum(credit), 4) AS credit,
       |  count(*) AS n_touches
       |FROM credits
       |GROUP BY chan ORDER BY chan""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_attribution" -> (eventsAttribution _),
    "events_attribution_linear" -> (eventsAttributionLinear _))

  val oracles: Map[String, String] = Map(
    "events_attribution" -> eventsAttributionSql,
    "events_attribution_linear" -> eventsAttributionLinearSql)
}
