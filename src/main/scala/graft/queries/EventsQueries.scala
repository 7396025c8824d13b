package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.streaming.EventStreams

/** Event-time analytics over the `events` table — the batch face of the
  * streaming surface (EventStreams): tumbling/sliding windows, session
  * windows, sessionization, as-of join. Each is oracle-checked; the same
  * transforms run under Structured Streaming in StreamingSpec.
  */
object EventsQueries {

  /** Tumbling 1-hour windows (same expression streams with a watermark). */
  def eventsTumbling(spark: SparkSession, dir: String): DataFrame =
    EventStreams.tumblingCounts(Tables.events(spark, dir), "1 hour")
      .orderBy(col("window_start"), col("event_type"))

  val eventsTumblingSql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin

  /** Sliding 1-hour windows every 15 minutes: each event lands in 4 windows.
    * Spark's `window(ts, len, slide)` expands map-side — no self-join. */
  def eventsSliding(spark: SparkSession, dir: String): DataFrame =
    EventStreams.slidingCounts(Tables.events(spark, dir), "1 hour", "15 minutes")
      .orderBy(col("window_start"), col("event_type"))

  // Oracle expands the same 4 windows per event: start = floor(epoch/900)*900 - k*900.
  val eventsSlidingSql: String =
    """SELECT strftime(to_timestamp(CAST(floor(epoch(ts) / 900) * 900 - k.k * 900 AS BIGINT)),
      |                '%Y-%m-%d %H:%M:%S') AS window_start,
      |  event_type, count(*) AS n
      |FROM events, (SELECT unnest([0, 1, 2, 3]) AS k) k
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin

  /** Native session windows (30-min gap) aggregated to per-user stats.
    * session_window is the streaming-native operator; the oracle reproduces
    * its semantics with gaps-and-islands SQL (new session when the gap to the
    * previous event is >= 30 min), proving the two formulations agree. */
  def eventsSessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    EventStreams.sessionStats(Tables.events(spark, dir), "30 minutes")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum($"n_events").as("n_events"),
        max($"n_events").as("max_session_events"))
      .orderBy($"user_id")
  }

  val eventsSessionsSql: String =
    """WITH marked AS (
      |  SELECT user_id, ts,
      |    CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
      |              >= 1800 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |sess AS (
      |  SELECT user_id, ts,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM marked),
      |per_session AS (
      |  SELECT user_id, session_id, count(*) AS n_events
      |  FROM sess GROUP BY user_id, session_id)
      |SELECT user_id, count(*) AS n_sessions,
      |  CAST(sum(n_events) AS BIGINT) AS n_events,
      |  max(n_events) AS max_session_events
      |FROM per_session
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** As-of (backward) join: for each purchase, the user's most recent signup
    * at-or-before it. Implemented the scale-correct way: union both sides,
    * ONE shuffle on user_id, running `last(signup_ts)` window — no join
    * explosion, no per-row subquery. Oracle: DuckDB's native ASOF JOIN. */
  def eventsAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", lit(null).cast("timestamp").as("sig_ts"))
    val signups = ev.filter($"event_type" === "signup")
      .select(lit(null).cast("long").as("event_id"), $"user_id", $"ts", $"ts".as("sig_ts"))
    // signups sort before purchases at identical ts (sig_ts non-null first)
    // so a same-instant signup is visible to the purchase — ASOF `<=`.
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"sig_ts".asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, 0)
    purchases.unionByName(signups)
      .withColumn("last_signup", last($"sig_ts", ignoreNulls = true).over(w))
      .filter($"event_id".isNotNull) // keep only the purchase rows
      .select($"event_id",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        date_format($"last_signup", "yyyy-MM-dd HH:mm:ss").as("signup_ts"))
      .orderBy($"event_id")
  }

  val eventsAsofJoinSql: String =
    """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      |     s AS (SELECT user_id, ts FROM events WHERE event_type = 'signup')
      |SELECT p.event_id,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
      |  strftime(s.ts, '%Y-%m-%d %H:%M:%S') AS signup_ts
      |FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND s.ts <= p.ts
      |ORDER BY p.event_id""".stripMargin

  /** The same as-of join through the NATIVE operator (custom LogicalPlan +
    * Strategy + merge-join SparkPlan, graft.plans.AsOf) — one clustered
    * shuffle + sort per side, single merge pass. Same DuckDB oracle as the
    * union-window formulation above. */
  def eventsAsofNative(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // re-read per side: the operator requires disjoint attribute ids
    val purchases = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val signups = Tables.events(spark, dir)
      .filter($"event_type" === "signup")
      .select($"user_id", $"ts".as("s_ts"))
    graft.plans.AsOf.join(purchases, signups, "user_id", "ts", "s_ts")
      .select($"event_id",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        date_format($"s_ts", "yyyy-MM-dd HH:mm:ss").as("signup_ts"))
      .orderBy($"event_id")
  }

  /** Large-large interval join, bucketed: for each purchase, count the same
    * user's clicks in the preceding hour. Neither side is broadcastable at
    * scale and a raw non-equi join explodes, so the range is decomposed into
    * an EQUI-join on (user, hour-bucket) — each purchase probes its own and
    * the previous bucket (2 rows), each click sits in exactly 1 bucket — and
    * the exact range predicate filters within the joined buckets. Shuffle
    * keys are (user, hour): high-cardinality, no skew, SMJ-able. */
  def eventsIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts",
        ($"ts".cast("long") / 3600).cast("long").as("b"))
      .select($"event_id", $"user_id", $"ts",
        explode(array($"b" - 1, $"b")).as("bucket"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"),
        ($"ts".cast("long") / 3600).cast("long").as("c_bucket"))
    purchases
      .join(clicks,
        $"user_id" === $"c_user" && $"bucket" === $"c_bucket" &&
          $"c_ts" > $"ts" - expr("INTERVAL 1 HOUR") && $"c_ts" < $"ts",
        "left_outer")
      .groupBy($"event_id")
      .agg(count($"c_ts").as("n_clicks_1h"))
      .orderBy($"event_id")
  }

  val eventsIntervalJoinSql: String =
    """SELECT p.event_id, count(c.ts) AS n_clicks_1h
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
      |LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      |  ON c.user_id = p.user_id
      | AND c.ts > p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
      |GROUP BY p.event_id
      |ORDER BY p.event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_interval_join" -> (eventsIntervalJoin _),
    "events_tumbling" -> (eventsTumbling _),
    "events_sliding" -> (eventsSliding _),
    "events_sessions" -> (eventsSessions _),
    "events_asof_join" -> (eventsAsofJoin _),
    "events_asof_native" -> (eventsAsofNative _))

  val oracles: Map[String, String] = Map(
    "events_interval_join" -> eventsIntervalJoinSql,
    "events_tumbling" -> eventsTumblingSql,
    "events_sliding" -> eventsSlidingSql,
    "events_sessions" -> eventsSessionsSql,
    "events_asof_join" -> eventsAsofJoinSql,
    "events_asof_native" -> eventsAsofJoinSql)
}
