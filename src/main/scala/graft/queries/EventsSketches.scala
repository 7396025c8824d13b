package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Mergeable distinct-count sketches (Apache DataSketches HLL, the
  * `hll_sketch_agg` / `hll_union_agg` family) — the PRODUCTION shape for
  * distinct counting at 100 TB, distinct from both q20 (one-shot
  * `approx_count_distinct`, whose HLL++ state is plan-internal and gone
  * after the query) and q61 (exact bitmaps, perfect but sized by the id
  * universe). A DataSketches sketch is a VALUE: build one per (type, day)
  * partition at ingest, persist it (~2^lgK bytes), and answer any later
  * window — week, month, arbitrary day set — by unioning the stored
  * sketches WITHOUT rescanning events. That re-aggregability is what a
  * daily 10^12-event lake actually needs: the raw scan happens once per
  * day, every rollup after that reads kilobytes.
  *
  * Output: per event type, the number of daily sketches, the unioned
  * weekly-window estimate, and the one-shot estimate over the same window
  * — the two estimates agree exactly (HLL_8 union is an elementwise
  * register max, identical state to single-shot at equal lgK; spec-pinned
  * along with union associativity and accuracy vs the exact count).
  *
  * No oracle: DuckDB has no DataSketches implementation, so the register
  * states (and thus estimates) are engine-specific — the driver records a
  * rows-only check; EventsSketchesSpec pins the invariants that matter
  * (union ≡ one-shot, split-merge associativity, ±5% of exact).
  */
object EventsSketches {

  /** lgConfigK = 12 (4 KB dense): ±1.6% standard error — the size/accuracy
    * point most sketch stores ship. */
  val LgK = 12

  def eventsHllMergeable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_type", to_date($"ts").as("day"), $"user_id")
    // ingest-time face: one persistable sketch per (type, day) — this is
    // the frame a real pipeline would write to its sketch store
    val daily = ev
      .groupBy($"event_type", $"day")
      .agg(hll_sketch_agg($"user_id", lit(LgK)).as("sk"))
    // query-time face: answer the full-window question from the stored
    // sketches alone (union), plus the one-shot reference over raw events
    val unioned = daily
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg($"sk", lit(false))).as("est_union"))
    val oneShot = ev
      .groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id", lit(LgK)))
        .as("est_oneshot"))
    unioned
      .join(oneShot, Seq("event_type"))
      .orderBy($"event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_hll_mergeable" -> (eventsHllMergeable _))

  val oracles: Map[String, String] = Map.empty
}
