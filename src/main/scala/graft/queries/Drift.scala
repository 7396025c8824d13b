package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Corpus composition drift — the report a data pipeline runs when a new
  * crawl/batch lands: did the language (or domain/source) mix move against
  * the reference cohort? Here the two cohorts are derived from the corpus'
  * own source tags (src0-src9 = reference `a`, src10+ = candidate `b`);
  * in production they would be two snapshot dates of the same table.
  *
  * Per language: absolute counts in each cohort, each cohort's share,
  * the absolute share drift, and a flag when drift exceeds 2 points —
  * the actionable output (which slice moved, by how much, is it over
  * budget) rather than a single distance scalar.
  *
  * Scale shape: ONE conditional-aggregate scan of the corpus produces the
  * per-(lang, cohort) counts (map-side combined); the two cohort totals
  * are a 1-row aggregate OF THAT RESULT, broadcast back — the fact table
  * is never re-scanned for the denominators (spec-pinned single scan).
  * The totals crossJoin plans as a BroadcastNestedLoopJoin over that ONE
  * broadcast row — the scalar-broadcast idiom (map-side constant append),
  * not a quadratic nested loop. Shares divide exact integer counts, so
  * the drift grid is engine-stable on the shared 6-decimal display
  * rounding. */
object Drift {

  def prepDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cohortA = $"source".isin((0 to 9).map(i => s"src$i"): _*)
    val counts = Tables.documents(spark, dir)
      .groupBy($"lang")
      .agg(
        sum(when(cohortA, 1L).otherwise(0L)).as("n_a"),
        sum(when(!cohortA, 1L).otherwise(0L)).as("n_b"))
    val totals = counts.agg(
      sum($"n_a").as("tot_a"), sum($"n_b").as("tot_b"))
    counts
      .crossJoin(broadcast(totals))
      .select(
        $"lang", $"n_a", $"n_b",
        round($"n_a".cast("double") / $"tot_a", 6).as("share_a"),
        round($"n_b".cast("double") / $"tot_b", 6).as("share_b"),
        round(abs($"n_a".cast("double") / $"tot_a" - $"n_b".cast("double") / $"tot_b"), 6).as("drift"),
        (abs($"n_a".cast("double") / $"tot_a" - $"n_b".cast("double") / $"tot_b") > 0.02)
          .cast("int").as("over_budget"))
      .orderBy($"lang")
  }

  val prepDriftSql: String =
    """WITH counts AS (
      |  SELECT lang,
      |    CAST(sum(CASE WHEN source IN ('src0','src1','src2','src3','src4','src5','src6','src7','src8','src9') THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN source NOT IN ('src0','src1','src2','src3','src4','src5','src6','src7','src8','src9') THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      |  FROM documents GROUP BY lang),
      |totals AS (SELECT sum(n_a) AS tot_a, sum(n_b) AS tot_b FROM counts)
      |SELECT c.lang, c.n_a, c.n_b,
      |  round(CAST(c.n_a AS DOUBLE) / t.tot_a, 6) AS share_a,
      |  round(CAST(c.n_b AS DOUBLE) / t.tot_b, 6) AS share_b,
      |  round(abs(CAST(c.n_a AS DOUBLE) / t.tot_a - CAST(c.n_b AS DOUBLE) / t.tot_b), 6) AS drift,
      |  CAST(abs(CAST(c.n_a AS DOUBLE) / t.tot_a - CAST(c.n_b AS DOUBLE) / t.tot_b) > 0.02 AS INT) AS over_budget
      |FROM counts c, totals t
      |ORDER BY c.lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "prep_drift" -> (prepDrift _))

  val oracles: Map[String, String] = Map(
    "prep_drift" -> prepDriftSql)
}
