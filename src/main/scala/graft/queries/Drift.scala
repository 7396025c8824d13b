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

  /** Snapshot diff — the read-only sibling of `prep_upsert`: given two
    * corpus snapshots, report per source what a re-crawl actually did —
    * how many docs were added, removed, changed (same id, different
    * content hash), or unchanged. Upsert PRODUCES the merged corpus; this
    * produces the review artifact a data team reads before blessing the
    * merge (and the rough rewrite-cost estimate: changed+added is the
    * write volume a copy-on-write merge pays).
    *
    * Scale shape: one full-outer doc_id equi-join of (id, md5, source)
    * projections — content hashed map-side, so the join carries 16-byte
    * digests, never text (the prep_upsert discipline); the report is one
    * small aggregate over the join. On a doc_id-bucketed lake the join
    * shuffles nothing.
    *
    * Driver face: snapshot A is derived deterministically from the corpus
    * (docs with id % 10 == 7 missing — "not yet crawled" — and id % 10
    * == 3 carrying a stale text variant), snapshot B is the current
    * corpus; in production A and B are two table versions. */
  def datasetDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    def keyed(df: DataFrame, fp: String, src: String) =
      df.select($"doc_id", md5($"text").as(fp), $"source".as(src))
    keyed(a, "fp_a", "src_a")
      .join(keyed(b, "fp_b", "src_b"), Seq("doc_id"), "full_outer")
      .select(coalesce($"src_b", $"src_a").as("source"),
        when($"fp_a".isNull, "added")
          .when($"fp_b".isNull, "removed")
          .when($"fp_a" =!= $"fp_b", "changed")
          .otherwise("unchanged").as("status"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"status" === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when($"status" === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when($"status" === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when($"status" === "unchanged", 1L).otherwise(0L)).as("n_unchanged"))
      .orderBy($"source")
  }

  def prepDatasetDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val prior = docs
      .filter($"doc_id" % 10 =!= 7)
      .withColumn("text",
        when($"doc_id" % 10 === 3, concat($"text", lit(" stale")))
          .otherwise($"text"))
    datasetDiff(prior, docs)
  }

  val prepDatasetDiffSql: String =
    """WITH a AS (
      |  SELECT doc_id,
      |    md5(CASE WHEN doc_id % 10 = 3 THEN text || ' stale' ELSE text END) AS fp_a,
      |    source AS src_a
      |  FROM documents WHERE doc_id % 10 <> 7),
      |b AS (SELECT doc_id, md5(text) AS fp_b, source AS src_b FROM documents),
      |j AS (
      |  SELECT coalesce(b.src_b, a.src_a) AS source,
      |    CASE WHEN a.fp_a IS NULL THEN 'added'
      |         WHEN b.fp_b IS NULL THEN 'removed'
      |         WHEN a.fp_a <> b.fp_b THEN 'changed'
      |         ELSE 'unchanged' END AS status
      |  FROM a FULL OUTER JOIN b USING (doc_id))
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
      |  CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
      |  CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
      |  CAST(sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
      |FROM j
      |GROUP BY source
      |ORDER BY source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "prep_drift" -> (prepDrift _),
    "prep_dataset_diff" -> (prepDatasetDiff _))

  val oracles: Map[String, String] = Map(
    "prep_drift" -> prepDriftSql,
    "prep_dataset_diff" -> prepDatasetDiffSql)
}
