package graft

import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Suite-wide plan linter (VERDICT r8 task 2): per-query hand-written plan
  * pins (PlanSpec, ScaleSpec, …) only guard the queries somebody pinned.
  * This spec walks EVERY `SparkEntry.queries` physical plan and enforces
  * the global anti-pattern contract, so a new query gets scale scrutiny by
  * default:
  *
  *  1. no `CartesianProductExec` — an unconditioned join is never the
  *     intended 100 TB shape;
  *  2. no `BroadcastNestedLoopJoinExec` — same, except where a small-side
  *     band/inequality join is the DESIGNED plan (explicit allowlist);
  *  3. no INTERIOR global sort — a `SortExec(global=true)` feeding a
  *     join/aggregate/window is a full-data range-shuffle a 100 TB run
  *     cannot pay; a global sort is only legitimate as final presentation
  *     `orderBy` (ancestors: projections/limits only) or under a top-k
  *     (`TakeOrderedAndProjectExec` plans its own);
  *  4. no `ShuffleExchangeExec(SinglePartition)` except the final hop of a
  *     grouping-free (≤ partial-row-per-partition) aggregation — anything
  *     else funnels real data through one task.
  *
  * Plans are linted with AQE OFF so the static plan (what the optimizer
  * committed to) is judged, not a runtime re-plan; the conf is restored
  * after. Subquery plans are linted recursively — a cartesian hiding in a
  * scalar subquery is still a cartesian.
  */
class PlanLintSpec extends AnyFunSuite {
  import TestSpark._

  /** query → checks it is excused from, each with a written justification.
    * (Generically-bounded shapes — 1-row scalar broadcasts, LocalTableScan
    * build sides, global-agg funnels — are accepted by the linter itself;
    * only shapes whose bound lives in the QUERY's construction, invisible
    * to the plan, belong here.) */
  private val allow: Map[String, Set[String]] = Map(
    // PassJoin edit-distance joins: strings shorter than the threshold
    // band carry no usable prefix signature, so the DESIGNED plan runs the
    // short-string remainder (len ≤ k·segments, a constant-bounded sliver
    // of any real corpus) as a broadcast loop join against the candidates;
    // the prefix-filtered equi-join carries the volume (CandidateVolumeSpec
    // pins ≤2n candidates).
    "dedup_fuzzy" -> Set("bnlj"),
    "prep_fuzzy_decontam" -> Set("bnlj"),
    // Brute-force/quantized ANN faces: the broadcast side is the QUERY set,
    // bounded to NQueries (vec_id < 10 literal, visible as a pushed filter)
    // by construction — queries × corpus with tiny queries is the designed
    // brute-force baseline the indexed variants are measured against.
    "sim_bruteforce_topk" -> Set("bnlj"),
    "sim_filtered_topk" -> Set("bnlj"),
    "sim_quantized_rerank" -> Set("bnlj"),
    "sim_quantized_topk" -> Set("bnlj"),
    // The recall harness runs the brute-force exact baseline INTERNALLY
    // (ground truth the approximate families are scored against) — same
    // NQueries-literal-bounded broadcast side as sim_bruteforce_topk,
    // surfaced here because the AQE pass lints every internal execution.
    "sim_recall_report" -> Set("bnlj"),
    // Token-budget prefix sums: the funnel carries the 257-row bucket
    // aggregate (256 hash buckets + remainder), never document rows — the
    // bounded-bucket design IS the operator (see DataPipeline prefix-sum
    // header); the bound is the bucket constant, invisible to the plan.
    "prep_bpe_budget" -> Set("single-partition"),
    "prep_token_budget" -> Set("single-partition")
  )

  private def excused(name: String, check: String): Boolean =
    allow.getOrElse(name, Set.empty).contains(check)

  /** Strip execution wrappers that carry no semantics. */
  private def strip(p: SparkPlan): SparkPlan = p match {
    case w: WholeStageCodegenExec => strip(w.child)
    case i: InputAdapter => strip(i.child)
    case other => other
  }

  /** Nodes a presentation-only global sort may sit under. The AQE
    * wrappers are transparent: they re-plan, they don't consume. Write
    * commands (v1 and v2 — the noop sink, parquet saves) are sinks: a
    * global sort feeding a write is the query's presentation order (or a
    * deliberate ordered layout), not interior compute. */
  private def presentational(p: SparkPlan): Boolean = p match {
    case _: ProjectExec | _: WholeStageCodegenExec | _: InputAdapter |
        _: CollectLimitExec | _: GlobalLimitExec | _: LocalLimitExec |
        _: ColumnarToRowExec | _: SerializeFromObjectExec |
        _: AdaptiveSparkPlanExec | _: QueryStageExec |
        _: datasources.v2.V2CommandExec |
        _: command.DataWritingCommandExec |
        _: command.ExecutedCommandExec => true
    case _ => false
  }

  /** Plan-provably row-bounded subtree: a grouping-free aggregate (≤1 row
    * out; ≤1 row per partition through its own funnel) or a LocalTableScan
    * (already driver-materialized — bounded by the codebook-collect
    * discipline that produced it), possibly under filters/projections.
    * These are the broadcast/funnel payloads that stay tiny at any corpus
    * scale, so BNLJ build sides and SinglePartition exchanges over them
    * are accepted without an allowlist entry. */
  private def planBounded(p: SparkPlan): Boolean = strip(p) match {
    case a: BaseAggregateExec => a.groupingExpressions.isEmpty
    case _: LocalTableScanExec => true
    case pr: ProjectExec => planBounded(pr.child)
    case f: FilterExec => planBounded(f.child)
    case e: exchange.BroadcastExchangeExec => planBounded(e.child)
    case q: QueryStageExec => planBounded(q.plan)
    case r: exchange.ReusedExchangeExec => planBounded(r.child)
    case a: AdaptiveSparkPlanExec => planBounded(a.executedPlan)
    case _ => false
  }

  /** Walk with ancestry (nearest-first), across subquery boundaries. */
  private def lint(name: String, plan: SparkPlan): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(p: SparkPlan, ancestors: List[SparkPlan]): Unit = {
      p match {
        case _: CartesianProductExec if !excused(name, "cartesian") =>
          out += s"$name: CartesianProduct in plan"
        case b: BroadcastNestedLoopJoinExec if !excused(name, "bnlj") =>
          val build = b.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => b.left
            case org.apache.spark.sql.catalyst.optimizer.BuildRight => b.right
          }
          // scalar/constant-side loop joins are the designed band shape
          if (!planBounded(build))
            out += s"$name: BroadcastNestedLoopJoin over unbounded build " +
              s"side ${strip(build).nodeName}"
        case s: SortExec if s.global && !excused(name, "global-sort") =>
          // interior ⇔ some ancestor consumes the sorted stream as data
          // (anything that is not a presentation-safe pass-through)
          if (!ancestors.forall(presentational))
            out += s"$name: interior global Sort under " +
              ancestors.filterNot(presentational).head.nodeName
        case e: ShuffleExchangeExec
            if e.outputPartitioning == SinglePartition &&
              !excused(name, "single-partition") =>
          if (!planBounded(e.child))
            out += s"$name: Exchange SinglePartition over ${strip(e.child).nodeName}"
        case _ => ()
      }
      val anc = p :: ancestors
      // the AQE wrappers are leaves structurally; descend into the plan
      // they actually executed (post-re-optimization, the plan a 100 TB
      // run would run) — this is what makes the AQE-ON pass see real shapes
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, anc)
        case q: QueryStageExec => walk(q.plan, anc)
        case _ => ()
      }
      p.children.foreach(walk(_, anc))
      // subquery fragments restart ancestry: their sort/limit shape is
      // their own (a scalar subquery's global sort is still interior work)
      p.subqueries.foreach(walk(_, List(p)))
    }
    walk(plan, Nil)
    out.toSeq
  }

  test("no query plan carries a cartesian, stray BNLJ, interior global sort, or data-bearing single-partition exchange") {
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (qname, fn) =>
          try lint(qname, fn(spark, sf).queryExecution.executedPlan)
          catch { case e: Throwable =>
            Seq(s"$qname: failed to plan — ${e.getMessage}")
          }
      }
      assert(violations.isEmpty, violations.mkString("\n", "\n", "\n"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  test("the linter actually fires on each anti-pattern (no vacuous green)") {
    import TestSpark.spark.implicits._
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val bcWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // small test frames would broadcast into a BNLJ; kill broadcast so the
    // cross join plans as the CartesianProduct a big-big cross would
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = graft.sources.Tables.documents(spark, sf).select($"doc_id")
      val big = docs.withColumnRenamed("doc_id", "b")
      // cartesian: unconditioned cross join of two corpus-sized frames
      val cart = docs.crossJoin(big)
      assert(lint("probe", cart.queryExecution.executedPlan)
        .exists(_.contains("CartesianProduct")))
      // BNLJ with an unbounded build: inequality join, corpus-sized side
      // force-broadcast (the hint overrides the disabled threshold)
      val bnlj = docs.join(
        org.apache.spark.sql.functions.broadcast(big), $"doc_id" < $"b")
      assert(lint("probe", bnlj.queryExecution.executedPlan)
        .exists(_.contains("BroadcastNestedLoopJoin")))
      // interior global sort: a full orderBy feeding downstream compute.
      // (An aggregate consumer won't do: EliminateSorts prunes the sort
      // below order-agnostic operators — which is itself evidence the
      // optimizer half-enforces this rule. A typed map is order-dependent,
      // so the sort survives as genuinely interior work.)
      val innerSort = docs.as[Long].orderBy($"doc_id").map(_ + 1)
      assert(lint("probe", innerSort.queryExecution.executedPlan)
        .exists(_.contains("interior global Sort")))
      // data-bearing single-partition exchange: repartition(1) of real rows
      val single = docs.repartition(1).groupBy($"doc_id").count()
      assert(lint("probe", single.queryExecution.executedPlan)
        .exists(_.contains("SinglePartition")))
      // ...and the presentation orderBy at the top is NOT flagged
      val topSort = docs.groupBy(($"doc_id" % 7).as("g")).count()
        .orderBy($"g")
      assert(!lint("probe", topSort.queryExecution.executedPlan)
        .exists(_.contains("Sort")))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcWas)
    }
  }

  test("allowlist entries stay live (no stale excuses)") {
    val unknown = allow.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"allowlisted names not in queries: $unknown")
  }

  /** The ~20 heaviest queries by the calibrated sf0.1 bench — the set the
    * AQE-ON pass executes (VERDICT r9 task 4). */
  private val heaviest = Seq(
    "events_pagerank_incremental", "prep_table_stats", "dedup_semantic",
    "dedup_canonical", "prep_bpe_budget", "events_pagerank",
    "sim_recall_report", "dedup_chunks_incremental", "sim_ivf_served",
    "sim_ivf_served_sq8", "text_bpe_encode", "dedup_clusters",
    "dedup_ngram_jaccard", "text_bpe_vocab", "q79_zonemap_scan",
    "text_lm_score", "q50_recursive_bom", "prep_corpus", "dedup_fuzzy",
    "dedup_chunks", "prep_outliers", "q30_stats_moments",
    "q83_bloom_indexed_store", "q84_zone_indexed_store",
    "q85_join_file_pruning", "q86_bloom_lookup_batch",
    "q87_zone_count_pushdown", "q89_zone_minmax_pushdown",
    "q91_zone_sum_pushdown")

  test("AQE-ON: final adaptive plans of the heaviest queries — every internal execution included — satisfy the same contract") {
    // The static pass above judges what the optimizer committed to with
    // AQE off; this pass judges what ADAPTIVE execution actually ran —
    // runtime re-plans (BNLJ demotions, skew splits, empty-relation
    // collapses) included. Because many heavy faces checkpoint internally
    // (their returned frame is just a checkpoint scan), plans are captured
    // with a QueryExecutionListener: every execution the query triggers —
    // admissions, checkpoint materializations, loop rounds, the final
    // noop write — is linted, not just the returned frame's plan. The
    // walk descends AdaptiveSparkPlanExec/QueryStageExec into the
    // executed (final) physical plan.
    assert(heaviest.forall(SparkEntry.queries.contains))
    val captured =
      new java.util.concurrent.ConcurrentLinkedQueue[SparkPlan]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = { captured.add(qe.executedPlan): Unit }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.listenerManager.register(listener)
    try {
      val violations = heaviest.flatMap { name =>
        captured.clear()
        try {
          SparkEntry.queries(name)(spark, sf)
            .write.format("noop").mode("overwrite").save()
          // the listener fires on a bus thread: drain until stable
          var last = -1
          var same = 0
          while (same < 3) {
            Thread.sleep(100)
            val n = captured.size
            if (n == last) same += 1 else { same = 0; last = n }
          }
          import scala.jdk.CollectionConverters._
          val plans = captured.asScala.toSeq
          assert(plans.nonEmpty, s"$name: no executions captured")
          plans.flatMap(lint(name, _))
        } catch { case e: org.scalatest.exceptions.TestFailedException => throw e
          case e: Throwable => Seq(s"$name: failed to run — ${e.getMessage}") }
      }
      assert(violations.isEmpty,
        violations.distinct.mkString("\n", "\n", "\n"))
    } finally {
      spark.listenerManager.unregister(listener)
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
    }
  }
}
