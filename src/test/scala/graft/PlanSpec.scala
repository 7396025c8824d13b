package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-regression assertions: the scale properties (pushdown, pruning,
  * broadcast choice, no cartesian products) are part of the contract, not an
  * accident of the current optimizer mood. These lock them in. */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q02 pushes filters into the parquet scan and prunes columns") {
    // use the formatted explain — toString truncates long filter lists
    val plan = SparkEntry.queries("q02_filter_project")(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters:"))
    assert(plan.contains("GreaterThan(l_quantity,45"), plan.linesIterator
      .filter(_.contains("PushedFilters")).mkString("\n"))
    // projection of 4 columns + 3 filter columns; shipdate/tax/etc must NOT be read
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_tax"),
      readSchema)
  }

  test("LLM-ops scans prune unused document/embedding columns") {
    // at 100 TB an unused column in ReadSchema is real scan cost; pin that
    // each operator's parquet scan carries only what it computes on
    def readSchemas(name: String): String =
      SparkEntry.queries(name)(spark, sf).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    val unwanted = Map(
      "text_stats" -> Seq("lang", "source", "n_chars"),       // uses doc_id+text
      "dedup_exact" -> Seq("lang", "source", "n_chars"),      // uses doc_id+text
      "dedup_ngram_jaccard" -> Seq("lang", "n_chars"),        // adds source only
      "text_langid" -> Seq("source", "n_chars"),              // uses lang+text
      "multimodal_bytes" -> Seq("doc_id", "lang", "n_chars"), // uses source+text
      "multimodal_frames" -> Seq("lang", "source", "n_chars"), // typed mapPartitions must still prune
      "multimodal_decode" -> Seq("lang", "source", "n_chars"),
      "sim_bruteforce_topk" -> Seq("label"),                  // uses vec_id+embedding
      "sim_lsh_topk" -> Seq("label"),
      "prep_split" -> Seq("text", "lang", "n_chars"),         // uses doc_id+source
      "prep_mix" -> Seq("text", "lang", "n_chars"),           // uses doc_id+source
      "prep_pack" -> Seq("lang", "n_chars"),                  // uses doc_id+source+text
      "text_chunks" -> Seq("lang", "source", "n_chars"),      // uses doc_id+text
      "text_redact" -> Seq("user_id", "event_type", "value"), // uses event_id+props
      "prep_contamination" -> Seq("lang", "source", "n_chars"), // uses doc_id+text
      "multimodal_exact_dedup" -> Seq("lang", "source", "n_chars"), // uses doc_id+text
      "text_entropy" -> Seq("lang", "source", "n_chars"),     // uses doc_id+text
      "text_lm_score" -> Seq("lang", "source", "n_chars"),    // uses doc_id+text
      "text_tfidf" -> Seq("doc_id", "lang", "n_chars"),       // uses source+text
      "sim_quantized_topk" -> Seq("label"),                   // uses vec_id+embedding
      "q34_minmax_by" -> Seq("o_custkey", "o_orderdate", "o_orderstatus"),
      "q35_scd2" -> Seq("o_orderstatus", "o_orderpriority"),
      "q36_range_frame" -> Seq("o_orderstatus", "o_orderpriority"),
      "prep_outliers" -> Seq("l_quantity", "l_discount", "l_tax", "l_shipdate"),
      "events_anomaly" -> Seq("event_id", "user_id", "value", "props"), // uses ts+event_type
      "prep_token_budget" -> Seq("lang", "source", "n_chars"),          // uses doc_id+text
      "multimodal_phash_dedup" -> Seq("lang", "source", "n_chars"),     // uses doc_id+text
      "text_novelty" -> Seq("lang", "source", "n_chars"),               // uses doc_id+text
      "prep_upsert" -> Seq("lang", "source", "n_chars"),                // uses doc_id+text
      "events_histogram" -> Seq("event_id", "user_id", "props", "ts"))  // uses event_type+value
    for ((q, cols) <- unwanted; schema = readSchemas(q); c <- cols)
      assert(!schema.contains(c), s"$q scan reads unused column '$c': $schema")
  }

  test("dimension joins broadcast; no cartesian product anywhere") {
    assert(planOf("q03_join_revenue").contains("BroadcastHashJoin"))
    assert(planOf("q06_broadcast_dims").contains("BroadcastHashJoin"))
    SparkEntry.queries.keys.foreach { name =>
      assert(!planOf(name).contains("CartesianProduct"), s"$name has a cartesian product")
    }
  }

  test("range join is a broadcast nested loop, not a shuffle explosion") {
    val plan = planOf("q17_range_join")
    assert(plan.contains("BroadcastNestedLoopJoin"))
  }

  test("top-k plans as TakeOrderedAndProject (no global sort)") {
    assert(planOf("q16_topk").contains("TakeOrderedAndProject"))
  }

  test("windowed top-k gets rank-limit pushdown (WindowGroupLimit)") {
    assert(planOf("q07_window_topk").contains("WindowGroupLimit"))
  }

  test("q01 aggregates partially before the shuffle (map-side combine)") {
    val plan = planOf("q01_pricing_summary")
    assert(plan.contains("partial_sum") || plan.contains("Partial"))
  }

  test("q26 broadcasts the part dimension and prunes the lineitem scan") {
    val plan = SparkEntry.queries("q26_promo_revenue")(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastHashJoin"))
    val liSchema = plan.linesIterator.filter(_.contains("ReadSchema"))
      .find(_.contains("l_partkey"))
      .getOrElse(fail(s"no lineitem ReadSchema line in plan:\n$plan"))
    for (c <- Seq("l_quantity", "l_tax", "l_returnflag", "l_orderkey"))
      assert(!liSchema.contains(c), s"q26 lineitem scan reads unused '$c': $liSchema")
  }

  test("q12 set-ops run as one job: single key shuffle, no caching") {
    val plan = planOf("q12_setops")
    assert(!plan.contains("InMemoryRelation"), "q12 must not cache")
    val keyShuffles = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(keyShuffles == 1,
      s"q12 should shuffle once on o_custkey, found $keyShuffles:\n$plan")
  }

  test("text_entropy is a map-only projection (kernel, not explode+agg)") {
    val plan = planOf("text_entropy")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"the entropy kernel must not shuffle characters:\n$plan")
    assert(!plan.contains("Join") && !plan.contains("Generate"),
      s"no join or explode:\n$plan")
  }

  test("prep_domain_cap broadcasts bucket offsets; no sort-merge join") {
    val plan = planOf("prep_domain_cap")
    assert(plan.contains("BroadcastHashJoin"),
      s"offsets (|sources| x 256 rows) must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"no corpus-wide join allowed:\n$plan")
  }

  test("events_paths top-20 plans as TakeOrderedAndProject (no global sort)") {
    val plan = planOf("events_paths")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k must not sort globally:\n$plan")
    assert(!plan.contains("Join"), s"paths come from the per-user fold, no join:\n$plan")
  }

  test("dedup_lines removes via anti-join on the hash key; no cartesian") {
    val plan = planOf("dedup_lines")
    assert(plan.contains("LeftAnti"),
      s"boilerplate removal must be a left-anti equi-join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"no unbounded join allowed:\n$plan")
  }

  test("prep_negative_pairs verifies only sampled pairs (no similarity self-join)") {
    val plan = planOf("prep_negative_pairs")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"verification must stay linear in sampled pairs:\n$plan")
  }

  test("events_session_funnel is one user shuffle (sessionize inside the fold)") {
    val plan = planOf("events_session_funnel")
    val keyShuffles = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(keyShuffles == 1,
      s"sessionized funnel should shuffle once on user_id, found $keyShuffles:\n$plan")
    assert(!plan.contains("Join"), s"no session-id join round allowed:\n$plan")
  }

  test("events_funnel is one user shuffle (fold, not three join rounds)") {
    val plan = planOf("events_funnel")
    val keyShuffles = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(keyShuffles == 1,
      s"funnel should shuffle once on user_id, found $keyShuffles:\n$plan")
    assert(!plan.contains("Join"), s"the fold form must not self-join:\n$plan")
  }

  test("events_retention broadcasts the cohort-size side") {
    val plan = planOf("events_retention")
    assert(plan.contains("BroadcastHashJoin"),
      s"cohort sizes (one row per day) must broadcast:\n$plan")
  }

  test("pipe_group_reduce aggregates partially map-side (ObjectHashAggregate)") {
    val plan = planOf("pipe_group_reduce")
    assert(plan.contains("ObjectHashAggregate"))
    assert(plan.contains("partial_command_reduce") || plan.contains("Partial"),
      s"command_reduce must pre-aggregate before the shuffle:\n$plan")
  }

  test("filtered vector search pushes the label predicate into the parquet scan") {
    val plan = SparkEntry.queries("sim_filtered_topk")(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // pre-filter semantics must reach the scan: at 100 TB with label-
    // clustered layout this prunes whole files before any vector is read
    assert(plan.contains("In(label, [1,3,5])"), plan.linesIterator
      .filter(_.contains("PushedFilters")).mkString("\n"))
  }

  test("q34 argmin/argmax is one partial+final hash aggregate (single shuffle)") {
    val plan = planOf("q34_minmax_by")
    assert(plan.contains("partial_max_by") || plan.contains("Partial"),
      s"max_by must pre-aggregate map-side:\n$plan")
    val keyShuffles = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(keyShuffles == 1, s"q34 should shuffle once, found $keyShuffles:\n$plan")
  }

  test("q35 SCD2 is one entity shuffle + one window (no self-join)") {
    val plan = planOf("q35_scd2")
    val keyShuffles = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(keyShuffles == 1, s"q35 should shuffle once on custkey, found $keyShuffles:\n$plan")
    assert(!plan.contains("Join"), s"q35 must not self-join:\n$plan")
  }

  test("prep_outliers broadcasts the groups-sized cutoff agg (map-only filter pass)") {
    val plan = planOf("prep_outliers")
    assert(plan.contains("BroadcastHashJoin"),
      s"cutoffs must broadcast back, not shuffle the fact rows:\n$plan")
  }

  test("q36 RANGE frame is one entity shuffle + one window") {
    val plan = planOf("q36_range_frame")
    val keyShuffles = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(keyShuffles == 1, s"q36 should shuffle once on custkey, found $keyShuffles:\n$plan")
    assert(!plan.contains("Join"), s"q36 must not join:\n$plan")
  }

  test("dedup_fuzzy candidates are a PassJoin key equi-join, never cartesian") {
    val plan = planOf("dedup_fuzzy")
    // the segment-filter candidate generator must plan as an equi-join on
    // the hashed (length, segment, content) key — a cartesian or band-join
    // candidate stage would be the quadratic shape PassJoin replaces
    assert(plan.contains("passjoin_seg_keys") && plan.contains("passjoin_sub_keys"),
      s"candidates must come from the PassJoin kernels:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"fuzzy dedup must not plan a cartesian product:\n$plan")
  }

  test("q39 high-cardinality window is one entity shuffle + one window") {
    val plan = planOf("q39_window_hicard")
    // robust against AQE re-planning / plan-string drift: require the
    // entity-key exchange to exist, and NO hash exchange on any other key —
    // rather than an exact line count of the whole plan string
    assert(plan.contains("hashpartitioning(o_custkey"),
      s"window parallelism must come from the entity key:\n$plan")
    val foreignShuffles = plan.linesIterator.filter(
      _.contains("Exchange hashpartitioning")).filterNot(
      _.contains("o_custkey")).toSeq
    assert(foreignShuffles.isEmpty,
      s"q39 must not shuffle on non-entity keys: $foreignShuffles\n$plan")
    assert(!plan.contains("Join"), s"q39 must not join:\n$plan")
  }

  test("q40 NOT IN plans as a single-pass null-aware broadcast anti join") {
    // three-valued NOT IN cannot degrade to q05's plain anti join; the
    // single-column form must take the null-aware BroadcastHashJoin (one
    // hashed build + a saw-a-null bit), NOT the quadratic
    // BroadcastNestedLoopJoin the bare (k = v) OR isnull(k = v) rewrite needs
    val exec = SparkEntry.queries("q40_null_anti")(spark, sf)
      .queryExecution.executedPlan
    val inner = exec match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val joins = inner.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    assert(joins.exists(_.isNullAwareAntiJoin),
      s"expected a null-aware BroadcastHashJoin:\n$inner")
    assert(!inner.toString.contains("BroadcastNestedLoopJoin"),
      s"NOT IN must not fall back to the nested-loop rewrite:\n$inner")
  }

  test("q41 LATERAL limit decorrelates to WindowGroupLimit, not a per-row loop") {
    val plan = planOf("q41_lateral")
    assert(plan.contains("WindowGroupLimit"),
      s"lateral ORDER BY/LIMIT must lower to a rank-limit window:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"lateral join must not plan as a nested loop:\n$plan")
  }

  test("prep_upsert is exactly one full-outer sort-merge join") {
    val plan = planOf("prep_upsert")
    assert(plan.contains("SortMergeJoin") && plan.contains("FullOuter"),
      s"snapshot/delta merge must be one full-outer SMJ (outer joins cannot broadcast):\n$plan")
    val joins = plan.linesIterator.count(l =>
      l.contains("Join") && !l.contains("AdaptiveSparkPlan"))
    assert(joins == 1, s"expected exactly one join, found $joins:\n$plan")
  }

  test("native as-of join plans its own exchanges and sorts") {
    val plan = planOf("events_asof_native")
    assert(plan.contains("AsOfJoin"))
    assert(plan.contains("Exchange hashpartitioning"))
  }

  test("prep_stratified gets rank-limit pushdown (WindowGroupLimit)") {
    // the per-source sample must never materialize a stratum: the rank<=k
    // filter lowers to WindowGroupLimit, bounding per-partition state at k
    val plan = planOf("prep_stratified")
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter must push into the window sort:\n$plan")
  }

  test("prep_screen is a zero-shuffle scan with column pruning") {
    val plan = SparkEntry.queries("prep_screen")(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"quality screening must not shuffle:\n$plan")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("lang") && !readSchema.contains("n_chars"),
      s"screen must read only doc_id/source/text: $readSchema")
  }

  test("prep_decontaminate joins on the gram key (no cartesian, no broadcast of the corpus)") {
    val plan = planOf("prep_decontaminate")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"gram join must be an equi-join:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), s"expected a hash/merge equi-join:\n$plan")
  }

  test("q37 EXISTS/IN/NOT EXISTS rewrite to semi/anti joins") {
    // the SQL front end must decorrelate: EXISTS/IN -> left-semi joins,
    // NOT EXISTS -> left-anti; a subquery re-executed per outer row would
    // appear as a nested-loop or In-subquery expression surviving to the
    // physical plan
    val plan = planOf("q37_exists_in")
    assert(plan.contains("LeftSemi"), s"EXISTS/IN must plan as semi joins:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS must plan as an anti join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"no nested-loop fallback:\n$plan")
  }

  test("text_repetition is a map-only projection (no shuffle, no join)") {
    // every repetition metric is per-document: the plan must be scan →
    // codegen'd projection (+ the output sort), never an explode/agg/join
    val plan = planOf("text_repetition")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"per-doc metrics must not shuffle:\n$plan")
    assert(!plan.contains("Join") && !plan.contains("Generate"),
      s"per-doc metrics must not join or explode:\n$plan")
  }

  test("events_anomaly broadcasts the moment table and AQE reuses the " +
      "daily-count shuffle (events scan once at runtime)") {
    val df = SparkEntry.queries("events_anomaly")(spark, sf)
    df.collect() // exchange reuse is an AQE runtime fact: finalize the plan
    val plan = df.queryExecution.executedPlan.toString
    val finalSection = plan.indexOf("== Initial Plan ==") match {
      case -1 => plan
      case i => plan.substring(0, i)
    }
    assert(finalSection.contains("BroadcastHashJoin"),
      s"moment table must broadcast:\n$finalSection")
    assert(!finalSection.contains("SortMergeJoin"))
    // the stats side must REUSE the daily-count exchange, not rescan events:
    // exactly one FileScan survives in the final plan
    assert(finalSection.contains("ReusedExchange"),
      s"daily-count shuffle must be reused by the moment agg:\n$finalSection")
    assert(finalSection.linesIterator.count(_.contains("FileScan parquet")) == 1,
      s"events must scan once:\n$finalSection")
  }

  test("prep_token_budget shuffles doc rows once (on bin) and broadcasts " +
      "the offset table — no global sort before the output orderBy") {
    val plan = planOf("prep_token_budget")
    assert(plan.contains("BroadcastHashJoin"),
      s"bin offsets must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"))
    val hashEx = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.nonEmpty && hashEx.forall(_.contains("bin#")),
      s"doc rows may shuffle only on the quality bin: $hashEx")
    // exactly one rangepartitioning: the deterministic output orderBy —
    // the RANKING itself must never plan a global sort
    assert(plan.linesIterator.count(_.contains("rangepartitioning")) == 1,
      s"ranking must not global-sort:\n$plan")
  }
}
