package graft

import java.io.{BufferedReader, InputStreamReader}

import org.scalatest.funsuite.AnyFunSuite

/** Memory-bounded stress (VERDICT r8 task 5): the 100 TB claims rest on
  * plan SHAPES — prove the bounded-state ones hold under actual pressure
  * by running the heaviest sf0.1 queries in a forked JVM capped at
  * -Xmx1g, local[4], 64 shuffle partitions (the bench runs them in 8 GiB
  * / local[32] / 32 partitions — this is ~1/8 the heap with MORE, smaller
  * partitions). Anything that OOMs here is hiding a whole-partition or
  * driver-side materialization its scaladoc doesn't admit to. */
class MemoryStressSpec extends AnyFunSuite {

  /** The 12 heaviest queries by the r9 bench, spanning every
    * bounded-state mechanism: graph-store admission (the r9-continuation
    * heaviest), composed ANN reports, BPE training, LSH+connected
    * components, recursive CTE, persisted-store admission, tokenizer
    * apply, distributed percentile outliers, shingle joins, CC consumers,
    * IVF serving. */
  private val heaviest = Seq(
    "events_pagerank_incremental", "sim_recall_report", "prep_bpe_budget",
    "dedup_semantic", "q50_recursive_bom", "dedup_chunks_incremental",
    "text_bpe_encode", "text_bpe_vocab", "prep_outliers",
    "dedup_ngram_jaccard", "dedup_canonical", "sim_ivf_served")

  private def runStress(sfDir: String, queries: Seq[String]): Unit = {
    val p = ForkedJvm.start("graft.MemoryStressChild",
      Seq(sfDir) ++ queries,
      extraJvm = Seq("-Xmx1g"))
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val r = new BufferedReader(new InputStreamReader(p.getInputStream))
    try {
      var line = r.readLine()
      while (line != null && !line.contains("STRESS-DONE")) {
        if (line.startsWith("STRESS-")) out += line
        line = r.readLine()
      }
      assert(line != null, s"child died before finishing; saw:\n${out.mkString("\n")}")
    } finally ForkedJvm.kill(p)
    val fails = out.filter(_.startsWith("STRESS-FAIL"))
    assert(fails.isEmpty, fails.mkString("\n"))
    assert(out.count(_.startsWith("STRESS-OK")) == queries.size,
      s"expected ${queries.size} OK lines:\n${out.mkString("\n")}")
  }

  test("heaviest sf0.1 queries complete in a 1 GiB JVM", SlowTest) {
    runStress("/root/testdata/sf0.1", heaviest)
  }

  test("heaviest queries complete in a 1 GiB JVM at sf1 (builder decade, 10x the data, same heap)", SlowTest) {
    // the fourth decade is builder-generated (tools/gen_sf1.py, seed 43,
    // distribution-matched to the driver data) — skip, don't fail, when
    // it has not been generated on this checkout
    val sf1 = "/root/repo/target/testdata/sf1"
    assume(new java.io.File(sf1, "lineitem.parquet").exists(),
      s"sf1 decade not generated (python3 tools/gen_sf1.py)")
    // time-box (r14, VERDICT r13 item 1: the full suite must fit the
    // driver's window — this leg is ~26 s/query): the default list keeps
    // ONE query per bounded-state mechanism — exact-percentile outliers,
    // shingle+verify joins, embedding-CC, BPE training+packing, the
    // recursive CTE, graph-store admission, chunk-store admission, and
    // the composed ANN report (which runs the ivf/ivfpq/lsh kernels) —
    // dropping only same-mechanism twins (bpe_encode/vocab ⊂ bpe_budget,
    // dedup_canonical ⊂ dedup_semantic's CC, sim_ivf_served's admission ⊂
    // the incremental faces). GRAFT_STRESS_SF1_FULL=1 restores all 12.
    val sf1Set =
      if (sys.env.get("GRAFT_STRESS_SF1_FULL").contains("1")) heaviest
      else Seq("prep_outliers", "dedup_ngram_jaccard", "dedup_semantic",
        "prep_bpe_budget", "q50_recursive_bom",
        "events_pagerank_incremental", "dedup_chunks_incremental",
        "sim_recall_report")
    runStress(sf1, sf1Set)
  }
}
