package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Dedup, IncrementalDedup}
import graft.sources.Tables

/** Incremental-dedup contract: processing a corpus as sequential delta
  * batches against the persisted index must reach exactly the state a
  * from-scratch dedup over the union reaches, the operation must be
  * idempotent (reprocessing a batch admits nothing), and the plan must keep
  * the index un-shuffled (all joins broadcast the batch side). */
class IncrementalDedupSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpIndex(): String =
    Files.createTempDirectory("graft_incdedup_").toString

  test("half-then-half incremental equals from-scratch exact dedup") {
    val idx = tmpIndex()
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val ids = docs.select($"doc_id").as[Long].collect().sorted
    val mid = ids(ids.length / 2)
    val first = docs.filter($"doc_id" < mid)
    val second = docs.filter($"doc_id" >= mid)

    IncrementalDedup.writeExactIndex(first, idx)
    val admitted2 = IncrementalDedup.dedupeBatchExact(second, idx)
      .select($"doc_id").as[Long].collect().toSet

    // final index state == the keepers a from-scratch dedup over ALL docs
    // picks (batches are id-ordered, so min-per-fingerprint agrees)
    val indexKeepers = spark.read.parquet(idx)
      .select($"keeper_id").as[Long].collect().toSet
    val scratch = Dedup.dedupExact(spark, sf)
      .select($"keeper_id").as[Long].collect().toSet
    assert(indexKeepers == scratch,
      s"index-only=${indexKeepers -- scratch} scratch-only=${scratch -- indexKeepers}")
    // and the admitted set is exactly the second-half keepers
    assert(admitted2 == scratch.filter(_ >= mid))
  }

  test("reprocessing the same batch admits nothing (idempotence)") {
    val idx = tmpIndex()
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    IncrementalDedup.writeExactIndex(docs.filter($"doc_id" < 100), idx)
    val batch = docs.filter($"doc_id" >= 100 && $"doc_id" < 200)
    val n1 = IncrementalDedup.dedupeBatchExact(batch, idx).count()
    val n2 = IncrementalDedup.dedupeBatchExact(batch, idx).count()
    assert(n1 > 0, "first pass should admit the new docs")
    assert(n2 == 0, s"second pass must admit nothing, admitted $n2")
  }

  test("admission plan never shuffles or broadcasts the index") {
    val idx = tmpIndex()
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    IncrementalDedup.writeExactIndex(docs.filter($"doc_id" < 250), idx)
    // the pre-checkpoint join (dedupeBatchExact cuts lineage eagerly, so
    // its returned plan is just the checkpoint RDD scan)
    val admission = IncrementalDedup.admissionFrame(
      docs.filter($"doc_id" >= 250), spark.read.parquet(idx))
    assert(admission.count() == 250) // finalize the adaptive plan
    val plan = admission.queryExecution.executedPlan.toString
    // every join must be a broadcast join building on the batch-derived
    // side; a sort-merge join would mean the corpus-sized index shuffled
    assert(!plan.contains("SortMergeJoin"),
      s"index must not shuffle into a sort-merge join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast probes of the index scan:\n$plan")
  }
}
