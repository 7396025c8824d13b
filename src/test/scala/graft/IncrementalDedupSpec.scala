package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Dedup, IncrementalDedup}
import graft.sources.Store
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
    val indexKeepers = Store.read(spark, idx)
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

  test("near-dup index drops perturbed copies, admits new docs, resolves within-batch") {
    val idx = tmpIndex()
    // corpus: 40 long distinct docs; batch: light perturbations of the
    // first 5 (one token changed -> true Jaccard ~0.95, well past the 0.8
    // estimator threshold), 5 genuinely new docs, and a within-batch
    // near-dup pair (2000/2001) of which min-id must survive
    def doc(seed: Int): String =
      (0 until 80).map(j => s"w${seed}t$j").mkString(" ")
    val corpus = (0 until 40).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
    IncrementalDedup.writeMinhashIndex(corpus, idx)
    val perturbed = (0 until 5).map { i =>
      ((1000 + i).toLong, doc(i).replace(s"w${i}t40", "changed"))
    }
    val fresh = (0 until 5).map(i => ((1500 + i).toLong, doc(100 + i)))
    val twin = Seq(
      (2000L, doc(200)),
      (2001L, doc(200).replace("w200t10", "altered")))
    val batch = (perturbed ++ fresh ++ twin).toDF("doc_id", "text")
    val admitted = IncrementalDedup.dedupeBatchNearDup(batch, idx)
      .as[Long].collect().toSet
    assert(admitted == (fresh.map(_._1).toSet + 2000L),
      s"admitted=$admitted")
    // idempotence: the admitted docs are now indexed; nothing re-admits
    assert(IncrementalDedup.dedupeBatchNearDup(batch, idx).count() == 0)
    // index grew by exactly the admitted signatures
    assert(Store.read(spark, idx).count() == 40 + 6)
  }

  test("dedupeBatchExact slots into foreachBatch (streaming face)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idx = tmpIndex()
    IncrementalDedup.writeExactIndex(
      Seq((0L, "seed doc one"), (1L, "seed doc two")).toDF("doc_id", "text"), idx)
    val input = MemoryStream[(Long, String)]
    val admittedLog = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream
      .outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        admittedLog ++= IncrementalDedup.dedupeBatchExact(df, idx)
          .select("doc_id").as[Long](spark.implicits.newLongEncoder).collect()
        ()
      }
      .start()
    try {
      input.addData((10L, "brand new"), (11L, "seed doc one")) // 11 is a dup of 0
      q.processAllAvailable()
      input.addData((12L, "brand new"), (13L, "also new")) // 12 dups batch-1's 10
      q.processAllAvailable()
    } finally q.stop()
    assert(admittedLog.toSet == Set(10L, 13L), s"admitted=$admittedLog")
    val keepers = Store.read(spark, idx).select($"keeper_id").as[Long].collect().toSet
    assert(keepers == Set(0L, 1L, 10L, 13L))
  }

  test("admission plan never shuffles or broadcasts the index") {
    val idx = tmpIndex()
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    IncrementalDedup.writeExactIndex(docs.filter($"doc_id" < 250), idx)
    // the pre-checkpoint join (dedupeBatchExact cuts lineage eagerly, so
    // its returned plan is just the checkpoint RDD scan)
    val admission = IncrementalDedup.admissionFrame(
      docs.filter($"doc_id" >= 250), Store.read(spark, idx))
    assert(admission.count() == 250) // finalize the adaptive plan
    val plan = admission.queryExecution.executedPlan.toString
    // every join must be a broadcast join building on the batch-derived
    // side; a sort-merge join would mean the corpus-sized index shuffled
    assert(!plan.contains("SortMergeJoin"),
      s"index must not shuffle into a sort-merge join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast probes of the index scan:\n$plan")
  }

  test("chunk admission plan never shuffles or broadcasts the index") {
    val idx = tmpIndex() + "/chunkplan"
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    // seed the store through the operator itself (self-bootstrapping)
    IncrementalDedup.dedupeBatchChunks(docs.filter($"doc_id" < 250), idx).count()
    val batchKeep = graft.queries.DedupRewrite
      .hashedChunks(graft.queries.DedupRewrite.tokenized(
        docs.filter($"doc_id" >= 250)))
      .groupBy($"ck")
      .agg(min(struct($"doc_id", $"idx")).as("f"))
      .select($"ck", $"f.doc_id".as("doc_id"), $"f.idx".as("idx"))
    val admission = IncrementalDedup.chunkAdmissionFrame(
      batchKeep, Store.read(spark, idx))
    admission.count() // finalize the adaptive plan
    val plan = admission.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"index must not shuffle into a sort-merge join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast probes of the index scan:\n$plan")
  }

  test("phash index: near-indexed payloads drop, within-batch twins resolve " +
      "to one rep, re-admission is a no-op") {
    val idx = tmpIndex() + "/phash"
    val seedText = (0 until 60).map(i => s"seed$i media payload").mkString(" ")
    IncrementalDedup.writePhashIndex(
      Seq((0L, seedText)).toDF("doc_id", "text"), idx)
    val nearSeed = seedText.replace("seed30", "retouch") // hamming <= 3 of seed
    val twinA = (0 until 60).map(i => s"fresh$i media frame").mkString(" ")
    val twinB = twinA.replace("fresh12", "spliced")
    val unrelated = (0 until 200).map(i =>
      ('a' + ((i * 7 + 3) % 26)).toChar.toString * 3).mkString("x")
    val batch = Seq(
      (10L, nearSeed),   // near an INDEXED payload -> dropped
      (11L, twinA),      // within-batch twins -> min id 11 admitted
      (12L, twinB),
      (13L, twinA),      // octet-identical to 11 -> collapses pre-banding
      (14L, unrelated))  // genuinely new -> admitted
      .toDF("doc_id", "text")
    val admitted = IncrementalDedup.dedupeBatchPhash(batch, idx)
      .as[Long].collect().toSet
    assert(admitted == Set(11L, 14L), s"admitted=$admitted")
    val stored = Store.read(spark, idx).select($"doc_id").as[Long].collect().toSet
    assert(stored == Set(0L, 11L, 14L), s"index=$stored")
    // idempotence: everything in the batch is now represented in the index
    val again = IncrementalDedup.dedupeBatchPhash(batch, idx)
      .as[Long].collect().toSet
    assert(again.isEmpty, s"re-admission must be a no-op, got $again")
    assert(Store.read(spark, idx).count() == 3)
  }

  test("phash incremental at volume: half+half equals from-scratch reps; " +
      "admission order shifts which member represents, never the class structure") {
    // planted corpus: 12 distinct media payloads, each with one re-encode
    // (single token swapped -> byte-simhash within Hamming <= 3 of its
    // base), plus two genuinely new payloads
    def doc(seed: Int): String = (0 until 60).map(j => s"m${seed}p$j").mkString(" ")
    val bases = (0 until 12).map(i => (i.toLong, doc(i)))
    val reenc = (0 until 12).map(i => ((100 + i).toLong, doc(i).replace(s"m${i}p30", "reenc")))
    val fresh = Seq((300L, doc(500)), (301L, doc(501)))
    val union = (bases ++ reenc ++ fresh).toDF("doc_id", "text")

    // independent ground truth: driver union-find over the BATCH operator's
    // verified pair list — the classes the incremental face must represent
    val pairs = graft.queries.Multimodal.multimodalPhashDedupOn(union)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    val ids = (bases ++ reenc ++ fresh).map(_._1)
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val classes = ids.groupBy(find)
    val scratchReps = classes.keySet // min-id per component

    // id-ordered half+half (the production shape): final index state equals
    // the from-scratch min-id representative set exactly
    val idx1 = tmpIndex() + "/phash1"
    IncrementalDedup.writePhashIndex(bases.toDF("doc_id", "text"), idx1)
    val adm1 = IncrementalDedup.dedupeBatchPhash((reenc ++ fresh).toDF("doc_id", "text"), idx1)
      .as[Long].collect().toSet
    assert(adm1 == Set(300L, 301L), s"admitted=$adm1")
    val stored1 = Store.read(spark, idx1).select($"doc_id").as[Long].collect().toSet
    assert(stored1 == scratchReps,
      s"idx-only=${stored1 -- scratchReps} scratch-only=${scratchReps -- stored1}")

    // a different batch split must converge to the same state
    val idx2 = tmpIndex() + "/phash2"
    IncrementalDedup.writePhashIndex(bases.toDF("doc_id", "text"), idx2)
    (reenc ++ fresh).grouped(5).foreach { g =>
      IncrementalDedup.dedupeBatchPhash(g.toDF("doc_id", "text"), idx2).count()
    }
    val stored2 = Store.read(spark, idx2).select($"doc_id").as[Long].collect().toSet
    assert(stored2 == scratchReps, s"split-dependent state: $stored2")

    // adversarial order (re-encodes arrive BEFORE their bases): the rep of
    // each class shifts to its earliest-arrived member — that is the honest
    // first-seen-wins semantic — but the class STRUCTURE is order-immune:
    // one rep per class, every class covered, no class double-represented
    assert(classes.values.forall(_.count(id => id >= 100) == 1),
      "fixture: each class must hold exactly one seed-side member")
    val idx3 = tmpIndex() + "/phash3"
    IncrementalDedup.writePhashIndex((reenc ++ fresh).toDF("doc_id", "text"), idx3)
    val admBases = IncrementalDedup.dedupeBatchPhash(bases.toDF("doc_id", "text"), idx3)
      .as[Long].collect().toSet
    assert(admBases.isEmpty,
      s"every base is represented by its re-encode, yet admitted $admBases")
    val stored3 = Store.read(spark, idx3).select($"doc_id").as[Long].collect().toSet
    val expected3 = classes.values.map(_.find(_ >= 100).get).toSet
    assert(stored3 == expected3, s"got=$stored3 expected=$expected3")
    assert(stored3.size == scratchReps.size,
      "admission order must never change the number of represented classes")
  }

  test("phash streaming: micro-batches into a FRESH store bootstrap and converge") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // same planted corpus as the volume test: 12 base/re-encode classes + 2 fresh
    def doc(seed: Int): String = (0 until 60).map(j => s"m${seed}p$j").mkString(" ")
    val bases = (0 until 12).map(i => (i.toLong, doc(i)))
    val reenc = (0 until 12).map(i => ((100 + i).toLong, doc(i).replace(s"m${i}p30", "reenc")))
    val fresh = Seq((300L, doc(500)), (301L, doc(501)))

    val store = tmpIndex() + "/phash_stream" // no writePhashIndex: bootstrap path
    val input = MemoryStream[(Long, String)]
    val q = IncrementalDedup.phashStreamingAdmission(
      input.toDF().toDF("doc_id", "text"), store).start()
    try {
      input.addData(bases); q.processAllAvailable()
      input.addData(reenc ++ fresh); q.processAllAvailable()
    } finally q.stop()

    val stored = Store.read(spark, store).select($"doc_id").as[Long].collect().toSet
    // batch 1 admits every base (store was empty); batch 2 admits only the
    // two fresh payloads - identical to the sequential batch admission the
    // volume test pins against the union-find ground truth
    assert(stored == bases.map(_._1).toSet ++ Set(300L, 301L),
      s"streamed store state: $stored")
  }
}
