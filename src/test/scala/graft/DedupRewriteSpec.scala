package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DedupRewrite
import graft.functions.TextFunctions
import graft.sources.Tables

class DedupRewriteSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val W = DedupRewrite.ChunkWords

  /** A distinct 16-token chunk labelled `tag`. */
  private def chunk(tag: String): String =
    (1 to W).map(i => s"$tag$i").mkString(" ")

  private def docsFixture(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_chunks_").toString
    rows.map { case (id, text) => (id, text, "en", "src", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dedup_chunks keeps exactly the first occurrence of every span") {
    val (a, b, c, d) = (chunk("a"), chunk("b"), chunk("c"), chunk("d"))
    val tail = "t1 t2 t3" // a short final chunk (< W tokens)
    val dir = docsFixture(Seq(
      0L -> s"$a $b",        // first occurrences of a and b
      1L -> s"$a $c",        // a is a dup; c first occurs here (idx 1)
      2L -> s"$c $d $tail",  // c dup (doc1 wins on doc_id); d + tail kept
      3L -> s"$b $a",        // both chunks seen before -> empties entirely
      4L -> s"$tail $a"))    // within-chunk REUSE of 'tail' words: this
                             // chunk is "t1 t2 t3 a1..a13" — a DIFFERENT
                             // span than doc2's trailing "t1 t2 t3", kept
    val got = DedupRewrite.dedupChunks(spark, dir)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(0L) == ((2L * W, 2L, s"$a $b")))
    assert(got(1L) == ((2L * W, 1L, c)), "duplicate leading chunk removed")
    assert(got(2L) == ((2L * W + 3, 2L, s"$d $tail")),
      "short tail chunk is its own span")
    assert(got(3L) == ((2L * W, 0L, "")), "all-duplicate doc empties")
    // doc4: tokens = t1 t2 t3 a1..a16 -> chunk0 = "t1 t2 t3 a1..a13"
    // (novel), chunk1 = "a14 a15 a16" (novel) -> everything kept
    assert(got(4L)._2 == 2L && got(4L)._3 == s"$tail $a")
  }

  test("corpus-wide: kept spans are the distinct spans, each at its minimal position") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", TextFunctions.wordTokens($"text").as("toks"))
      .as[(Long, Seq[String])].collect()
    // driver recompute of the chunking + global first-occurrence policy
    val allChunks = docs.flatMap { case (id, toks) =>
      toks.grouped(W).zipWithIndex.map { case (ws, i) =>
        (id, i.toLong, ws.mkString(" "))
      }
    }
    val firstOf = allChunks.groupBy(_._3).view
      .mapValues(cs => cs.map(x => (x._1, x._2)).min).toMap
    val expect = allChunks
      .filter(ch => firstOf(ch._3) == ((ch._1, ch._2)))
      .groupBy(_._1).view
      .mapValues(cs => cs.sortBy(_._2).map(_._3).mkString(" ")).toMap

    val got = DedupRewrite.dedupChunks(spark, sf)
      .as[(Long, Long, Long, String)].collect()
    got.foreach { case (id, nTok, nKept, text) =>
      val exp = expect.getOrElse(id, "")
      assert(text == exp, s"doc $id rebuild mismatch")
      assert(nKept == (if (exp.isEmpty) 0 else expect(id).split(" ").grouped(W).size
        // nKept counts chunks of the ORIGINAL doc that survived, which is
        // exactly the number of chunks in the rebuilt text
        ), s"doc $id kept-count")
      assert(nTok == docs.find(_._1 == id).get._2.length.toLong)
    }
    // global guarantee: every distinct span survives somewhere, exactly once
    val keptSpans = got.flatMap(r => r._4.split(" ").filter(_.nonEmpty)
      .grouped(W).map(_.mkString(" ")))
    assert(keptSpans.length == keptSpans.distinct.length,
      "no span may survive twice")
    assert(keptSpans.toSet == allChunks.map(_._3).toSet,
      "every distinct span must survive exactly once")
  }

  test("incremental: ordered half+half admission equals the from-scratch rewrite") {
    val (a, b, c, d) = (chunk("a"), chunk("b"), chunk("c"), chunk("d"))
    val dir = docsFixture(Seq(
      0L -> s"$a $b", 1L -> s"$c $a", 2L -> s"$b $d", 3L -> s"$d $c"))
    val scratch = DedupRewrite.dedupChunks(spark, dir).collect().map(_.toSeq)
    val store = java.nio.file.Files
      .createTempDirectory("graft_chunk_inc_").toString
    val docs = Tables.documents(spark, dir)
    // batch 2 re-encounters a (doc0) and b (doc0) cross-batch, d within-run
    val o1 = queries.IncrementalDedup.dedupeBatchChunks(
      docs.filter($"doc_id" <= 1), store)
    val o2 = queries.IncrementalDedup.dedupeBatchChunks(
      docs.filter($"doc_id" > 1), store)
    val inc = o1.unionAll(o2).orderBy($"doc_id").collect().map(_.toSeq)
    assert(inc.toSeq == scratch.toSeq)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
  }

  test("incremental: idempotent replay no-ops; index survives compaction") {
    import graft.sources.Store
    val (a, e) = (chunk("a"), chunk("e"))
    val dir1 = docsFixture(Seq(0L -> s"$a $e"))
    val store = java.nio.file.Files
      .createTempDirectory("graft_chunk_idem_").toString
    val docs1 = Tables.documents(spark, dir1)
    val first = queries.IncrementalDedup
      .dedupeBatchChunks(docs1, store, id = Some("b1"))
      .collect().map(_.toSeq)
    val deltasAfterFirst = Store.deltaCount(store)
    // replayed micro-batch id: admission is a no-op, store unchanged, and
    // the RETURNED rebuild must reproduce the original admission's output
    // (served from the index's stored positions), not strip the docs
    val replay = queries.IncrementalDedup
      .dedupeBatchChunks(docs1, store, id = Some("b1"))
      .collect().map(_.toSeq)
    assert(Store.deltaCount(store) == deltasAfterFirst,
      "replaying an admitted batch id must not append")
    assert(replay.toSeq == first.toSeq,
      "a replay must return the same rebuilt batch as the original admission")
    // compact, then admit a batch that duplicates indexed spans: still
    // dropped — the index content is compaction-invariant
    Store.compact(spark, store)
    val dir2 = docsFixture(Seq(9L -> s"$e $a"))
    val o = queries.IncrementalDedup.dedupeBatchChunks(
      Tables.documents(spark, dir2), store, id = Some("b2"))
      .as[(Long, Long, Long, String)].collect()
    assert(o.toSeq == Seq((9L, 2L * W, 0L, "")),
      s"indexed spans must stay dropped after compaction, got ${o.toSeq}")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
  }

  test("incremental: out-of-order admission still keeps exactly one copy per span") {
    val (a, b, c) = (chunk("a"), chunk("b"), chunk("c"))
    val dir = docsFixture(Seq(
      0L -> s"$a $b", 1L -> s"$b $c", 2L -> s"$c $a"))
    val store = java.nio.file.Files
      .createTempDirectory("graft_chunk_ooo_").toString
    val docs = Tables.documents(spark, dir)
    // admit HIGH ids first: which copy survives changes (first-seen), the
    // exactly-once guarantee must not
    val o1 = queries.IncrementalDedup.dedupeBatchChunks(
      docs.filter($"doc_id" === 2), store)
    val o2 = queries.IncrementalDedup.dedupeBatchChunks(
      docs.filter($"doc_id" < 2), store)
    val texts = (o1.collect() ++ o2.collect()).map(_.getString(3))
    val spans = texts.filter(_.nonEmpty)
      .flatMap(_.split(" ").grouped(W).map(_.mkString(" ")))
    assert(spans.sorted.toSeq == Seq(a, b, c).sorted,
      s"every span exactly once, got ${spans.toSeq}")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
  }

  test("empty corpus: batch and incremental faces both return zero rows") {
    val dir = docsFixture(Seq.empty)
    assert(DedupRewrite.dedupChunks(spark, dir).count() == 0)
    assert(DedupRewrite.dedupChunksIncremental(spark, dir).count() == 0)
  }

  test("streaming: id-ordered micro-batches reproduce the from-scratch rewrite") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = java.nio.file.Files
      .createTempDirectory("graft_chunk_stream_").toString
    val docs = Tables.documents(spark, sf)
    val raw = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().sortBy(_._1)
    val input = MemoryStream[(Long, String)]
    val q = queries.IncrementalDedup.chunkStreamingAdmission(
      input.toDF().toDF("doc_id", "text"), store).start()
    try {
      // three CONTIGUOUS id-range micro-batches, ascending — the ordering
      // under which streaming first-seen-wins equals the global min policy
      raw.grouped((raw.length + 2) / 3).foreach { s =>
        input.addData(s.toSeq); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = queries.IncrementalDedup
      .rebuildFromChunkIndex(docs, store).collect().map(_.toSeq)
    val batch = DedupRewrite.dedupChunks(spark, sf).collect().map(_.toSeq)
    assert(streamed.toSeq == batch.toSeq,
      "the store-served rewrite must equal the batch operator")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
  }

  test("the first-occurrence window never carries span text (ids+hash only)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = DedupRewrite.dedupChunks(spark, sf)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: LWindow => w }
    assert(windows.nonEmpty, "plan must contain the first-occurrence window")
    windows.foreach { w =>
      val cols = w.child.output.map(_.name).toSet
      assert(!cols.contains("chunk") && !cols.contains("text") &&
        !cols.contains("toks"),
        s"window input must be (doc_id, idx, ck) only, got $cols")
    }
  }
}
