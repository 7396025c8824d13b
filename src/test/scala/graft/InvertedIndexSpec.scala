package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions => TF}
import graft.queries.InvertedIndex
import graft.sources.{Store, Tables}

/** Inverted-index contract: postings are a set-union monoid (replay is
  * harmless even UNKEYED — the OR-class store, pinned against the
  * +-class MV), admission order is invisible, compaction is the serve
  * merge, the terms filter reaches the postings scan, and AND-search
  * equals a driver-side token-set recompute.
  */
class InvertedIndexSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def freshStore(): String = java.nio.file.Files
    .createTempDirectory("graft_ii_spec_").toString

  private def sweep(dir: String): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)): Unit
  }

  private val terms = Seq("join", "hash")

  /** doc_id → token set, via the engine's own tokenizer column (the
    * contract under test is the index/search machinery, not tokenization —
    * TextAnalysis specs own that). */
  private def tokenSets(): Map[Long, Set[String]] =
    Tables.documents(spark, sf)
      .select($"doc_id", TF.wordTokens($"text").as("ts"))
      .as[(Long, Seq[String])].collect()
      .map { case (id, ts) => id -> ts.toSet }.toMap

  private def search(store: String): Set[Long] =
    InvertedIndex.searchFromStore(spark, store, terms)
      .as[Long].collect().toSet

  test("AND-search equals the token-set recompute; halves ≡ one-shot") {
    val (one, inc) = (freshStore(), freshStore())
    try {
      val docs = Tables.documents(spark, sf)
      InvertedIndex.admitDocs(spark, one, docs)
      InvertedIndex.admitDocs(spark, inc, docs.filter($"doc_id" % 2 === 0))
      InvertedIndex.admitDocs(spark, inc, docs.filter($"doc_id" % 2 =!= 0))
      val expect = tokenSets().collect {
        case (id, ts) if terms.forall(ts) => id
      }.toSet
      assert(expect.nonEmpty, "fixture terms must match some docs")
      assert(search(one) == expect)
      assert(search(inc) == expect)
    } finally { sweep(one); sweep(inc) }
  }

  test("UNKEYED replay is harmless: set union is idempotent (the OR-class store)") {
    val store = freshStore()
    try {
      val docs = Tables.documents(spark, sf)
      InvertedIndex.admitDocs(spark, store, docs, id = None)
      val before = search(store)
      InvertedIndex.admitDocs(spark, store, docs, id = None) // full unkeyed replay
      assert(search(store) == before,
        "a replayed postings union must not change any search result")
      // and the merged cells themselves are unchanged — not just the query
      val merged = Store.read(spark, store)
        .dropDuplicates("token", "doc_id").count()
      val fresh = freshStore()
      try {
        InvertedIndex.admitDocs(spark, fresh, docs)
        assert(merged == Store.read(spark, fresh)
          .dropDuplicates("token", "doc_id").count())
      } finally sweep(fresh)
    } finally sweep(store)
  }

  test("compaction folds deltas without changing any search") {
    val store = freshStore()
    try {
      val docs = Tables.documents(spark, sf)
      (0 until 6).foreach { i =>
        InvertedIndex.admitDocs(spark, store,
          docs.filter($"doc_id" % 6 === i), maintainEvery = 2,
          id = Some(s"p$i"))
      }
      assert(Store.deltaCount(store) < 6)
      val expect = tokenSets().collect {
        case (id, ts) if terms.forall(ts) => id
      }.toSet
      assert(search(store) == expect)
    } finally sweep(store)
  }

  test("the terms filter reaches the postings scan (pushed In predicate)") {
    val store = freshStore()
    try {
      InvertedIndex.admitDocs(spark, store, Tables.documents(spark, sf))
      val df = InvertedIndex.searchFromStore(spark, store, terms)
      df.collect()
      val plan = df.queryExecution.sparkPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("In(token"),
        s"token IN (...) must prune the postings scan:\n$plan")
    } finally sweep(store)
  }

  test("streamed admission serves the same search results") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = freshStore()
    try {
      val raw = Tables.documents(spark, sf)
        .select($"doc_id", $"text").as[(Long, String)].collect()
      val input = MemoryStream[(Long, String)]
      val q = InvertedIndex.searchStreamingAdmission(
        input.toDF().toDF("doc_id", "text"), store).start()
      try {
        raw.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1).foreach {
          case (_, s) => input.addData(s.map(_._1).toSeq); q.processAllAvailable()
        }
      } finally q.stop()
      val expect = tokenSets().collect {
        case (id, ts) if terms.forall(ts) => id
      }.toSet
      assert(search(store) == expect)
    } finally sweep(store)
  }

  test("phrase search: consecutive positions only — adjacency recompute parity") {
    val store = freshStore()
    try {
      val docs = Tables.documents(spark, sf)
      InvertedIndex.admitDocsPositional(spark, store,
        docs.filter($"doc_id" % 2 === 0))
      InvertedIndex.admitDocsPositional(spark, store,
        docs.filter($"doc_id" % 2 =!= 0))
      val got = InvertedIndex.phraseFromStore(spark, store, Seq("join", "hash"))
        .as[Long].collect().toSet
      val seqs = Tables.documents(spark, sf)
        .select($"doc_id", TF.wordTokens($"text").as("ts"))
        .as[(Long, Seq[String])].collect()
      val expect = seqs.collect {
        case (id, ts) if ts.zip(ts.drop(1)).contains(("join", "hash")) => id
      }.toSet
      assert(got == expect, s"got=${got.size} expect=${expect.size}")
      // the phrase set must be a strict refinement of the boolean AND —
      // there must exist docs with both tokens NOT adjacent, and they must
      // be excluded (otherwise this test proves nothing about positions)
      val both = seqs.collect {
        case (id, ts) if ts.contains("join") && ts.contains("hash") => id
      }.toSet
      assert(got.subsetOf(both) && got.size < both.size,
        s"fixture must distinguish adjacency from co-occurrence " +
          s"(phrase=${got.size}, AND=${both.size})")
    } finally sweep(store)
  }

  test("hybrid search: keyword slice then exact cosine rerank matches brute recompute") {
    val got = InvertedIndex.simHybridSearch(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq
    val cand = tokenSets().collect {
      case (id, ts) if terms.forall(ts) && id != 0 => id
    }.toSet
    val vecs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val (dot, na, nb) = a.zip(b).foldLeft((0.0, 0.0, 0.0)) {
        case ((d, x, y), (p, q)) =>
          (d + p.toDouble * q.toDouble, x + p.toDouble * p.toDouble,
            y + q.toDouble * q.toDouble)
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val qv = vecs(0L)
    val expect = cand.toSeq.map(id => (id, cos(qv, vecs(id))))
      .sortBy { case (id, c) => (-c, id) }.take(10).zipWithIndex
      .map { case ((id, c), i) =>
        (id, (i + 1).toLong, math.round(c * 1e4) / 1e4)
      }
    assert(got.map(r => (r._1, r._2, r._3)) == expect, s"got=$got expect=$expect")
  }
}
