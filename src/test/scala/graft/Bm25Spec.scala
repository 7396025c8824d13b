package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions => TF}
import graft.queries.Bm25
import graft.sources.{Store, Tables}

/** BM25 index contract: the served ranking equals an independent
  * driver-side recompute, admission granularity/replay/compaction are
  * invisible, both cell kinds commit atomically, and the terms filter
  * prunes the postings scan.
  */
class Bm25Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def freshStore(): String = java.nio.file.Files
    .createTempDirectory("graft_bm25_spec_").toString

  private def sweep(dir: String): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)): Unit
  }

  private val terms = Seq("join", "hash", "window")

  /** Independent BM25: engine tokens (tokenization owned by TextAnalysis
    * specs), plain-Scala everything else. */
  private def denseBm25(k: Int): Seq[(Long, Double, Long)] = {
    val toks = Tables.documents(spark, sf)
      .select($"doc_id", TF.wordTokens($"text").as("ts"))
      .as[(Long, Seq[String])].collect()
    val n = toks.length
    val avgdl = toks.map(_._2.length.toLong).sum.toDouble / n
    val df = terms.map { t =>
      t -> toks.count(_._2.contains(t))
    }.toMap
    val (k1, b) = (1.2, 0.75)
    toks.flatMap { case (id, ts) =>
      val dl = ts.length
      val contribs = terms.flatMap { t =>
        val tf = ts.count(_ == t)
        if (tf == 0) None
        else {
          val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
          Some(idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl)))
        }
      }
      if (contribs.isEmpty) None
      else Some((id, contribs.sum, contribs.size.toLong))
    }.sortBy { case (id, s, _) => (-s, id) }.take(k)
      .map { case (id, s, nt) => (id, math.round(s * 1e4) / 1e4, nt) }
  }

  test("served ranking equals the dense recompute; 4-way admission ≡ one-shot") {
    val (one, inc) = (freshStore(), freshStore())
    try {
      val docs = Tables.documents(spark, sf)
      Bm25.admitDocs(spark, one, docs)
      (0 until 4).foreach { i =>
        Bm25.admitDocs(spark, inc, docs.filter($"doc_id" % 4 === i),
          id = Some(s"q$i"))
      }
      val expect = denseBm25(10)
      val a = Bm25.rankFromStore(spark, one, terms)
        .as[(Long, Double, Long)].collect().toSeq
      val b = Bm25.rankFromStore(spark, inc, terms)
        .as[(Long, Double, Long)].collect().toSeq
      assert(a == expect, s"one-shot: got=$a expect=$expect")
      assert(b == expect, "interleaved admission must be invisible")
    } finally { sweep(one); sweep(inc) }
  }

  test("one admission = one atomic delta with both cell kinds") {
    val store = freshStore()
    try {
      Bm25.admitDocs(spark, store, Tables.documents(spark, sf), id = Some("a"))
      assert(Store.deltaCount(store) == 1)
      val kinds = Store.read(spark, store).select($"kind").distinct()
        .as[String].collect().toSet
      assert(kinds == Set("p", "d"),
        "postings without doc lengths (or vice versa) = torn index")
    } finally sweep(store)
  }

  test("unkeyed replay and compaction are both invisible (set-monoid cells)") {
    val store = freshStore()
    try {
      val docs = Tables.documents(spark, sf)
      (0 until 4).foreach { i =>
        Bm25.admitDocs(spark, store, docs.filter($"doc_id" % 4 === i),
          maintainEvery = 2, id = Some(s"r$i"))
      }
      Bm25.admitDocs(spark, store, docs.filter($"doc_id" % 4 === 0), id = None)
      assert(Store.deltaCount(store) < 5, "compaction must have folded")
      assert(Bm25.rankFromStore(spark, store, terms)
        .as[(Long, Double, Long)].collect().toSeq == denseBm25(10))
    } finally sweep(store)
  }

  test("the terms filter prunes the postings scan") {
    val store = freshStore()
    try {
      Bm25.admitDocs(spark, store, Tables.documents(spark, sf))
      val df = Bm25.rankFromStore(spark, store, terms)
      df.collect()
      val plan = df.queryExecution.sparkPlan.toString
      assert(plan.contains("In(token"),
        s"token IN (...) must reach the postings scan:\n$plan")
      assert(plan.contains("TakeOrderedAndProject"),
        s"top-10 must be a bounded heap:\n$plan")
    } finally sweep(store)
  }
}
