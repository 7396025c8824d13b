package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{DedupRewrite, EventsSketches}
import graft.sources.Tables

/** sf0.1 parity for the r8 numerics (VERDICT r8 task 8), extending the
  * Sf01DedupParitySpec pattern: the DuckDB oracle gates at sf0.01; the
  * span-rewrite tokenization (chunk boundaries shift with every extra
  * token) and the bitmap stores' bucket boundaries (id range 10× wider →
  * different bucket population) are exactly the numerics a
  * correct-at-one-SF bug would slip past. Each is re-checked at sf0.1
  * against an INDEPENDENT implementation: a driver-side plain-Scala
  * rewrite and Spark's own countDistinct respectively. */
class Sf01RewriteParitySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val sfBig = "/root/testdata/sf0.1"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("dedup_chunks at sf0.1 equals a driver-side plain-Scala rewrite", SlowTest) {
    // independent path: collect raw text, re-derive normalization,
    // 16-token chunking, md5 keys, global (doc_id, idx) first-seen, and
    // the rebuild — no engine Column code involved
    val raw = Tables.documents(spark, sfBig)
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
    val w = DedupRewrite.ChunkWords
    val toks: Map[Long, Array[String]] = raw.map { case (id, text) =>
      val norm = text.toLowerCase.replaceAll("\\s+", " ").trim
      id -> (if (norm.isEmpty) Array.empty[String] else norm.split(" "))
    }.toMap
    val seen = scala.collection.mutable.Set.empty[String]
    val expected = raw.map { case (id, _) =>
      val ts = toks(id)
      val chunks = ts.grouped(w).map(_.mkString(" ")).toArray
      val kept = chunks.zipWithIndex.filter { case (c, _) => seen.add(md5hex(c)) }
      (id, ts.length.toLong, kept.length.toLong, kept.map(_._1).mkString(" "))
    }.toSeq
    val actual = DedupRewrite.dedupChunks(spark, sfBig)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(actual.size == expected.size)
    actual.zip(expected).foreach { case (a, e) => assert(a == e, s"doc ${e._1}") }
  }

  test("events_bitmap_window at sf0.1 equals Spark's own windowed countDistinct", SlowTest) {
    val events = Tables.events(spark, sfBig)
    val start = events.agg(min(to_date($"ts"))).head().getDate(0).toLocalDate
    val expected = events
      .filter(to_date($"ts") >= lit(java.sql.Date.valueOf(start)) &&
        to_date($"ts") < lit(java.sql.Date.valueOf(start.plusDays(7))))
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_users"))
      .as[(String, Long)].collect().toMap
    val actual = EventsSketches.eventsBitmapWindow(spark, sfBig)
      .as[(String, Long)].collect().toMap
    assert(actual == expected)
  }

  test("bitmap admission across REAL bucket boundaries at sf0.1 equals countDistinct", SlowTest) {
    // sf0.1 user ids top out under one 32k bitmap bucket, so the parity
    // runs above never cross a boundary — synthesize the crossing: the
    // corpus unioned with a +40000-shifted-id copy spans 3 buckets and
    // puts ids on both sides of the 32768 seam, admitted in interleaved
    // halves through the SAME admission path as the driver face
    val store = java.nio.file.Files
      .createTempDirectory("graft_bmwide_").toString
    try {
      val events = Tables.events(spark, sfBig)
        .select($"event_id", $"event_type", $"user_id")
      val wide = events.unionAll(events
        .select($"event_id" + 1000000, $"event_type", $"user_id" + 40000)
        .toDF("event_id", "event_type", "user_id"))
      EventsSketches.admitBitmaps(spark, store, wide.filter($"event_id" % 2 === 0))
      EventsSketches.admitBitmaps(spark, store, wide.filter($"event_id" % 2 =!= 0))
      val actual = EventsSketches.distinctFromStore(spark, store)
        .as[(String, Long)].collect().toMap
      val expected = wide.groupBy($"event_type")
        .agg(countDistinct($"user_id").as("n"))
        .as[(String, Long)].collect().toMap
      assert(actual == expected)
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(store)): Unit
  }

  test("events_bitmap_incremental at sf0.1 equals Spark's own countDistinct", SlowTest) {
    val expected = Tables.events(spark, sfBig)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_users"))
      .as[(String, Long)].collect().toMap
    val actual = EventsSketches.eventsBitmapIncremental(spark, sfBig)
      .as[(String, Long)].collect().toMap
    assert(actual == expected)
  }
}
