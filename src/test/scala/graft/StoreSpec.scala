package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{EventsQueries, IncrementalDedup}
import graft.sources.{Store, Tables}

/** Persisted-store protocol contract (the round-7 stated operational debt,
  * now code): admissions are ATOMIC — a job that dies anywhere before the
  * commit rename leaves the store byte-for-byte readable and un-admitted,
  * never holding a prefix of the batch — and admit-count-triggered
  * compaction keeps the file count bounded without changing a single
  * admission decision or flag. */
class StoreSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpStore(): String =
    Files.createTempDirectory("graft_store_").toString + "/store"

  private def parquetFiles(dir: String): Int = {
    def walk(f: File): Seq[File] = {
      val fs = f.listFiles()
      if (fs == null) Seq.empty
      else fs.toSeq.flatMap(c => if (c.isDirectory) walk(c) else Seq(c))
    }
    walk(new File(dir)).count(_.getName.endsWith(".parquet"))
  }

  test("a crashed admission never half-admits: staged-but-uncommitted batch is invisible") {
    val idx = tmpStore()
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    IncrementalDedup.writeExactIndex(docs.filter($"doc_id" < 100), idx)
    val before = Store.read(spark, idx).select($"fp").as[String].collect().toSet

    // simulate the crash: the admission runs to completion EXCEPT the final
    // commit rename — exactly the window where a plain SaveMode.Append
    // would already have leaked task files into the store
    val batch = docs.filter($"doc_id" >= 100 && $"doc_id" < 200)
    val staged = batch.select($"doc_id", md5($"text").as("fp"))
      .groupBy($"fp").agg(min($"doc_id").as("keeper_id"))
    val (tmp, fin) = Store.stage(staged, idx)
    assert(tmp.exists() && !fin.exists())
    assert(Store.read(spark, idx).select($"fp").as[String].collect().toSet == before,
      "a staged (crashed) batch must be invisible to readers")

    // recovery is a plain re-admit: the full batch admits (nothing was
    // half-recorded as seen), and the orphaned staging dir is swept by the
    // next compaction
    val admitted = IncrementalDedup.dedupeBatchExact(batch, idx)
    assert(admitted.count() == batch.count(),
      "crashed admission must not have marked any batch doc as seen")
    // the orphan lives in the staging SIBLING (outside the store; a fresh
    // one is indistinguishable from a live foreign write) and is swept by
    // compaction once quiet past the stale window
    def backdate(f: File): Unit = {
      f.setLastModified(System.currentTimeMillis() - 11L * 60 * 1000): Unit
      val kids = f.listFiles(); if (kids != null) kids.foreach(backdate)
    }
    backdate(tmp)
    Store.compact(spark, idx, numFiles = 2)
    assert(!tmp.exists(), "compaction must sweep stale orphaned staging dirs")
  }

  test("commit makes the whole batch visible at once") {
    val dir = tmpStore()
    Store.append(Seq((1L, "a")).toDF("id", "v"), dir)
    val (tmp, fin) = Store.stage(Seq((2L, "b"), (3L, "c")).toDF("id", "v"), dir)
    assert(Store.read(spark, dir).count() == 1)
    Store.commitStaged(tmp, fin)
    assert(Store.read(spark, dir).select($"id").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("exact-index compaction changes no admission decision and reduces files") {
    val idx = tmpStore()
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val ids = docs.select($"doc_id").as[Long].collect().sorted
    val q = ids(ids.length / 4)
    IncrementalDedup.writeExactIndex(docs.filter($"doc_id" < q), idx)
    // several admits, maintenance disabled, so deltas pile up
    (1 to 3).foreach { i =>
      IncrementalDedup.dedupeBatchExact(
        docs.filter($"doc_id" >= q * i && $"doc_id" < q * (i + 1)),
        idx, maintainEvery = 0).count()
    }
    val before = Store.read(spark, idx)
      .select($"fp", $"keeper_id").as[(String, Long)].collect().toSet
    val filesBefore = parquetFiles(idx)
    assert(Store.deltaCount(idx) == 3)

    Store.compact(spark, idx, numFiles = 2)

    val after = Store.read(spark, idx)
      .select($"fp", $"keeper_id").as[(String, Long)].collect().toSet
    assert(after == before, "compaction must preserve the index contents exactly")
    assert(Store.deltaCount(idx) == 0)
    assert(parquetFiles(idx) < filesBefore,
      s"expected fewer files after compaction: $filesBefore -> ${parquetFiles(idx)}")
    // idempotence survives the rewrite: nothing re-admits
    val again = IncrementalDedup.dedupeBatchExact(
      docs.filter($"doc_id" >= q && $"doc_id" < q * 4), idx)
    assert(again.count() == 0, "compaction must not forget admitted fingerprints")
  }

  test("admit-count trigger fires maintenance automatically") {
    val idx = tmpStore()
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    IncrementalDedup.writeExactIndex(docs.filter($"doc_id" < 50), idx)
    IncrementalDedup.dedupeBatchExact(
      docs.filter($"doc_id" >= 50 && $"doc_id" < 100), idx, maintainEvery = 2)
    assert(Store.deltaCount(idx) == 1, "below threshold: delta retained")
    IncrementalDedup.dedupeBatchExact(
      docs.filter($"doc_id" >= 100 && $"doc_id" < 150), idx, maintainEvery = 2)
    assert(Store.deltaCount(idx) == 0, "threshold reached: store compacted flat")
    // and the compacted index still equals the three slices' keepers
    val keepers = Store.read(spark, idx).select($"keeper_id").as[Long].collect().toSet
    val expect = graft.queries.Dedup.dedupExact(spark, sf)
      .select($"keeper_id").as[Long].collect().toSet.filter(_ < 150)
    assert(keepers == expect)
  }

  test("anomaly store: flags identical across a sum-merging compaction") {
    val store = tmpStore()
    val ev = Tables.events(spark, sf)
    def flags(df: org.apache.spark.sql.DataFrame): Set[(String, String, Long, Long)] =
      df.select($"event_type", $"day", $"cnt", $"dev_n")
        .as[(String, String, Long, Long)].collect().toSet
    // two half admits, no maintenance: 2 delta dirs, rows = 2x(type,day) keys
    EventsQueries.anomalyAdmitBatch(ev.filter($"event_id" % 2 === 0), store,
      maintainEvery = 0).count()
    val before = flags(EventsQueries.anomalyAdmitBatch(
      ev.filter($"event_id" % 2 =!= 0), store, maintainEvery = 0))
    val rowsBefore = Store.read(spark, store).count()
    assert(Store.deltaCount(store) == 2)

    Store.compact(spark, store, numFiles = 1,
      rewrite = _.groupBy($"event_type", $"day").agg(sum($"cnt_delta").as("cnt_delta")))

    // the merge rewrite shrinks rows to live (type, day) keys...
    val rowsAfter = Store.read(spark, store).count()
    assert(rowsAfter < rowsBefore, s"merge rewrite should shrink rows: $rowsBefore -> $rowsAfter")
    // ...and a fresh empty admit re-derives the identical flag set
    val emptyBatch = ev.filter(lit(false))
    val after = flags(EventsQueries.anomalyAdmitBatch(emptyBatch, store))
    assert(after == before, "compaction must not change a single flag")
    // the full-history flag set still equals the batch operator's
    assert(after == flags(EventsQueries.eventsAnomaly(spark, sf)))
  }

  test("schema evolution across admits is deterministic: union schema, NULL backfill") {
    val dir = Files.createTempDirectory("graft_store_evo_").toString
    Store.append(Seq((1L, "a")).toDF("k", "v"), dir)
    // an upgraded operator starts writing an extra column
    Store.append(Seq((2L, "b", 9L)).toDF("k", "v", "extra"), dir)
    val df = Store.read(spark, dir)
    // mergeSchema pins the union schema regardless of file-listing order —
    // without it Spark samples ONE footer and the new column appears or
    // silently vanishes by luck
    assert(df.schema.fieldNames.toSet == Set("k", "v", "extra"))
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
    assert(rows == Set((1L, "a", None), (2L, "b", Some(9L))),
      s"pre-upgrade rows must carry NULL for the new column: $rows")
    // compaction folds both generations into the union schema losslessly
    Store.compact(spark, dir)
    val after = Store.read(spark, dir).collect().map(r =>
      (r.getLong(r.fieldIndex("k")), r.getString(r.fieldIndex("v")),
        Option(r.get(r.fieldIndex("extra"))).map(_.asInstanceOf[Long]))).toSet
    assert(after == rows)
  }
}
