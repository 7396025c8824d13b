package graft

import java.nio.file.Files

import org.apache.commons.io.FileUtils
import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.MalformedInput
import graft.sources.Tables

/** Malformed-input contract: PERMISSIVE quarantines with evidence,
  * DROPMALFORMED silently eats, FAILFAST kills the read. The corruption
  * rule is key-deterministic, so expected counts derive from the clean
  * tables. */
class MalformedInputSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def withFixture(write: (String) => Unit)(body: String => Unit): Unit = {
    val dir = Files.createTempDirectory("graft_malformed_").toString
    try { write(dir); body(dir) }
    finally FileUtils.deleteQuietly(new java.io.File(dir)): Unit
  }

  test("FAILFAST throws on the corrupted JSON fixture; PERMISSIVE reads it whole") {
    withFixture(MalformedInput.writeCorruptJson(spark, sf, _)) { dir =>
      val failfast = spark.read
        .schema(MalformedInput.corruptJsonSchema)
        .option("mode", "FAILFAST").json(dir)
      assertThrows[SparkException](failfast.count())
      // cached: corrupt-column-only queries on raw files are rejected
      val permissive = spark.read
        .schema(MalformedInput.corruptJsonSchema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(dir)
        .cache()
      val total = Tables.orders(spark, sf).count()
      assert(permissive.count() == total)
      val nBad = Tables.orders(spark, sf)
        .filter($"o_orderkey" % 97 === 0).count()
      assert(nBad > 0, "fixture must actually corrupt rows at sf0.001")
      assert(permissive.filter($"_corrupt_record".isNotNull).count() == nBad)
      // corrupt rows carry NULL typed columns — the PERMISSIVE contract
      assert(permissive.filter($"_corrupt_record".isNotNull &&
        $"o_orderkey".isNotNull).count() == 0)
    }
  }

  test("DROPMALFORMED drops exactly the corrupted rows, keeping no evidence") {
    withFixture(MalformedInput.writeCorruptJson(spark, sf, _)) { dir =>
      val dropped = spark.read
        .schema(MalformedInput.corruptJsonSchema)
        .option("mode", "DROPMALFORMED").json(dir)
      val expected = Tables.orders(spark, sf)
        .filter($"o_orderkey" % 97 =!= 0).count()
      assert(dropped.count() == expected)
    }
  }

  test("CSV FAILFAST throws on the bad-field fixture; quarantine keys recover from raw lines") {
    withFixture(MalformedInput.writeBadCsv(spark, sf, _)) { dir =>
      val failfast = spark.read
        .schema(MalformedInput.badCsvSchema)
        .option("mode", "FAILFAST").csv(dir)
      // count() on CSV is a columnless scan that skips field parsing
      // entirely (so FAILFAST never sees the bad field) — the action must
      // reference a typed column to force the parse
      assertThrows[SparkException](failfast.select("c_acctbal").collect())
      val out = MalformedInput.q70CsvQuarantine(spark, sf)
      val q = out.filter($"segment" === "_quarantine").head()
      val expectedKeys = Tables.customer(spark, sf)
        .filter($"c_custkey" % 53 === 0)
        .agg(count(lit(1)), min($"c_custkey"), max($"c_custkey")).head()
      assert(q.getLong(1) == expectedKeys.getLong(0))
      assert(q.getLong(3) == expectedKeys.getLong(1))
      assert(q.getLong(4) == expectedKeys.getLong(2))
    }
  }

  test("streaming PERMISSIVE quarantine matches the batch accounting") {
    withFixture(MalformedInput.writeCorruptJson(spark, sf, _)) { dir =>
      val q = MalformedInput.corruptJsonStream(spark, dir)
        .writeStream.outputMode("complete")
        .format("memory").queryName("corrupt_stream_out")
        .option("checkpointLocation",
          Files.createTempDirectory("graft_mis_ck_").toString)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      val streamed = spark.table("corrupt_stream_out")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val batch = MalformedInput.q69CorruptJson(spark, sf)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(streamed == batch)
      assert(streamed.contains("_corrupt"))
    }
  }

  test("q69 accounting conserves rows: clean + corrupt = table size") {
    val out = MalformedInput.q69CorruptJson(spark, sf)
    val total = out.agg(sum($"n_rows")).head().getLong(0)
    assert(total == Tables.orders(spark, sf).count())
    assert(out.filter($"status" === "_corrupt").count() == 1)
  }

  test("q69 on an EMPTY corpus reports _corrupt = 0, not NULL (the oracle's count(*) semantics)") {
    // an empty orders table: the global-sum corrupt branch has zero input
    // rows, where sum() is NULL but the oracle's count(*) is 0
    withFixture { dir =>
      Tables.orders(spark, sf).limit(0)
        .write.parquet(s"$dir/orders.parquet")
    } { dir =>
      val rows = MalformedInput.q69CorruptJson(spark, dir).collect()
      assert(rows.length == 1, s"only the unconditional _corrupt row: ${rows.toSeq}")
      assert(rows.head.getString(0) == "_corrupt")
      assert(!rows.head.isNullAt(1) && rows.head.getLong(1) == 0L,
        "empty-corpus corrupt count must be 0, not NULL")
    }
  }
}
