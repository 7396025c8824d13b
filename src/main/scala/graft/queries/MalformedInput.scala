package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Malformed-input handling (VERDICT r8 task 6) — the last common
  * lake-ingest reality: real feeds carry truncated JSON, wrong-arity CSV
  * lines, and unparseable fields, and a pipeline that only ever reads
  * clean parquet has an untested first mile. Spark's contract, exercised
  * and oracle-checked here:
  *
  *  - PERMISSIVE (default): a malformed record parses to all-NULL columns
  *    plus the raw line in `columnNameOfCorruptRecord` — the schema MUST
  *    declare that column or the information is silently dropped;
  *  - DROPMALFORMED: bad rows vanish (quarantine-less — we don't use it;
  *    the accounting queries below keep the evidence instead);
  *  - FAILFAST: the first malformed record kills the read (spec-pinned).
  *
  * Fixture protocol: the corrupted files are GENERATED at query time from
  * the driver's own parquet tables into a temp directory, with corruption
  * keyed DETERMINISTICALLY on the primary key (`key % 97 == 0` / `% 53 ==
  * 0`) — so the DuckDB oracle never parses JSON/CSV at all: it computes
  * the same survivors/quarantine accounting from the clean table and the
  * corruption rule. (Writing under /root/testdata is off-limits, and a
  * checked-in fixture could drift from the tables; deriving at run time
  * keeps fixture and oracle definitionally in sync at every scale
  * factor.)
  *
  * Scale shape: corruption accounting is one PERMISSIVE scan + one hash
  * aggregate — the quarantine split (`_corrupt_record IS NULL` vs not) is
  * a map-side predicate, no join, no extra pass. At 100 TB the same read
  * options apply unchanged to a distributed text source; per-record parse
  * failure is the executor-local path Spark already codegens. */
object MalformedInput {

  /** Deterministic corruption keys — small primes so every scale factor
    * corrupts a few percent of rows (sf0.01: 1500 orders → ~15 bad). */
  private val JsonCorruptMod = 97L
  private val CsvCorruptMod = 53L

  private def tempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def sweep(dir: String): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)): Unit

  /** The corrupted-JSON fixture: one JSON object per order, TRUNCATED
    * mid-token when `o_orderkey % 97 == 0` (an unclosed object is
    * malformed for any parser, not just a strict one). Written as text so
    * the corruption survives verbatim. */
  private[graft] def writeCorruptJson(spark: SparkSession, dir: String,
      out: String): Unit = {
    import spark.implicits._
    val doc = to_json(struct($"o_orderkey", $"o_orderstatus", $"o_totalprice"))
    Tables.orders(spark, dir)
      .select(
        when($"o_orderkey" % JsonCorruptMod === 0,
          substring(doc, 1, 15)).otherwise(doc).as("value"))
      .write.mode("overwrite").text(out)
  }

  private[graft] val corruptJsonSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("_corrupt_record", StringType)))

  /** PERMISSIVE corrupt-record accounting over the JSON fixture: parsed
    * rows aggregate by status; malformed rows survive AS EVIDENCE under
    * the `_corrupt` pseudo-status (count only — their columns are NULL by
    * contract). Oracle: the same accounting computed from the clean
    * orders table and the `% 97` rule. */
  def q69CorruptJson(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixture = tempDir("graft_corrupt_json_")
    try {
      writeCorruptJson(spark, dir, fixture)
      val parsed = spark.read
        .schema(corruptJsonSchema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(fixture)
      // cache: both branches below share one parse (same discipline as q70)
      val cached = parsed.cache()
      // price sums in exact DECIMAL (the repo-wide discipline): a raw
      // double sum of ~10^4 rows is accumulation-order-dependent and can
      // round to different cents across engines
      val clean = cached.filter($"_corrupt_record".isNull)
        .groupBy($"o_orderstatus".as("status"))
        .agg(count(lit(1)).as("n_rows"),
          sum($"o_totalprice".cast("decimal(18,2)"))
            .cast("double").as("sum_price"))
      // GLOBAL aggregate, not a group: always emits its row, so a
      // zero-corruption feed still reports `_corrupt, 0` exactly like the
      // oracle's unconditional UNION ALL branch
      // coalesce: a global sum over ZERO rows is NULL, but the oracle's
      // UNION ALL branch is count(*) = 0 — the empty-corpus edge must
      // report 0, not NULL
      val corrupt = cached
        .agg(coalesce(sum($"_corrupt_record".isNotNull.cast("long")), lit(0L))
            .as("n_rows"),
          lit(null).cast("double").as("sum_price"))
        .select(lit("_corrupt").as("status"), $"n_rows", $"sum_price")
      try clean.unionAll(corrupt).orderBy($"status").localCheckpoint(true)
      finally cached.unpersist(): Unit
    } finally sweep(fixture)
  }

  val q69CorruptJsonSql: String =
    s"""SELECT o_orderstatus AS status, count(*) AS n_rows,
       |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
       |    AS sum_price
       |FROM orders WHERE o_orderkey % $JsonCorruptMod <> 0
       |GROUP BY o_orderstatus
       |UNION ALL
       |SELECT '_corrupt' AS status, count(*) AS n_rows,
       |  CAST(NULL AS DOUBLE) AS sum_price
       |FROM orders WHERE o_orderkey % $JsonCorruptMod = 0
       |ORDER BY status""".stripMargin

  /** The bad-CSV fixture: customer rows as CSV; when `c_custkey % 53 ==
    * 0` the numeric acctbal field is replaced by a non-numeric token (a
    * FIELD-level parse failure — the row has the right arity and still
    * fails, the case DROPMALFORMED silently eats). */
  private[graft] def writeBadCsv(spark: SparkSession, dir: String,
      out: String): Unit = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .select(concat_ws(",",
        $"c_custkey",
        $"c_mktsegment",
        when($"c_custkey" % CsvCorruptMod === 0, lit("NOT_A_NUMBER"))
          .otherwise($"c_acctbal".cast("string"))).as("value"))
      .write.mode("overwrite").text(out)
  }

  private[graft] val badCsvSchema: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_mktsegment", StringType),
    StructField("c_acctbal", DoubleType),
    StructField("_corrupt_record", StringType)))

  /** CSV bad-row quarantine: PERMISSIVE parse splits the feed into clean
    * rows (aggregated by market segment) and a quarantine whose SIZE and
    * KEY SET are preserved — the output carries min/max quarantined key so
    * the oracle pins that the right rows (not just the right number) were
    * quarantined. */
  def q70CsvQuarantine(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fixture = tempDir("graft_bad_csv_")
    try {
      writeBadCsv(spark, dir, fixture)
      // cache() is load-bearing: since Spark 2.3 a query whose referenced
      // columns are ONLY the corrupt-record column is rejected on raw
      // files (the parser would otherwise skip the very parse that
      // defines corruptness); the documented workaround is caching the
      // parsed frame, which both branches below then share anyway.
      val parsed = spark.read
        .schema(badCsvSchema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(fixture)
        .cache()
      val clean = parsed.filter($"_corrupt_record".isNull)
        .groupBy($"c_mktsegment".as("segment"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum($"c_acctbal".cast("decimal(12,2)"))
            .cast("double").as("sum_bal"),
          lit(null).cast("long").as("min_key"),
          lit(null).cast("long").as("max_key"))
      // quarantined rows: all typed columns NULL by contract, but the raw
      // line is retained — recover the key from it for the audit row
      val quarantined = parsed.filter($"_corrupt_record".isNotNull)
        .select(split($"_corrupt_record", ",").getItem(0)
          .cast("long").as("k"))
        .agg(
          count(lit(1)).as("n_rows"),
          lit(null).cast("double").as("sum_bal"),
          min($"k").as("min_key"),
          max($"k").as("max_key"))
        .select(lit("_quarantine").as("segment"),
          $"n_rows", $"sum_bal", $"min_key", $"max_key")
      try clean.unionAll(quarantined).orderBy($"segment").localCheckpoint(true)
      finally parsed.unpersist(): Unit
    } finally sweep(fixture)
  }

  val q70CsvQuarantineSql: String =
    s"""SELECT c_mktsegment AS segment, count(*) AS n_rows,
       |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal,
       |  CAST(NULL AS BIGINT) AS min_key, CAST(NULL AS BIGINT) AS max_key
       |FROM customer WHERE c_custkey % $CsvCorruptMod <> 0
       |GROUP BY c_mktsegment
       |UNION ALL
       |SELECT '_quarantine' AS segment, count(*) AS n_rows,
       |  CAST(NULL AS DOUBLE) AS sum_bal,
       |  min(c_custkey) AS min_key, max(c_custkey) AS max_key
       |FROM customer WHERE c_custkey % $CsvCorruptMod = 0
       |ORDER BY segment""".stripMargin

  /** Streaming face of the PERMISSIVE contract: the same corrupt-JSON
    * schema read as a FILE-SOURCE STREAM — a lake-ingest tail where
    * malformed records must be quarantined per micro-batch, not crash the
    * query. The parse options are identical to the batch path (Spark's
    * JSON parsing is source-mode-agnostic); what the streaming face adds
    * is the contract that corruption accounting composes with incremental
    * execution — pinned by the spec against the batch accounting. */
  def corruptJsonStream(spark: SparkSession, fixtureDir: String): DataFrame = {
    import spark.implicits._
    spark.readStream
      .schema(corruptJsonSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("maxFilesPerTrigger", "1") // one file per micro-batch
      .json(fixtureDir)
      .withColumn("status",
        when($"_corrupt_record".isNotNull, lit("_corrupt"))
          .otherwise($"o_orderstatus"))
      .groupBy($"status")
      .agg(count(lit(1)).as("n_rows"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q69_corrupt_json" -> (q69CorruptJson _),
    "q70_csv_quarantine" -> (q70CsvQuarantine _))

  val oracles: Map[String, String] = Map(
    "q69_corrupt_json" -> q69CorruptJsonSql,
    "q70_csv_quarantine" -> q70CsvQuarantineSql)
}
