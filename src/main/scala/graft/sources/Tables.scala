package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish tables (see /root/repo/TESTDATA.md).
  *
  * The reference engine (mcapuccini/MaRe) has no sources of its own — users build
  * RDDs with stock Spark (`/root/reference/src/test/scala/se/uu/it/mare/MaReTest.scala:38,71,104`).
  * Here the relational surface is first-class: columnar parquet scans so Catalyst
  * gets predicate pushdown + column pruning for free, which is what survives a
  * 100 TB scale-up (scan cost is dominated by bytes actually read).
  *
  * All loaders take the scale-factor directory so the same query code runs on any
  * sf (and, on a real cluster, on any warehouse path).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark cannot read natively
    * ([PARQUET_TYPE_ILLEGAL]). Read nanos as long and convert with integral
    * division (`div`, NOT double `/` — epoch-nanos ≈ 1.7e18 overflows double's
    * 53-bit mantissa) to a proper microsecond TimestampType column. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Register all tables as temp views so `spark.sql(...)` works too.
    * `events` goes through its normalizing loader (nanos → micros) — the raw
    * reader throws PARQUET_TYPE_ILLEGAL on its TIMESTAMP(NANOS) column. */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    val plain = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    plain.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
    events(spark, dir).createOrReplaceTempView("events")
  }
}
