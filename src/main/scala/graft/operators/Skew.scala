package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for joins whose key distribution is heavy-tailed.
  *
  * At 100 TB a single hot key (a viral user_id, an empty-string default, …)
  * turns one shuffle partition into the whole job's critical path. AQE's
  * skew-join split handles sort-merge joins it can observe; `saltedJoin` is
  * the explicit variant for when the skew is known up front or AQE is
  * unavailable (e.g. the hot side feeds a custom operator).
  */
object Skew {

  /** Equi-join `large ⋈ small` on `key`, salted `saltFactor` ways:
    * each large row gets a deterministic salt in [0, saltFactor); the small
    * side is replicated once per salt value. The hot key's rows then spread
    * across `saltFactor` shuffle partitions instead of one.
    *
    * The salt must be uniform but NOT depend on the row's content: hashing
    * the row would send exact-duplicate rows (the common shape of a hot key)
    * to the SAME salt, rebuilding the hotspot. Rows are salted by hashing a
    * per-row position id — content-blind (duplicates spread) AND
    * partition-blind (the raw id is pid·2³³+rowIdx, so taking it mod a
    * power-of-two saltFactor directly would restart every partition at salt
    * 0 and leave high salts unused when partitions are small; the hash
    * decorrelates that). Result equals the unsalted join (verified in
    * ScaleSpec). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1)
    // join types that preserve the (replicated) small side would emit one
    // row per salt for unmatched small-side keys — reject them
    val supported = Set("inner", "left", "leftouter", "leftsemi", "leftanti", "cross")
    require(supported.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin does not support '$joinType': right/full outer joins would " +
        "duplicate unmatched small-side rows once per salt")
    val saltedLarge = large.withColumn("__salt", positionalSalt(saltFactor))
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    saltedLarge.join(saltedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Content-blind, partition-blind uniform salt: hash of the per-row
    * position id. Exposed for the ScaleSpec distribution checks. */
  private[graft] def positionalSalt(saltFactor: Int): Column =
    pmod(hash(monotonically_increasing_id()), lit(saltFactor))

  /** Top-N heavy-hitter keys of a column with their frequencies — the
    * diagnostic used to decide whether salting / AQE skew handling is needed. */
  def keySkewProfile(df: DataFrame, key: Column, topN: Int = 10): DataFrame =
    df.groupBy(key).count()
      .orderBy(col("count").desc)
      .limit(topN)
}
