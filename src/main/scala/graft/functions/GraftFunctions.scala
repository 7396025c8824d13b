package graft.functions

import org.apache.spark.sql.SparkSession

/** Registers graft's custom Catalyst expressions in a session's function
  * registry so they are callable from SQL (`spark.sql("SELECT simhash64(...)")`)
  * as well as the Column API — the engine's SQL surface for its native
  * extensions. */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    registry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs(0), exprs(1)), "scala_udf")
    registry.createOrReplaceTempFunction(
      "intersect_size_sorted",
      exprs => IntersectSizeSorted(exprs(0), exprs(1)), "scala_udf")
    registry.createOrReplaceTempFunction(
      "quality_score", exprs => QualityScore(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction(
      "language_id", exprs => LanguageId(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction(
      "top_token_count", exprs => TopTokenCount(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction(
      "quantize_int8", exprs => QuantizeInt8(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction(
      "max_abs", exprs => MaxAbs(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction(
      "dot_int", exprs => DotInt(exprs(0), exprs(1)), "scala_udf")
    registry.createOrReplaceTempFunction(
      "command_reduce", { exprs =>
        def lit(e: org.apache.spark.sql.catalyst.expressions.Expression, what: String) =
          (if (e.foldable) e.eval() else null) match {
            case s: org.apache.spark.unsafe.types.UTF8String => s.toString
            case other => throw new IllegalArgumentException(
              s"command_reduce: $what must be a non-null string literal, got " +
                (if (e.foldable) s"$other" else s"non-literal $e"))
          }
        def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression, what: String) =
          (if (e.foldable) e.eval() else null) match {
            case i: Int => i
            case l: Long =>
              try Math.toIntExact(l)
              catch { case _: ArithmeticException =>
                throw new IllegalArgumentException(
                  s"command_reduce: $what $l overflows Int")
              }
            case other => throw new IllegalArgumentException(
              s"command_reduce: $what must be an integer literal, got " +
                (if (e.foldable) s"$other" else s"non-literal $e"))
          }
        exprs match {
          case Seq(rec, cmd) =>
            graft.operators.CommandReduceAgg(rec, lit(cmd, "command"))
          case Seq(rec, cmd, bs) =>
            graft.operators.CommandReduceAgg(rec, lit(cmd, "command"),
              batchSize = intLit(bs, "batchSize"))
          case other => throw new IllegalArgumentException(
            s"command_reduce expects 2 or 3 args, got ${other.length}")
        }
      }, "scala_udf")
    registry.createOrReplaceTempFunction(
      "text_scan_stats", exprs => TextScanStats(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction(
      "char_entropy", exprs => CharEntropy(exprs.head), "scala_udf")
    def intK(k: org.apache.spark.sql.catalyst.expressions.Expression,
        fn: String): Int = {
      // foldable gate first: eval() on a non-foldable arg (e.g. a column
      // reference) would surface as an opaque unresolved/NPE internal error
      // instead of this message
      if (!k.foldable) throw new IllegalArgumentException(
        s"$fn: k must be an integer literal, got non-foldable expression $k")
      k.eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"$fn: k must be an integer literal, got $other")
      }
    }
    registry.createOrReplaceTempFunction(
      "passjoin_seg_keys", {
        case Seq(text, k) => PassJoinSegKeys(text, intK(k, "passjoin_seg_keys"))
        case exprs => throw new IllegalArgumentException(
          s"passjoin_seg_keys expects (text, k), got ${exprs.length} args")
      }, "scala_udf")
    registry.createOrReplaceTempFunction(
      "passjoin_sub_keys", {
        case Seq(text, k) => PassJoinSubKeys(text, intK(k, "passjoin_sub_keys"))
        case exprs => throw new IllegalArgumentException(
          s"passjoin_sub_keys expects (text, k), got ${exprs.length} args")
      }, "scala_udf")
    registry.createOrReplaceTempFunction(
      "shingle_hash_set", {
        case Seq(text) => ShingleHashSet(text, 3)
        case Seq(text, k) =>
          val kv = k.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"shingle_hash_set: k must be an integer literal, got $other")
          }
          ShingleHashSet(text, kv)
        case exprs => throw new IllegalArgumentException(
          s"shingle_hash_set expects 1 or 2 args, got ${exprs.length}")
      }, "scala_udf")
  }
}
