package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Spark-native plugin registration: enable every graft extension at session
  * build time with
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * (or `.withExtensions(new GraftExtensions)`), instead of calling the
  * per-session `GraftFunctions.register` / `AsOf.register` imperatively.
  * This is the deployment path for clusters where the session is built by
  * the platform (Thrift server, Connect, notebooks): the custom as-of join
  * strategy and the SQL-callable codegen expressions are present in every
  * session without user code running first. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // rewrite size(collect_set() OVER running-frame) running-distinct
    // windows into the constant-state first-occurrence running sum — see
    // RewriteRunningDistinct's scaladoc for the state-size argument
    ext.injectOptimizerRule(_ => graft.plans.RewriteRunningDistinct)
    // opt-in (spark.graft.bitmapDistinct.enabled): count(DISTINCT integral)
    // → exact two-level bitmap aggregation, shuffle volume independent of
    // distinct cardinality — see RewriteDistinctToBitmap's scaladoc
    ext.injectOptimizerRule(_ => graft.plans.RewriteDistinctToBitmap)
    val fns: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
      ("simhash64", "simhash64(tokens) - 64-bit SimHash of a string array",
        exprs => SimHash64(exprs.head)),
      ("dot_product", "dot_product(a, b) - double dot product of two arrays",
        exprs => DotProduct(exprs(0), exprs(1))),
      ("cosine_sim", "cosine_sim(a, b) - cosine similarity of two arrays",
        exprs => CosineSim(exprs(0), exprs(1))),
      ("intersect_size_sorted",
        "intersect_size_sorted(a, b) - intersection size of two sorted arrays",
        exprs => IntersectSizeSorted(exprs(0), exprs(1))),
      ("quantize_int8", "quantize_int8(v) - int8 scalar quantization of a double array",
        exprs => QuantizeInt8(exprs.head)),
      ("max_abs", "max_abs(v) - max absolute value of a double array",
        exprs => MaxAbs(exprs.head)),
      ("dot_int", "dot_int(a, b) - exact long dot product of two int arrays",
        exprs => DotInt(exprs(0), exprs(1))),
      ("language_id", "language_id(text) - stopword-profile language guess",
        exprs => LanguageId(exprs.head)),
      ("quality_score", "quality_score(text) - heuristic [0,1] document quality",
        exprs => QualityScore(exprs.head)),
      ("top_token_count", "top_token_count(text) - count of the most frequent token",
        exprs => TopTokenCount(exprs.head)),
      ("text_scan_stats",
        "text_scan_stats(text) - [n_tokens, n_bpe_tokens, n_alpha, n_digit, n_ws] in one pass",
        exprs => TextScanStats(exprs.head)),
      ("char_entropy",
        "char_entropy(text) - Shannon entropy in bits over code-point counts",
        exprs => CharEntropy(exprs.head)),
      ("deflated_size",
        "deflated_size(text) - DEFLATE-compressed byte size of the UTF-8 text",
        exprs => DeflatedSize(exprs.head)),
      ("pq_adc_score",
        "pq_adc_score(codes, table, ks) - PQ asymmetric-distance sum of per-subspace table lookups",
        exprs => {
          if (exprs.length != 3) throw new IllegalArgumentException(
            s"pq_adc_score takes 3 arguments (codes, table, ks), got ${exprs.length}")
          PqAdcScore(exprs(0), exprs(1), {
            val e = exprs(2)
            // foldable-first: a column reference must fail with THIS message,
            // not an opaque eval-time error (the GraftFunctions.intK rule);
            // any integral foldable is accepted (users write 2 or 2L or
            // CAST(2 AS BIGINT) interchangeably), range-checked into Int
            (if (e.foldable) e.eval() else null) match {
              case i: Int => i
              case l: Long if l.isValidInt => l.toInt
              case s: Short => s.toInt
              case b: Byte => b.toInt
              case other => throw new IllegalArgumentException(
                "pq_adc_score ks must be an integer literal, got " +
                  (if (e.foldable) s"$other" else s"non-literal $e"))
            }
          })
        }))
    fns.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
  }
}
