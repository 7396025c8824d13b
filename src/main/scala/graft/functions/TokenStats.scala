package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Occurrence count of the most frequent word token in a document, as one
  * codegen'd pass (normalize → split → hash-count → max).
  *
  * Exists because "top token fraction" is a PER-DOCUMENT statistic: computing
  * it via explode → (doc_id, token) agg → doc agg costs two corpus-wide
  * shuffles for what is a per-row reduction over a doc-bounded token list.
  * With this kernel, [[graft.queries.TextAnalysis.textRepetition]] is a
  * map-only projection — the correct 100 TB shape (per-row state is one
  * hashmap bounded by the document's own vocabulary). Tokenization matches
  * [[TextFunctions.wordTokens]] (lower ROOT → split \s+ runs → drop edge
  * empties), so `topTokenCount(text) / tokenCount(text)` is the same
  * integer ratio the agg formulation produces. */
object TokenStatsUtil {
  // compiled once — String.split("\\s+") re-compiles the pattern per row
  private val WsRun = java.util.regex.Pattern.compile("\\s+")

  def topTokenCount(text: UTF8String): Long = {
    // no String.trim: it strips non-\s control chars at the edges and would
    // diverge from the regex normalization (the LangIdUtil note). split on
    // \s+ leaves at most one leading "" (for ws-prefixed text) — skip
    // empties instead.
    val toks = WsRun.split(text.toString.toLowerCase(java.util.Locale.ROOT))
    val counts = new java.util.HashMap[String, Int](Math.min(toks.length * 2, 1 << 16))
    var best = 0
    var i = 0
    while (i < toks.length) {
      if (!toks(i).isEmpty) {
        val c = counts.merge(toks(i), 1, (a, b) => a + b)
        if (c > best) best = c
      }
      i += 1
    }
    best.toLong
  }
}

case class TopTokenCount(child: Expression) extends UnaryExpression {
  override def prettyName: String = "top_token_count"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    TokenStatsUtil.topTokenCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenStatsUtil.topTokenCount($c)")
  override protected def withNewChildInternal(newChild: Expression): TopTokenCount =
    copy(child = newChild)
}
