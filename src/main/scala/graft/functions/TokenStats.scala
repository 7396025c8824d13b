package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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

/** All five text_stats counters in ONE code-point walk:
  * [n_tokens, n_bpe_tokens, n_alpha, n_digit, n_ws].
  *
  * Replaces ~8 interpreted regex passes per document (tokenCount's
  * normalize, bpeTokenCount's regexp_extract_all — which materializes every
  * token string just to count them — and a regexp_replace pair per ratio).
  * Semantics are pinned bitwise to the Column-tree formulas by a
  * differential spec:
  *  - n_tokens: maximal runs of non-\s code points (≡ tokenCount: split of
  *    the \s-collapsed, trimmed text; 0 when all-whitespace/empty);
  *  - n_bpe_tokens: the BPE pre-tokenizer alternation
  *    [A-Za-z]+|[0-9]+|[^A-Za-z0-9\s] — letter runs and digit runs count
  *    once, every other non-\s CODE POINT counts alone (RE2/Java agree:
  *    one code point per negated-class match, so astral chars are 1, not 2);
  *  - n_alpha / n_digit / n_ws: ASCII class member counts, the numerators of
  *    the length−length(regexp_replace) ratio idiom.
  * \s is Java's ASCII set [ \t\n\x0B\f\r] — identical to the oracle's
  * spelled-out class. */
object TextScanStatsUtil {
  def scan(text: UTF8String): ArrayData = {
    val s = text.toString
    var i = 0
    var nTok = 0; var nBpe = 0; var nAlpha = 0; var nDigit = 0; var nWs = 0
    var inTok = false
    var run = 0 // 1 = in alpha run, 2 = in digit run, 0 = neither
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r') {
        nWs += 1; inTok = false; run = 0
      } else {
        if (!inTok) { nTok += 1; inTok = true }
        if (cp >= 'A' && cp <= 'Z' || cp >= 'a' && cp <= 'z') {
          if (run != 1) { nBpe += 1; run = 1 }
          nAlpha += 1
        } else if (cp >= '0' && cp <= '9') {
          if (run != 2) { nBpe += 1; run = 2 }
          nDigit += 1
        } else { nBpe += 1; run = 0 }
      }
      i += Character.charCount(cp)
    }
    ArrayData.toArrayData(Array(nTok, nBpe, nAlpha, nDigit, nWs))
  }
}

case class TextScanStats(child: Expression) extends UnaryExpression {
  override def prettyName: String = "text_scan_stats"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    TextScanStatsUtil.scan(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextScanStatsUtil.scan($c)")
  override protected def withNewChildInternal(newChild: Expression): TextScanStats =
    copy(child = newChild)
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

/** Character-level Shannon entropy of a document in bits per character —
  * H = -Σ (c_i/n) · log₂(c_i/n) over CODE POINT counts (one entry per
  * distinct code point; ASCII text degenerates to per-character, matching
  * DuckDB's `entropy()` over `string_split(text, '')`).
  *
  * Exists for the same reason as [[TokenStatsUtil]]: entropy is a
  * PER-DOCUMENT statistic, and the relational formulation — explode to
  * (doc_id, char) rows, count, re-aggregate — costs a corpus-wide shuffle of
  * every character for what is a per-row reduction over a doc-bounded count
  * table. As a codegen'd kernel the whole query is a map-only projection;
  * per-row state is one int-count hashmap bounded by the doc's own alphabet.
  *
  * Determinism: the count-table iteration order is a function of the map's
  * contents only (same input string → same layout → same fold order), so the
  * double accumulation is reproducible across runs and partitionings. The
  * cross-engine difference vs DuckDB's accumulation order is ≤ a few ulp
  * (terms are ~alphabet-sized sums of magnitude ≤ log₂ n), vastly inside the
  * 1e-6 rounding grid the query applies. */
object CharEntropyUtil {
  def entropy(text: UTF8String): Double = {
    val s = text.toString
    if (s.isEmpty) return 0.0
    val counts = new java.util.HashMap[Integer, Int](64)
    var n = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    var h = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      val p = c / n
      h -= p * (Math.log(p) / Math.log(2.0))
    }
    h
  }
}

case class CharEntropy(child: Expression) extends UnaryExpression {
  override def prettyName: String = "char_entropy"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    CharEntropyUtil.entropy(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharEntropyUtil.entropy($c)")
  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}
