package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The heuristic quality score as ONE codegen'd pass over the text.
  *
  * The Column-composition form ([[TextFunctions.qualityScoreComposed]])
  * expands to ~10 full-text regex passes (4 charClassRatios × 2 regex ops
  * each, plus three separate normalize+tokenize trees), and a filter on the
  * aliased score gets pushed below the projection, re-evaluating the whole
  * tree a second time — measured 2.8 s for the prep_screen scan at sf0.1.
  * This kernel computes identical doubles in a single char walk + one
  * tokenization.
  *
  * Bitwise parity contract (pinned by FunctionsSpec's differential test and
  * the text_quality / prep_screen oracle rows): every intermediate is the
  * same int-count / double-division the Column tree produces, combined in
  * the same left-associative order —
  *   ((((0.25·L + 0.25·A) + 0.2·S) + 0.3·W) − D) − P, clamped to [0, 1].
  */
object QualityScoreUtil {
  // compiled once: String.replaceAll/split with a multi-char regex would
  // re-compile the pattern on EVERY row
  private val WsRun = java.util.regex.Pattern.compile("\\s+")

  private val enStop: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    TextFunctions.stopwords("en").foreach(s.add)
    s
  }

  private def isAsciiSpace(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  def score(text: UTF8String): Double = {
    val s = text.toString
    // one walk: total chars (codepoints, = Catalyst length()) + class counts.
    // Classes are the Java-regex ASCII classes the Column tree uses:
    // [A-Za-z], [0-9], \s = [ \t\n\x0B\f\r]; punct = [^A-Za-z0-9\s].
    var nChars = 0; var nAlpha = 0; var nDigit = 0; var nPunct = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      nChars += 1
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) nAlpha += 1
      else if (cp >= '0' && cp <= '9') nDigit += 1
      else if (!isAsciiSpace(cp)) nPunct += 1
      i += Character.charCount(cp)
    }
    // normalizeText: lower (Locale.ROOT = Catalyst lower()) → collapse \s+
    // runs to ' ' → trim SPACES ONLY (Catalyst trim(); String.trim would
    // also strip non-\s control chars and diverge — see LangIdUtil note)
    val collapsed =
      WsRun.matcher(s.toLowerCase(java.util.Locale.ROOT)).replaceAll(" ")
    var lo = 0; var hi = collapsed.length
    while (lo < hi && collapsed.charAt(lo) == ' ') lo += 1
    while (hi > lo && collapsed.charAt(hi - 1) == ' ') hi -= 1
    val norm = collapsed.substring(lo, hi)
    val normLen = norm.codePointCount(0, norm.length)
    var nToks = 0; var stopHits = 0
    if (norm.nonEmpty) {
      val toks = norm.split(" ")
      nToks = toks.length
      var j = 0
      while (j < toks.length) {
        if (enStop.contains(toks(j))) stopHits += 1
        j += 1
      }
    }
    val lengthTerm =
      if (nChars >= 100 && nChars <= 10000) 1.0
      else if (nChars >= 20) 0.5 else 0.0
    val denom = Math.max(nChars, 1).toDouble
    val alphaTerm = nAlpha.toDouble / denom
    val digitPenalty = (nDigit.toDouble / denom) * 2
    val punctPenalty = (nPunct.toDouble / denom) * 2
    val tokDenom = Math.max(nToks, 1).toDouble
    val stopTerm = Math.min((stopHits.toDouble / tokDenom) * 4, 1.0)
    val meanWordLen = (normLen.toDouble + 1) / tokDenom
    val wordLenTerm = if (meanWordLen >= 3 && meanWordLen <= 12) 1.0 else 0.0
    val sum = 0.25 * lengthTerm + 0.25 * alphaTerm + 0.2 * stopTerm +
      0.3 * wordLenTerm - digitPenalty - punctPenalty
    Math.max(Math.min(sum, 1.0), 0.0)
  }
}

case class QualityScore(child: Expression) extends UnaryExpression {
  override def prettyName: String = "quality_score"
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
    QualityScoreUtil.score(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QualityScoreUtil.score($c)")
  override protected def withNewChildInternal(newChild: Expression): QualityScore =
    copy(child = newChild)
}
