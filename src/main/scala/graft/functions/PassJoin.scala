package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PassJoin segment-filter keys for edit-distance-≤ k candidate generation
  * (Li, Deng, Wang, Feng: "PASS-JOIN: A Partition-based Method for
  * Similarity Joins", VLDB 2012 — the published escape hatch named in
  * [[graft.queries.Dedup.dedupFuzzy]]'s scale note).
  *
  * Principle: partition the SHORTER string `a` (length la) of a candidate
  * pair into k+1 contiguous segments. Any edit script of ≤ k operations
  * leaves ≥ 1 segment untouched (pigeonhole over k+1 segments), so that
  * segment appears in the longer string `b` EXACTLY, as a contiguous
  * substring. Its start position in `b` is p_i + x where x is the net
  * insert−delete shift of the edits strictly before the segment; with
  * Δ = lb − la, the budget split |x| + |Δ − x| ≤ k bounds
  * x ∈ [⌈(Δ−k)/2⌉, ⌊(Δ+k)/2⌋] — a (k+1)-wide probe window per segment.
  *
  * The join key is a 64-bit FNV-1a hash of the segment content mixed with
  * (la, segment index): the index side emits one key per segment of its own
  * text; the probe side emits one key per (candidate shorter length
  * la ∈ [lb−k, lb], segment i, admissible start q). Hashing can only ADD
  * candidates (collisions), never lose a true pair — precision is restored
  * by the exact thresholded-levenshtein verify downstream.
  *
  * Segment geometry (both sides MUST agree; shared in [[PassJoinUtil.segLen]]
  * / [[PassJoinUtil.segStart]]): with m = k+1, s = ⌊la/m⌋, r = la mod m, the
  * first m−r segments have length s and the last r have length s+1. Strings
  * with la < m have empty segments and are excluded (callers pair them via a
  * bounded tiny-block join instead).
  *
  * All offsets are in CODE POINTS via `UTF8String.numChars/substring`, the
  * same unit as Catalyst `length()` and `levenshtein()` — char-based (UTF-16)
  * offsets would desynchronize the two sides on astral-plane text. */
object PassJoinUtil {

  @inline private def segLen(la: Int, m: Int, i: Int): Int =
    la / m + (if (i >= m - la % m) 1 else 0)

  @inline private def segStart(la: Int, m: Int, i: Int): Int = {
    val s = la / m; val r = la % m
    i * s + math.max(0, i - (m - r))
  }

  /** Hash of one segment occurrence: content hash mixed with the shorter
    * length and the segment ordinal, so segments only join within their own
    * (la, i) slot. */
  @inline private def key(seg: UTF8String, la: Int, i: Int): Long =
    SimHash64Util.fnv1a64(seg.getBytes) ^
      (la.toLong * 0x9E3779B97F4A7C15L) ^ (i.toLong * 0xC2B2AE3D27D4EB4FL)

  /** Index-side keys: the k+1 segments of `t` itself (one key each).
    * Empty for strings shorter than k+1 code points. */
  def segKeys(t: UTF8String, k: Int): ArrayData = {
    val la = t.numChars()
    val m = k + 1
    if (la < m) return ArrayData.toArrayData(Array.emptyLongArray)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      val p = segStart(la, m, i)
      out(i) = key(t.substring(p, p + segLen(la, m, i)), la, i)
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Probe-side keys: for every admissible shorter length la ∈
    * [max(k+1, lb−k), lb] and segment i, the substrings of `t` of the
    * segment's length starting within the shift window
    * [p_i + ⌈(Δ−k)/2⌉, p_i + ⌊(Δ+k)/2⌋] clamped to [0, lb − len].
    * Sorted-distinct (same trick as shingleHashSet) to shrink the join
    * input — duplicate keys arise when windows overlap on repetitive text. */
  def subKeys(t: UTF8String, k: Int): ArrayData = {
    val lb = t.numChars()
    val m = k + 1
    if (lb < m) return ArrayData.toArrayData(Array.emptyLongArray)
    val laLo = math.max(m, lb - k)
    // ≤ (k+1) lengths × (k+1) segments × (k+1) positions
    val buf = new Array[Long]((lb - laLo + 1) * m * (k + 1))
    var n = 0
    var la = laLo
    while (la <= lb) {
      val delta = lb - la
      // ⌈(Δ−k)/2⌉ = −⌊(k−Δ)/2⌋ and ⌊(Δ+k)/2⌋, exact in ints (Δ ≤ k)
      val xLo = -((k - delta) / 2)
      val xHi = (delta + k) / 2
      var i = 0
      while (i < m) {
        val len = segLen(la, m, i)
        val p = segStart(la, m, i)
        var q = math.max(0, p + xLo)
        val qMax = math.min(lb - len, p + xHi)
        while (q <= qMax) {
          buf(n) = key(t.substring(q, q + len), la, i)
          n += 1
          q += 1
        }
        i += 1
      }
      la += 1
    }
    java.util.Arrays.sort(buf, 0, n)
    var w = 0
    var j = 0
    while (j < n) {
      if (w == 0 || buf(j) != buf(w - 1)) { buf(w) = buf(j); w += 1 }
      j += 1
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(buf, w))
  }
}

/** Index-side PassJoin keys of a string column (see [[PassJoinUtil]]). */
case class PassJoinSegKeys(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"edit-distance threshold must be >= 1, got $k")
  override def prettyName: String = "passjoin_seg_keys"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    PassJoinUtil.segKeys(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PassJoinUtil.segKeys($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): PassJoinSegKeys =
    copy(child = newChild)
}

/** Probe-side PassJoin keys of a string column (see [[PassJoinUtil]]). */
case class PassJoinSubKeys(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"edit-distance threshold must be >= 1, got $k")
  override def prettyName: String = "passjoin_sub_keys"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    PassJoinUtil.subKeys(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PassJoinUtil.subKeys($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): PassJoinSubKeys =
    copy(child = newChild)
}

object PassJoinFunctions {
  /** Codegen'd index-side PassJoin segment keys. */
  def segKeys(text: Column, k: Int): Column =
    GraftBridge.column(PassJoinSegKeys(GraftBridge.expression(text), k))

  /** Codegen'd probe-side PassJoin substring keys. */
  def subKeys(text: Column, k: Int): Column =
    GraftBridge.column(PassJoinSubKeys(GraftBridge.expression(text), k))
}
