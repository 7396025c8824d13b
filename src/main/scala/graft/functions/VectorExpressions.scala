package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd vector kernels. Spark's higher-order functions (`zip_with` +
  * `aggregate`) are evaluated interpreted — they fall out of whole-stage
  * codegen, which makes per-pair similarity math the bottleneck of LSH
  * verification (measured 5-20× slower at sf0.1). These expressions keep the
  * hot loop in generated Java via a static helper call, the same pattern as
  * [[SimHash64]]. */
object VectorOps {
  /** Dot product over two double arrays (no null elements expected). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val xs = a.toDoubleArray()
    val ys = b.toDoubleArray()
    val n = math.min(xs.length, ys.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += xs(i) * ys(i); i += 1 }
    s
  }

  /** Normalize → word-tokenize → k-shingle → 64-bit-hash → distinct → sort,
    * in one compiled pass. Equivalent to
    * `sort_array(array_distinct(transform(wordShingles(text,k), xxhash64-ish)))`
    * but ~1000× cheaper: the HOF formulation is interpreted per evaluation
    * AND gets re-evaluated by pushed-down constraint filters and join
    * branches (measured: the HOF chain dominated dedup at sf0.1). */
  def shingleHashSet(text: UTF8String, k: Int): ArrayData = {
    // Locale.ROOT: default-locale lowercasing diverges from Catalyst lower()
    // under e.g. tr_TR (dotless i) and would break oracle parity
    val toks = text.toString.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+")
    if (toks.length < k || (toks.length == 1 && toks(0).isEmpty))
      return ArrayData.toArrayData(Array.emptyLongArray)
    val n = toks.length - k + 1
    val hs = new Array[Long](n)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      hs(i) = SimHash64Util.fnv1a64(sb.toString.getBytes("UTF-8"))
      i += 1
    }
    java.util.Arrays.sort(hs)
    // in-place dedup of the sorted array
    var w = 0
    i = 0
    while (i < n) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(hs, w))
  }

  /** Intersection size of two SORTED long arrays (single merge pass). */
  def intersectSizeSorted(a: ArrayData, b: ArrayData): Int = {
    val xs = a.toLongArray()
    val ys = b.toLongArray()
    var i = 0
    var j = 0
    var n = 0
    while (i < xs.length && j < ys.length) {
      if (xs(i) == ys(j)) { n += 1; i += 1; j += 1 }
      else if (xs(i) < ys(j)) i += 1
      else j += 1
    }
    n
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val xs = a.toDoubleArray()
    val ys = b.toDoubleArray()
    val n = math.min(xs.length, ys.length)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      dot += xs(i) * ys(i); na += xs(i) * xs(i); nb += ys(i) * ys(i); i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }
}

abstract class BinaryVectorExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<double>, array<double>), got $other")
    }
}

case class DotProduct(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def prettyName: String = "dot_product"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

case class CosineSim(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def prettyName: String = "cosine_sim"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

case class IntersectSizeSorted(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "intersect_size_sorted"
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<bigint>, array<bigint>), got $other")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.intersectSizeSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.intersectSizeSorted($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntersectSizeSorted =
    copy(left = l, right = r)
}

/** Sorted distinct 64-bit hashes of the k-word shingles of a text column. */
case class ShingleHashSet(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")
  override def prettyName: String = "shingle_hash_set"
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
    VectorOps.shingleHashSet(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.shingleHashSet($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
    copy(child = newChild)
}

object VectorFunctions {
  /** Codegen'd sorted-distinct shingle-hash set of a text column. */
  def shingleHashSet(text: Column, k: Int): Column =
    GraftBridge.column(ShingleHashSet(GraftBridge.expression(text), k))

  /** Codegen'd |A ∩ B| for two sorted array<bigint> columns. */
  def intersectSizeSorted(a: Column, b: Column): Column =
    GraftBridge.column(IntersectSizeSorted(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Codegen'd dot product of two array<double> columns. */
  def dotProduct(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Codegen'd cosine similarity of two array<double> columns.
    * Bitwise-identical to sequential-order double accumulation. */
  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSim(GraftBridge.expression(a), GraftBridge.expression(b)))
}
