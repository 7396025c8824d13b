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
  // compiled once — String.split("\\s+") re-compiles the pattern per row
  private val WsRun = java.util.regex.Pattern.compile("\\s+")

  def shingleHashSet(text: UTF8String, k: Int): ArrayData = {
    // Locale.ROOT: default-locale lowercasing diverges from Catalyst lower()
    // under e.g. tr_TR (dotless i) and would break oracle parity.
    // No String.trim: it strips non-\s control chars (u0000-u001F) at the
    // edges, diverging from the \s+ tokenization the oracle and the other
    // kernels (TokenStatsUtil, LangIdUtil) use. Pattern.split drops trailing
    // empties, so ws-prefixed text leaves at most one leading "" — skip it.
    val toks = WsRun.split(text.toString.toLowerCase(java.util.Locale.ROOT))
    val off = if (toks.length > 0 && toks(0).isEmpty) 1 else 0
    val m = toks.length - off
    if (m < k) return ArrayData.toArrayData(Array.emptyLongArray)
    val n = m - k + 1
    val hs = new Array[Long](n)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(off + i + j))
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

  /** Int8 scalar quantization of a double vector: scale = 127/max(|x|),
    * q_i = round(x_i * scale) half-AWAY-FROM-ZERO (DuckDB `round` semantics —
    * `Math.round`'s floor(x+0.5) would round -2.5 to -2 and diverge from the
    * oracle). An all-zero vector quantizes to all zeros. The int8 range is
    * guaranteed by construction (|x_i * scale| <= 127), so no clamp. */
  def quantizeInt8(a: ArrayData): ArrayData = {
    val xs = a.toDoubleArray()
    var m = 0.0
    var i = 0
    while (i < xs.length) { val v = math.abs(xs(i)); if (v > m) m = v; i += 1 }
    val q = new Array[Int](xs.length)
    if (m > 0.0) {
      val scale = 127.0 / m
      i = 0
      while (i < xs.length) {
        val v = xs(i) * scale
        q(i) = (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toInt
        i += 1
      }
    }
    ArrayData.toArrayData(q)
  }

  /** max |x_i| of a double vector — the int8 quantization scale denominator. */
  def maxAbs(a: ArrayData): Double = {
    val xs = a.toDoubleArray()
    var m = 0.0
    var i = 0
    while (i < xs.length) { val v = math.abs(xs(i)); if (v > m) m = v; i += 1 }
    m
  }

  /** Exact integer dot product of two int arrays (64-dim int8 products stay
    * far inside long range). */
  def dotInt(a: ArrayData, b: ArrayData): Long = {
    val xs = a.toIntArray()
    val ys = b.toIntArray()
    val n = math.min(xs.length, ys.length)
    var s = 0L
    var i = 0
    while (i < n) { s += xs(i).toLong * ys(i); i += 1 }
    s
  }

  /** Cosine of `v` against every codebook row, then the `nTop` best cell ids
    * ordered by (score DESC, cell id DESC) — the exact ordering of a
    * descending struct-sort over (score, cell), so this is a drop-in for the
    * literal-inlined `array_sort(array(struct(cos, cell)...))` formulation.
    * Per-row accumulation order matches [[cosine]] exactly, so scores (and
    * therefore the selected cells) are bitwise-identical to scoring each
    * centroid with the standalone kernel. Selection is O(nCells · nTop) —
    * both small (nTop = nprobe ≤ ~32 even when nCells is 4096). */
  def topCells(v: ArrayData, codebook: Array[Array[Double]], nTop: Int): ArrayData = {
    val xs = v.toDoubleArray()
    val n = codebook.length
    val scores = new Array[Double](n)
    var i = 0
    while (i < n) {
      val ys = codebook(i)
      val m = math.min(xs.length, ys.length)
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var j = 0
      while (j < m) {
        dot += xs(j) * ys(j); na += xs(j) * xs(j); nb += ys(j) * ys(j); j += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      scores(i) = if (denom == 0.0) 0.0 else dot / denom
      i += 1
    }
    val k = math.min(nTop, n)
    val out = new Array[Int](k)
    val taken = new Array[Boolean](n)
    var t = 0
    while (t < k) {
      var best = -1
      i = 0
      while (i < n) {
        // >= : among equal scores the larger cell id wins (struct-sort parity)
        if (!taken(i) && (best < 0 || scores(i) >= scores(best))) best = i
        i += 1
      }
      taken(best) = true
      out(t) = best
      t += 1
    }
    ArrayData.toArrayData(out)
  }

  /** PQ asymmetric-distance score: Σ_m table[m·ks + codes[m]] — one lookup
    * per subspace into the query's precomputed (M × ks)-entry dot-product
    * table. The whole point of PQ: candidate scoring costs M array reads,
    * no floating multiply touches the corpus vector. */
  def pqAdc(codes: ArrayData, table: ArrayData, ks: Int): Double = {
    val cs = codes.toIntArray()
    val ts = table.toDoubleArray()
    // shape check up front: a mis-sized table or out-of-range code would
    // otherwise surface as a bare ArrayIndexOutOfBoundsException from deep
    // inside generated code, with no hint which expression failed
    if (cs.length.toLong * ks > ts.length) throw new IllegalArgumentException(
      s"pq_adc_score: table has ${ts.length} entries, need M*ks = ${cs.length}*$ks")
    var s = 0.0
    var m = 0
    while (m < cs.length) {
      val c = cs(m)
      if (c < 0 || c >= ks) throw new IllegalArgumentException(
        s"pq_adc_score: code $c at subspace $m out of range [0, $ks)")
      s += ts(m * ks + cs(m))
      m += 1
    }
    s
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

/** Int8 scalar quantization of an array<double> column (see
  * [[VectorOps.quantizeInt8]]). */
case class QuantizeInt8(child: Expression) extends UnaryExpression {
  override def prettyName: String = "quantize_int8"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double>, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    VectorOps.quantizeInt8(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.quantizeInt8($c)")
  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

/** max |x_i| of an array<double> column. */
case class MaxAbs(child: Expression) extends UnaryExpression {
  override def prettyName: String = "max_abs"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double>, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    VectorOps.maxAbs(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.maxAbs($c)")
  override protected def withNewChildInternal(newChild: Expression): MaxAbs =
    copy(child = newChild)
}

/** Exact long-valued dot product of two array<int> columns. */
case class DotInt(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "dot_int"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<int>, array<int>), got $other")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotInt(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dotInt($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotInt =
    copy(left = l, right = r)
}

/** PQ asymmetric-distance score of an array<int> code column against an
  * array<double> lookup-table column (see [[VectorOps.pqAdc]]). `ks` is the
  * per-subspace codebook size — a structural constant of the encoder, carried
  * on the expression like [[ShingleHashSet]]'s `k`, never per-row data. */
case class PqAdcScore(left: Expression, right: Expression, ks: Int)
    extends BinaryExpression {
  require(ks >= 1, s"ks must be >= 1, got $ks")
  override def prettyName: String = "pq_adc_score"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<int>, array<double>), got $other")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.pqAdc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], ks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.pqAdc($a, $b, $ks)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcScore =
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

/** Top-`nTop` codebook cells for an array<double> vector, by cosine.
  *
  * The codebook rides along as plan METADATA, not as literal expressions: at
  * codegen time it is installed once via `ctx.addReferenceObj` and the
  * generated code is a single static call — so the generated method size is
  * CONSTANT in nCells. The previous formulation (one inlined
  * `cosine(v, array(lit...))` per centroid) generated O(nCells · dim) code
  * and would cross Janino's 64 KB method limit around nCells ≈ 100; this one
  * is the broadcast-codebook shape a real IVF (nCells 256–4096) needs. On a
  * cluster the codebook is serialized once per task binary, like any
  * reference object in the plan. */
case class CodebookTopCells(child: Expression, codebook: Array[Array[Double]], nTop: Int)
    extends UnaryExpression {
  require(nTop >= 1, s"nTop must be >= 1, got $nTop")
  require(codebook.nonEmpty, "codebook must be non-empty")
  override def prettyName: String = "codebook_top_cells"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double>, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    VectorOps.topCells(input.asInstanceOf[ArrayData], codebook, nTop)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebook", codebook, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.topCells($c, $cbRef, $nTop)")
  }
  override protected def withNewChildInternal(newChild: Expression): CodebookTopCells =
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

  /** Codegen'd int8 scalar quantization of an array<double> column. */
  def quantizeInt8(a: Column): Column =
    GraftBridge.column(QuantizeInt8(GraftBridge.expression(a)))

  /** Codegen'd max |x_i| of an array<double> column. */
  def maxAbs(a: Column): Column =
    GraftBridge.column(MaxAbs(GraftBridge.expression(a)))

  /** Codegen'd exact integer dot product of two array<int> columns. */
  def dotInt(a: Column, b: Column): Column =
    GraftBridge.column(DotInt(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Codegen'd PQ asymmetric-distance score: M table lookups per candidate,
    * the query's dot-product table riding as an array<double> COLUMN (data,
    * not codegen) — generated code is constant in M and ks. */
  def pqAdcScore(codes: Column, table: Column, ks: Int): Column =
    GraftBridge.column(PqAdcScore(
      GraftBridge.expression(codes), GraftBridge.expression(table), ks))

  /** Codegen'd top-`nTop` codebook cell ids (cosine, score DESC / cell DESC)
    * with the codebook attached as a plan reference object — generated code
    * size is constant in nCells (see [[CodebookTopCells]]). */
  def codebookTopCells(v: Column, codebook: Array[Array[Double]], nTop: Int): Column =
    GraftBridge.column(CodebookTopCells(GraftBridge.expression(v), codebook, nTop))
}
