package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom filter as a native Catalyst aggregate over PRE-HASHED keys —
  * the building block of [[graft.sources.BloomIndex]]'s per-file
  * membership index. Callers feed `xxhash64(key)` (codegen'd, type-aware)
  * so this aggregate is monomorphic over LongType and the probe side can
  * hash a literal the same way.
  *
  * Execution shape: `TypedImperativeAggregate` (ObjectHashAggregateExec) —
  * per-partition partial filters, serialized shuffle of partials, bitwise
  * OR merge on the reduce side (`mergeInPlace`; all buffers share
  * `expectedItems`/`fpp`, so sizes always agree). The buffer is
  * `org.apache.spark.util.sketch.BloomFilter` — Spark's PUBLIC sketch API,
  * the same implementation its runtime row-group filtering builds on.
  *
  * Sizing is declared, not discovered: bits are fixed at creation from
  * `expectedItems`/`fpp`. Oversizing wastes `-n ln(p)/ln(2)^2` bits
  * (~1.2 KB per 1000 items at 1%); undersizing degrades the false-positive
  * rate gracefully — never correctness, since a bloom only ever answers
  * "definitely absent" vs "maybe present". */
case class BloomAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter]
  with UnaryLike[Expression] {

  require(expectedItems > 0, s"expectedItems must be positive: $expectedItems")
  require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_agg takes a pre-hashed LONG key (use xxhash64), got " +
        child.dataType.simpleString)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.putLong(v.asInstanceOf[Long]): Unit
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter = {
    buf.mergeInPlace(other): Unit
    buf
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BloomAgg =
    copy(child = c)
}

/** `might_contain(bloomBytes, hashedKey)` — probe a serialized
  * [[BloomAgg]] filter. Deliberately CodegenFallback: every row of a
  * stats table carries a DIFFERENT filter, so per-row deserialization is
  * inherent to the data shape, and the expression is only ever evaluated
  * at stats-table scale (one row per data file — the |files|-sized
  * metadata relation, never the row-scale data path). Three-valued like
  * SQL: null bloom or null key → null. */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"might_contain takes (binary bloom, long hashed key), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(bloom: Any, key: Any): Any =
    BloomFilter
      .readFrom(new ByteArrayInputStream(bloom.asInstanceOf[Array[Byte]]))
      .mightContainLong(key.asInstanceOf[Long])

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): BloomMightContain = copy(left = l, right = r)
}

/** `bloom_contains_flags(bloomBytes, hashedKeys)` — probe a serialized
  * [[BloomAgg]] filter with a whole BATCH of pre-hashed keys at once,
  * returning one boolean per key. The point is the deserialization
  * economics: a K-key batch probed with K [[BloomMightContain]] calls
  * deserializes the row's filter K times; this does it ONCE per stats row
  * and answers all K membership tests against the live object. Like its
  * single-key sibling it is deliberately CodegenFallback and only ever
  * evaluated at stats-table scale (one row per data file). Null bloom or
  * null key array → null; the key array must be null-free (callers build
  * it from xxhash64 over literals, which never yields null elements). */
case class BloomContainsFlags(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = right.dataType match {
    case org.apache.spark.sql.types.ArrayType(LongType, _)
        if left.dataType == BinaryType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"bloom_contains_flags takes (binary bloom, array<long> hashed keys), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(BooleanType, containsNull = false)
  override def prettyName: String = "bloom_contains_flags"

  override protected def nullSafeEval(bloom: Any, keys: Any): Any = {
    val filter = BloomFilter
      .readFrom(new ByteArrayInputStream(bloom.asInstanceOf[Array[Byte]]))
    val hs = keys.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray()
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(hs.map(filter.mightContainLong))
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): BloomContainsFlags = copy(left = l, right = r)
}

/** `bloom_might_contain_any(bloomBytes, hashedKeys)` — does the filter
  * possibly contain ANY of the batch? The short-circuiting disjunction of
  * [[BloomContainsFlags]], for callers that only need the file-survives
  * decision (join-driven file pruning probes each file's bloom with the
  * whole dim-side key set and keeps the file on the first hit). One
  * deserialization per stats row, early exit on the first maybe. */
case class BloomMightContainAny(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = right.dataType match {
    case org.apache.spark.sql.types.ArrayType(LongType, _)
        if left.dataType == BinaryType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain_any takes (binary bloom, array<long> hashed " +
        s"keys), got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_any"

  override protected def nullSafeEval(bloom: Any, keys: Any): Any = {
    val filter = BloomFilter
      .readFrom(new ByteArrayInputStream(bloom.asInstanceOf[Array[Byte]]))
    val hs = keys.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray()
    var i = 0
    while (i < hs.length) {
      if (filter.mightContainLong(hs(i))) return true
      i += 1
    }
    false
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): BloomMightContainAny = copy(left = l, right = r)
}

object BloomSketch {
  /** Column face: bloom of pre-hashed long keys. */
  def bloomAgg(hashedKey: Column, expectedItems: Long,
      fpp: Double = 0.01): Column =
    GraftBridge.column(
      BloomAgg(GraftBridge.expression(hashedKey), expectedItems, fpp)
        .toAggregateExpression())

  /** Column face: membership probe against a serialized bloom. */
  def mightContain(bloom: Column, hashedKey: Column): Column =
    GraftBridge.column(BloomMightContain(
      GraftBridge.expression(bloom), GraftBridge.expression(hashedKey)))

  /** Column face: per-key membership flags for a batch of hashed keys. */
  def containsFlags(bloom: Column, hashedKeys: Column): Column =
    GraftBridge.column(BloomContainsFlags(
      GraftBridge.expression(bloom), GraftBridge.expression(hashedKeys)))

  /** Column face: any-match probe for a batch of hashed keys. */
  def mightContainAny(bloom: Column, hashedKeys: Column): Column =
    GraftBridge.column(BloomMightContainAny(
      GraftBridge.expression(bloom), GraftBridge.expression(hashedKeys)))
}
