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
}
