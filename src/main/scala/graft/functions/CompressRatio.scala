package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte size of a string — the primitive behind the
  * compression-ratio quality signal (Gopher / Dolma family): natural prose
  * deflates to ~35-60% of its raw bytes, boilerplate and template spam to
  * far less, and random/encrypted junk to ~100%+. The RATIO is derived in
  * the query (`deflated_size(text) / octet_length(text)`) so one kernel
  * serves filters, score columns, and drift reports.
  *
  * Determinism: `Deflater(BEST_SPEED, nowrap=true)`, `finish()`, then a
  * drain loop with default `NO_FLUSH` until `finished()` is a pure
  * function of the input bytes on a given zlib build — and java.util.zip
  * ships IN the JVM, so executors and driver agree. (Cross-JVM-version byte-for-byte stability is NOT
  * assumed anywhere: tests recompute through the same util, and the oracle
  * skips this column — DuckDB has no deflate.)
  *
  * Codegen: a static-call `defineCodeGen`, same shape as [[CharEntropy]] —
  * the expression stays inside whole-stage codegen. The Deflater is
  * THREAD-LOCAL and `reset()` between rows: a single shared instance is
  * stateful and would corrupt across concurrently-evaluated rows, while a
  * per-ROW instance pays JNI init + native teardown on every record — the
  * wrong constant factor for a kernel whose whole point is a cheap
  * map-only scan. Native handles live for the executor thread's lifetime
  * (bounded by thread count, never by row count); the drain buffer is a
  * fixed thread-local 8 KB chunk, reused across the drain loop. */
object CompressUtil {
  private val deflaters = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater =
      new Deflater(Deflater.BEST_SPEED, true)
  }
  private val buffers = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** Deflated size in bytes of the UTF-8 encoding of `s` (raw deflate
    * stream, no zlib/gzip header — headers would add a constant that
    * distorts short-text ratios). */
  def deflatedSize(s: UTF8String): Long = {
    val d = deflaters.get()
    val buf = buffers.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

/** `deflated_size(text)` — see [[CompressUtil.deflatedSize]]. */
case class DeflatedSize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "deflated_size"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    CompressUtil.deflatedSize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CompressUtil.deflatedSize($c)")
  override protected def withNewChildInternal(newChild: Expression): DeflatedSize =
    copy(child = newChild)
}
