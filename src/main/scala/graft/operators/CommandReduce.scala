package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Containerized reduce as a native Catalyst aggregate function, so the
  * reference's command-combiner contract (`MaRe.reduce`, MaRe.scala:115-153:
  * an associative & commutative command collapsing a set of text records to
  * fewer records) composes with relational `groupBy` — one piped reduction
  * PER GROUP, instead of [[Pipeline.treeReduce]]'s one per dataset.
  *
  * Execution shape: this is a `TypedImperativeAggregate`, the same engine
  * path as `collect_list`/`percentile` (ObjectHashAggregateExec) — partial
  * buffers on the map side, serialized shuffle of partially-reduced buffers,
  * final merge+command on the reduce side. The command runs whenever a
  * buffer reaches its collapse threshold (initially `batchSize`, bounding
  * both JVM memory and the record count any single command invocation sees —
  * the analog of treeReduce's n^(1/depth) fan-in), on merged spill/shuffle
  * buffers that reach it, and once at `eval`. A group's result therefore
  * sees the command applied in a data-dependent tree — exactly the contract
  * the reference imposes (associativity + commutativity), checked in
  * CommandReduceSpec by sweeping batch sizes against [[Pipeline.treeReduce]]
  * and native aggregation on the same data.
  *
  * Commands that cannot shrink a batch (a dedup-style `sort -u` over
  * all-distinct records is a legitimate associative reducer with nothing to
  * remove) grow the threshold geometrically instead of failing or thrashing:
  * memory degrades gracefully toward collect_list-like buffering while the
  * subprocess count stays amortized-logarithmic in the group size — never
  * one invocation per record.
  *
  * Result type: `array<string>` — the records remaining after the final
  * command run (a proper reducer command usually leaves exactly one). */
case class CommandReduceAgg(
    child: Expression,
    command: String,
    batchSize: Int = 1000,
    runner: CommandRunner = SubprocessRunner,
    inMount: TextFile = TextFile("/in.txt"),
    outMount: TextFile = TextFile("/out.txt"),
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CommandReduceAgg.Buffer]
  with UnaryLike[Expression] {
  import CommandReduceAgg.Buffer

  require(batchSize >= 2, s"batchSize must be >= 2, got $batchSize")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"command_reduce needs a string record column, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "command_reduce"

  override def createAggregationBuffer(): Buffer =
    new Buffer(batchSize, ArrayBuffer.empty)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) {
      buf.records += v.asInstanceOf[UTF8String].toString
      if (buf.records.length >= buf.threshold) collapse(buf)
    }
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    // the larger threshold wins: if either side already proved the command
    // can't shrink below some size, re-thrashing at the smaller bound is
    // pointless. Append element-wise with interleaved collapses so no
    // command invocation ever sees more than the threshold (a bulk ++= of
    // two near-full buffers would hand one invocation close to 2x it).
    buf.threshold = math.max(buf.threshold, other.threshold)
    other.records.foreach { r =>
      buf.records += r
      if (buf.records.length >= buf.threshold) collapse(buf)
    }
    buf
  }

  override def eval(buf: Buffer): Any = {
    val result = if (buf.records.isEmpty) Nil else runCommand(buf.records.toSeq)
    new GenericArrayData(result.map(r => UTF8String.fromString(r): Any).toArray)
  }

  /** Replace the buffer's records with the command's output records. If the
    * command could not shrink below the threshold, double it (geometric
    * growth: the next collapse happens only after the buffer doubles, so a
    * non-shrinking command costs amortized-log subprocess launches, never
    * one per record). */
  private def collapse(buf: Buffer): Unit = {
    val reduced = runCommand(buf.records.toSeq)
    require(reduced.nonEmpty,
      s"command_reduce command produced no output records: $command")
    buf.records.clear()
    buf.records ++= reduced
    if (buf.records.length * 2 > buf.threshold)
      buf.threshold = math.max(buf.threshold * 2, buf.records.length * 2)
    ()
  }

  /** One command invocation over `records`, eagerly cleaned up (unlike the
    * task-scoped cleanup of Pipeline.runPartition — a group-heavy task may
    * run thousands of collapses, so temp files cannot wait for task end). */
  private def runCommand(records: Seq[String]): Seq[String] = {
    val inPath = Pipeline.freshTempPath("agg_in")
    val outPath = Pipeline.freshTempPath("agg_out")
    try {
      inMount.writePartition(records.iterator, inPath)
      outMount.createEmpty(outPath)
      runner.run(command, Seq(inPath -> inMount.containerPath, outPath -> outMount.containerPath))
      val it = outMount.readPartition(outPath)
      try it.toVector
      finally it match {
        case c: java.io.Closeable => c.close()
        case _ => ()
      }
    } finally {
      Pipeline.deleteRecursive(inPath)
      Pipeline.deleteRecursive(outPath)
    }
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.threshold)
    out.writeInt(buf.records.length)
    buf.records.foreach { s =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val threshold = in.readInt()
    val n = in.readInt()
    val records = new ArrayBuffer[String](n)
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      records += new String(b, StandardCharsets.UTF_8)
      i += 1
    }
    new Buffer(threshold, records)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CommandReduceAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CommandReduceAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CommandReduceAgg =
    copy(child = newChild)
}

object CommandReduceAgg {
  /** Mutable aggregation state: pending records plus the current collapse
    * threshold (starts at batchSize; doubles whenever the command cannot
    * shrink the batch to under half of it). */
  final class Buffer(var threshold: Int, val records: ArrayBuffer[String])
}

object CommandReduce {

  /** Column-API entry: `df.groupBy($"k").agg(commandReduce($"rec", cmd))`.
    * `command` must be associative & commutative over text records (the
    * reference reduce contract); sees at most `batchSize` records per
    * invocation unless it cannot shrink batches, in which case the bound
    * grows geometrically (see [[CommandReduceAgg]]). */
  def commandReduce(records: Column, command: String, batchSize: Int = 1000,
      runner: CommandRunner = SubprocessRunner): Column =
    GraftBridge.column(
      CommandReduceAgg(GraftBridge.expression(records), command, batchSize, runner)
        .toAggregateExpression())
}
