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
  * buffer reaches `batchSize` records (bounding both JVM memory and the
  * record count any single command invocation sees — the analog of
  * treeReduce's n^(1/depth) fan-in), on merged spill/shuffle buffers that
  * reach it, and once at `eval`. A group's result therefore sees the command
  * applied in a data-dependent tree — exactly the contract the reference
  * imposes (associativity + commutativity), checked in CommandReduceSpec by
  * sweeping batch sizes against [[Pipeline.treeReduce]] and native
  * aggregation on the same data.
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
  extends TypedImperativeAggregate[ArrayBuffer[String]]
  with UnaryLike[Expression] {

  require(batchSize >= 2, s"batchSize must be >= 2, got $batchSize")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"command_reduce needs a string record column, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "command_reduce"

  override def createAggregationBuffer(): ArrayBuffer[String] = ArrayBuffer.empty

  override def update(buf: ArrayBuffer[String], input: InternalRow): ArrayBuffer[String] = {
    val v = child.eval(input)
    if (v != null) {
      buf += v.asInstanceOf[UTF8String].toString
      if (buf.length >= batchSize) collapse(buf)
    }
    buf
  }

  override def merge(buf: ArrayBuffer[String], other: ArrayBuffer[String]): ArrayBuffer[String] = {
    // append element-wise with interleaved collapses so no command invocation
    // ever sees more than batchSize records (a bulk ++= of two near-full
    // buffers would hand one invocation close to 2x the documented bound)
    other.foreach { r =>
      buf += r
      if (buf.length >= batchSize) collapse(buf)
    }
    buf
  }

  override def eval(buf: ArrayBuffer[String]): Any = {
    val result = if (buf.isEmpty) Nil else runCommand(buf.toSeq)
    new GenericArrayData(result.map(r => UTF8String.fromString(r): Any).toArray)
  }

  /** Replace the buffer's records with the command's output records. */
  private def collapse(buf: ArrayBuffer[String]): Unit = {
    val reduced = runCommand(buf.toSeq)
    require(reduced.nonEmpty,
      s"command_reduce command produced no output records: $command")
    // a command that does not strictly shrink its input is not a reducer:
    // left unchecked, a full buffer would re-collapse on every subsequent
    // record — one subprocess per row, silently. Fail on the first batch.
    require(reduced.length < buf.length,
      s"command_reduce command did not reduce its input " +
        s"(${buf.length} records in, ${reduced.length} out) — not a reducer, " +
        s"or batchSize ($batchSize) too small for its output arity: $command")
    buf.clear()
    buf ++= reduced
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

  override def serialize(buf: ArrayBuffer[String]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.length)
    buf.foreach { s =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): ArrayBuffer[String] = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val n = in.readInt()
    val buf = new ArrayBuffer[String](n)
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf += new String(b, StandardCharsets.UTF_8)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CommandReduceAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CommandReduceAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CommandReduceAgg =
    copy(child = newChild)
}

object CommandReduce {

  /** Column-API entry: `df.groupBy($"k").agg(commandReduce($"rec", cmd))`.
    * `command` must be associative & commutative over text records (the
    * reference reduce contract); sees at most `batchSize` records per
    * invocation. */
  def commandReduce(records: Column, command: String, batchSize: Int = 1000,
      runner: CommandRunner = SubprocessRunner): Column =
    GraftBridge.column(
      CommandReduceAgg(GraftBridge.expression(records), command, batchSize, runner)
        .toAggregateExpression())
}
