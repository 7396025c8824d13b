package graft.operators

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Driver-side (no TaskContext) behavior of the per-partition pipe body —
  * in-package so it can reach the private[operators] internals. */
class RunPartitionSpec extends AnyFunSuite {

  private def graftOutDirs(): Set[String] = {
    val tmp = Paths.get(sys.env.getOrElse("TMPDIR", "/tmp"))
    val s = Files.list(tmp)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("graft_out_")).toSet
    finally s.close()
  }

  test("runPartition without a TaskContext cleans its output dir on exhaustion") {
    assert(org.apache.spark.TaskContext.get() == null)
    val before = graftOutDirs()
    val it = Pipeline.runPartition(
      Iterator("3", "1", "2"),
      TextFile("/in.txt"), TextFile("/out.txt"),
      "sort -n in.txt > out.txt", SubprocessRunner)
    // while the iterator is live its backing file must exist
    assert((graftOutDirs() -- before).nonEmpty, "output tmp dir should exist mid-read")
    assert(it.toList == List("1", "2", "3"))
    assert(graftOutDirs() == before,
      "output tmp dir should be deleted once the iterator is exhausted")
  }

  test("partially-consumed driver-side iterator releases via close()") {
    val before = graftOutDirs()
    val it = Pipeline.runPartition(
      Iterator("3", "1", "2"),
      TextFile("/in.txt"), TextFile("/out.txt"),
      "sort -n in.txt > out.txt", SubprocessRunner)
    assert(it.next() == "1") // abandon after one element
    it.asInstanceOf[java.io.Closeable].close()
    assert(graftOutDirs() == before, "close() should delete the output tmp dir")
    assert(!it.hasNext, "closed iterator reports exhaustion")
  }
}
