package graft

import java.io.File
import java.nio.file.Files
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Store

/** ACTIVE crash injection for the Store admission protocol (VERDICT r8
  * task 7): StoreSpec pins that a staged-but-uncommitted batch is
  * invisible; here a child JVM is SIGKILLED mid-stage, between stage and
  * rename, and racing the rename — and after every kill the store must be
  * byte-identical to its pre-admission state or hold the complete batch,
  * never anything in between. */
class StoreCrashSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val childMain = "graft.StoreCrashChild"

  /** Visible store content: relative path → (size, md5) for every file
    * not under a hidden (`.`/`_`-prefixed) entry — what a reader sees. */
  private def snapshot(dir: String): Map[String, (Long, String)] = {
    def walk(f: File, rel: String): Seq[(String, File)] = {
      val fs = f.listFiles()
      if (fs == null) Seq.empty
      else fs.toSeq
        .filterNot(c => c.getName.startsWith(".") || c.getName.startsWith("_"))
        .flatMap { c =>
          val r = if (rel.isEmpty) c.getName else rel + "/" + c.getName
          if (c.isDirectory) walk(c, r) else Seq(r -> c)
        }
    }
    walk(new File(dir), "").map { case (rel, f) =>
      val md = MessageDigest.getInstance("MD5")
        .digest(Files.readAllBytes(f.toPath))
      rel -> (f.length(), md.map("%02x".format(_)).mkString)
    }.toMap
  }

  private def baseStore(): String = {
    val dir = Files.createTempDirectory("graft_crash_store_").toString + "/store"
    Store.append(spark.range(0, 100).select($"id"), dir)
    dir
  }

  private def ids(dir: String): Set[Long] =
    Store.read(spark, dir).select($"id").as[Long].collect().toSet

  private val base = (0L until 100L).toSet
  private val batch = (1000L until 2000L).toSet

  test("SIGKILL mid-stage write: store byte-identical; compact sweeps the stale orphan") {
    val dir = baseStore()
    val before = snapshot(dir)
    val staging = Store.stagingDir(dir)
    val p = ForkedJvm.start(childMain, Seq(dir, "big-stage"))
    try {
      // kill the moment the staging-sibling entry appears — the write is
      // in flight (the child's STAGED line would only come seconds later)
      assert(ForkedJvm.awaitCond {
        val fs = staging.listFiles()
        fs != null && fs.nonEmpty
      }, "staging entry never appeared")
    } finally ForkedJvm.kill(p)
    assert(snapshot(dir) == before, "visible store changed under a mid-stage kill")
    assert(ids(dir) == base)
    val orphans = staging.listFiles()
    assert(orphans != null && orphans.length == 1,
      "expected exactly the killed stage as orphan")
    // a FRESH orphan is indistinguishable from a live foreign write, so
    // compact leaves it; once quiet past the lease interval it is swept
    Store.compact(spark, dir)
    assert(staging.listFiles().length == 1,
      "compact must not sweep a recently-active staging entry")
    def backdate(f: File): Unit = {
      f.setLastModified(System.currentTimeMillis() - 11L * 60 * 1000): Unit
      val kids = f.listFiles(); if (kids != null) kids.foreach(backdate)
    }
    backdate(staging)
    Store.compact(spark, dir)
    assert(staging.listFiles() == null || staging.listFiles().isEmpty,
      "compact must sweep staging entries quiet past the stale window")
    assert(ids(dir) == base)
  }

  test("SIGKILL between stage and rename: store byte-identical") {
    val dir = baseStore()
    val before = snapshot(dir)
    val p = ForkedJvm.start(childMain, Seq(dir, "stage-hang"))
    try assert(ForkedJvm.awaitLine(p, "STAGED").isDefined, "child never staged")
    finally ForkedJvm.kill(p)
    assert(snapshot(dir) == before)
    assert(ids(dir) == base)
  }

  test("SIGKILL racing the commit rename: store is pre-admission or fully admitted, never partial") {
    val dir = baseStore()
    val p = ForkedJvm.start(childMain, Seq(dir, "stage-commit"))
    try assert(ForkedJvm.awaitLine(p, "STAGED").isDefined, "child never staged")
    finally ForkedJvm.kill(p) // lands before or after the rename — both legal
    val observed = ids(dir)
    assert(observed == base || observed == (base ++ batch),
      s"illegal third state: ${observed.size} ids")
  }

  test("SIGKILL after commit: the batch is durably and completely admitted") {
    val dir = baseStore()
    val p = ForkedJvm.start(childMain, Seq(dir, "stage-commit"))
    try assert(ForkedJvm.awaitLine(p, "COMMITTED").isDefined, "child never committed")
    finally ForkedJvm.kill(p)
    assert(ids(dir) == (base ++ batch))
  }
}
