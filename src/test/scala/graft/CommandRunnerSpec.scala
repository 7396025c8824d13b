package graft

import java.io.File
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

import graft.operators.DockerRunner

/** Daemon-free DockerRunner matrix: the reference proves pull-if-absent /
  * image-present / force-pull / exit-code semantics against a live daemon
  * (reference DockerHelperTest.scala:31-91); here the same decisions are
  * pinned through a recording fake exec, which the CLI runner funnels every
  * daemon interaction through. */
class CommandRunnerSpec extends AnyFunSuite {

  /** Records argvs; scripted exits keyed by argv head ("inspect"/"pull"/"run"). */
  private class FakeExec(inspectExit: Int, pullExit: Int = 0, runExit: Int = 0) {
    val calls = mutable.Buffer[(Seq[String], Boolean)]()
    val fn: DockerRunner.Exec = (argv, quiet) => {
      calls += ((argv, quiet))
      argv match {
        case Seq("docker", "image", "inspect", _*) => inspectExit
        case Seq("docker", "pull", _*)             => pullExit
        case Seq("docker", "run", _*)              => runExit
        case other => fail(s"unexpected argv: $other")
      }
    }
    def invoked(verb: String): Seq[Seq[String]] =
      calls.map(_._1).filter(_.lift(1).contains(verb)).toSeq
  }

  test("image absent: pull happens before run") {
    val fake = new FakeExec(inspectExit = 1)
    DockerRunner("busybox:1", exec = fake.fn).run("true", Seq())
    assert(fake.calls.map(_._1.take(2)).toSeq == Seq(
      Seq("docker", "image"), Seq("docker", "pull"), Seq("docker", "run")))
    assert(fake.invoked("pull") == Seq(Seq("docker", "pull", "busybox:1")))
  }

  test("image present: no pull") {
    val fake = new FakeExec(inspectExit = 0)
    DockerRunner("busybox:1", exec = fake.fn).run("true", Seq())
    assert(fake.invoked("pull").isEmpty)
    assert(fake.invoked("run").nonEmpty)
  }

  test("force pull: pull even when present") {
    val fake = new FakeExec(inspectExit = 0)
    DockerRunner("busybox:1", forcePull = true, exec = fake.fn).run("true", Seq())
    assert(fake.invoked("pull") == Seq(Seq("docker", "pull", "busybox:1")))
  }

  test("failed pull raises; run is never attempted") {
    val fake = new FakeExec(inspectExit = 1, pullExit = 1)
    val ex = intercept[RuntimeException] {
      DockerRunner("no/such:img", exec = fake.fn).run("true", Seq())
    }
    assert(ex.getMessage.contains("docker pull failed"))
    assert(fake.invoked("run").isEmpty)
  }

  test("non-zero container exit raises with the status") {
    val fake = new FakeExec(inspectExit = 0, runExit = 7)
    val ex = intercept[RuntimeException] {
      DockerRunner("busybox:1", exec = fake.fn).run("false", Seq())
    }
    assert(ex.getMessage.contains("exit status 7"))
  }

  test("run argv: sh -c entrypoint with volume binds in order") {
    val fake = new FakeExec(inspectExit = 0)
    val binds = Seq(
      new File("/data/in.txt") -> "/in.txt",
      new File("/data/out") -> "/out")
    DockerRunner("repo/img", exec = fake.fn).run("wc -l in.txt", binds)
    assert(fake.invoked("run") == Seq(Seq(
      "docker", "run", "--rm", "--entrypoint", "sh",
      "-v", "/data/in.txt:/in.txt", "-v", "/data/out:/out",
      "repo/img:latest", "-c", "wc -l in.txt")))
  }

  test("inspect probe is quiet; pull and run are logged") {
    val fake = new FakeExec(inspectExit = 1)
    DockerRunner("busybox:1", exec = fake.fn).run("true", Seq())
    val byVerb = fake.calls.map(c => c._1(1) -> c._2).toMap
    assert(byVerb == Map("image" -> true, "pull" -> false, "run" -> false))
  }

  test("DockerRunner against a LIVE daemon (env-gated; cancels without one)") {
    // Opt-in integration mirror of the reference's live-daemon tests
    // (DockerHelperTest.scala:31-91): real pull-if-absent, bind-mounted I/O,
    // force-pull, and the non-zero-exit contract, through the default
    // cliExec instead of a fake. The build sandbox has no daemon and no
    // egress, so `assume` cancels the test cleanly there; on any host with a
    // working `docker` (honoring DOCKER_HOST/DOCKER_TLS_VERIFY like the
    // reference client config, DockerHelper.scala:23-34) it runs for real.
    // Override the image with GRAFT_DOCKER_TEST_IMAGE. Explicit opt-in via
    // GRAFT_DOCKER_LIVE=1: the test force-removes the target image to
    // exercise the pull branch, a side effect a developer machine with a
    // daemon must ask for, not get by default.
    import java.nio.file.Files
    def quietly(argv: String*): Int = scala.util.Try(
      sys.process.Process(argv).!(sys.process.ProcessLogger(_ => ()))
    ).getOrElse(127)
    assume(sys.env.get("GRAFT_DOCKER_LIVE").contains("1"),
      "set GRAFT_DOCKER_LIVE=1 to opt in to the live-daemon test " +
        "(it removes and re-pulls the test image)")
    assume(quietly("docker", "info") == 0,
      "no reachable Docker daemon — set DOCKER_HOST or install docker to enable")
    val image = sys.env.getOrElse("GRAFT_DOCKER_TEST_IMAGE", "busybox:1.36")
    // start absent so the pull-if-absent branch genuinely pulls
    quietly("docker", "rmi", "-f", image)
    val in = Files.createTempDirectory("graft_docker_in_")
    val out = Files.createTempDirectory("graft_docker_out_")
    Files.write(in.resolve("in.txt"), "alpha\nbeta\ngamma\n".getBytes("UTF-8"))
    val runner = DockerRunner(image)
    runner.run("wc -l < /data/in.txt | tr -d ' ' > /out/n.txt",
      Seq(in.toFile -> "/data", out.toFile -> "/out"))
    assert(new String(Files.readAllBytes(out.resolve("n.txt")), "UTF-8").trim == "3")
    // image now present: pull-if-absent skips the pull; forcePull re-pulls
    DockerRunner(image).run("true", Seq())
    DockerRunner(image, forcePull = true).run("true", Seq())
    // non-zero container exit surfaces as RuntimeException with the status
    val e = intercept[RuntimeException] { runner.run("exit 7", Seq()) }
    assert(e.getMessage.contains("7"))
  }
}
