package graft.operators

import java.io.File
import java.nio.file.{Files, Paths}
import scala.sys.process._

/** Executor-side execution of a user command over bind-mounted host paths.
  *
  * The reference runs commands inside Docker containers via docker-java
  * (`/root/reference/src/main/scala/se/uu/it/mare/DockerHelper.scala:66-144`,
  * entrypoint `sh -c <command>`). Because the entrypoint is always `sh -c`,
  * a plain subprocess with the same mounts is semantically identical when the
  * image's tools exist on the host — so [[SubprocessRunner]] is the default
  * (and the only one testable in this sandbox), with [[DockerRunner]] the
  * drop-in for real clusters with a Docker daemon per node.
  *
  * Contract (same as the reference): blocks until exit; non-zero exit status
  * throws, which surfaces as a Spark task failure → standard task retry.
  */
trait CommandRunner extends Serializable {
  /** Run `sh -c command` with each (hostPath → containerPath) bind visible to
    * the command at containerPath. Throws RuntimeException on non-zero exit. */
  def run(command: String, binds: Seq[(File, String)]): Unit
}

/** Runs the command as a host subprocess in a per-invocation sandbox dir.
  * Each bind is symlinked into the sandbox at its container path (leading '/'
  * stripped) and the command runs with cwd = sandbox, so `TextFile("/in.txt")`
  * is addressable as `in.txt` (or `./in.txt`). Also exported as env vars
  * GRAFT_BIND_0..n for commands that prefer explicit paths. */
object SubprocessRunner extends CommandRunner {

  override def run(command: String, binds: Seq[(File, String)]): Unit = {
    val sandbox = Files.createTempDirectory(
      Paths.get(sys.env.getOrElse("TMPDIR", "/tmp")), "graft_sandbox_")
    try {
      val env = binds.zipWithIndex.map { case ((host, _), i) =>
        s"GRAFT_BIND_$i" -> host.getAbsolutePath
      }
      binds.foreach { case (host, containerPath) =>
        val rel = containerPath.dropWhile(_ == '/')
        require(rel.nonEmpty, s"invalid container path: $containerPath")
        val link = sandbox.resolve(rel)
        Option(link.getParent).foreach(p => Files.createDirectories(p))
        Files.createSymbolicLink(link, host.toPath.toAbsolutePath); ()
      }
      val logger = ProcessLogger(
        o => System.err.println(s"[graft cmd] $o"),
        e => System.err.println(s"[graft cmd] $e"))
      val t0 = System.nanoTime()
      val exit = Process(Seq("sh", "-c", command), sandbox.toFile, env: _*) ! logger
      val ms = (System.nanoTime() - t0) / 1000000
      System.err.println(s"[graft] command took $ms ms (exit $exit)")
      if (exit != 0)
        throw new RuntimeException(s"command failed with exit status $exit: $command")
      // A command may REPLACE an output symlink instead of writing through it
      // (mv/rename, sed -i): the result then lives in the sandbox while the
      // host path stays empty. Reconcile by moving such outputs back — this
      // restores Docker bind-mount semantics, where a rename inside the
      // container lands in the mounted volume.
      binds.foreach { case (host, containerPath) =>
        val link = sandbox.resolve(containerPath.dropWhile(_ == '/'))
        if (Files.exists(link) && !Files.isSymbolicLink(link)) {
          if (Files.isDirectory(host.toPath)) () // dir binds keep the symlink
          else {
            Files.deleteIfExists(host.toPath)
            Files.move(link, host.toPath)
          }
        }
      }
    } finally {
      // best-effort sandbox cleanup (symlinks only; bind targets survive)
      try {
        val stream = Files.walk(sandbox)
        try stream.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { Files.deleteIfExists(p); () })
        finally stream.close()
      } catch { case _: Exception => () }
    }
  }
}

/** Docker-CLI runner for clusters with a daemon per worker: mirrors the
  * reference's pull-if-absent + volume-bind + `sh -c` entrypoint semantics
  * (DockerHelper.scala:80-108). Source-compatible, not exercisable in this
  * sandbox (no Docker daemon) — kept behind the same trait so pipelines are
  * runtime-agnostic. */
case class DockerRunner(imageName: String, forcePull: Boolean = false)
    extends CommandRunner {

  /** Image name with the reference's default-`:latest` normalization
    * (DockerHelper.scala:51-64). */
  def imageWithTag: String =
    if (imageName.contains(":")) imageName else s"$imageName:latest"

  override def run(command: String, binds: Seq[(File, String)]): Unit = {
    val image = imageWithTag
    val present = Process(Seq("docker", "image", "inspect", image)).!(ProcessLogger(_ => ())) == 0
    if (forcePull || !present) {
      val pull = Process(Seq("docker", "pull", image)).!
      if (pull != 0) throw new RuntimeException(s"docker pull failed for $image")
    }
    val volumes = binds.flatMap { case (host, cp) =>
      Seq("-v", s"${host.getAbsolutePath}:$cp")
    }
    val cmd = Seq("docker", "run", "--rm", "--entrypoint", "sh") ++
      volumes ++ Seq(image, "-c", command)
    val logger = ProcessLogger(
      o => System.err.println(s"[graft docker] $o"),
      e => System.err.println(s"[graft docker] $e"))
    val exit = cmd ! logger
    if (exit != 0)
      throw new RuntimeException(s"container failed with exit status $exit: $command")
  }
}
