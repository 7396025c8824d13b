package graft

import java.io.{BufferedReader, File, InputStreamReader}

/** Launch a child JVM with this test JVM's classpath — the only honest way
  * to test crash-injection (SIGKILL mid-protocol) and hard memory bounds
  * (-Xmx), neither of which can be simulated inside a shared session. */
object ForkedJvm {

  /** Spark-4-on-JDK-17 module opens, same list as build.sbt (the child
    * creates its own SparkSession outside spark-submit). */
  val sparkAddOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  def start(mainClass: String, args: Seq[String],
      extraJvm: Seq[String] = Nil): Process = {
    val java = new File(new File(System.getProperty("java.home"), "bin"),
      "java").getAbsolutePath
    val cmd = Seq(java) ++ sparkAddOpens ++ extraJvm ++
      Seq("-Dspark.ui.enabled=false", "-cp",
        System.getProperty("java.class.path"), mainClass) ++ args
    new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
  }

  /** Block until the child prints a line containing `marker` (returns it),
    * or the child exits / `timeoutMs` elapses (returns None). The reader
    * only calls readLine() when input is ready, so a child that wedges
    * while printing NOTHING still times out instead of blocking the whole
    * test session on an indefinite readLine. */
  def awaitLine(p: Process, marker: String, timeoutMs: Long = 120000): Option[String] = {
    val r = new BufferedReader(new InputStreamReader(p.getInputStream))
    val deadline = System.currentTimeMillis() + timeoutMs
    val sb = new StringBuilder
    while (System.currentTimeMillis() < deadline) {
      if (r.ready()) {
        val c = r.read()
        if (c < 0) return None // EOF: child exited without the marker
        if (c == '\n') {
          val line = sb.toString(); sb.clear()
          if (line.contains(marker)) return Some(line)
        } else if (c != '\r') sb.append(c.toChar)
      } else if (!p.isAlive && !r.ready()) {
        // drained and dead — check the trailing unterminated line once
        return if (sb.toString().contains(marker)) Some(sb.toString()) else None
      } else Thread.sleep(10)
    }
    None
  }

  /** Poll until `cond` holds; false on timeout. */
  def awaitCond(cond: => Boolean, timeoutMs: Long = 120000): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(10)
    cond
  }

  def kill(p: Process): Unit = {
    p.destroyForcibly()
    p.waitFor(): Unit
  }
}
