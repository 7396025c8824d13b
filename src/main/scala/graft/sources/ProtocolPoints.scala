package graft.sources

/** Named pause points inside the Store/Layout commit protocols — the seam
  * the randomized-interleaving fuzzer ([[graft.StoreFuzzSpec]]) drives to
  * stretch the microsecond windows between protocol steps into schedulable
  * gaps. Hooks are PER-THREAD: a fuzz worker installs a (seeded) delay for
  * its own thread only, so concurrent fuzz seeds — and production callers
  * on other threads — never interact. With no hook installed, [[pause]] is
  * one ConcurrentHashMap.get against the calling thread: negligible next
  * to the file IO on every side of each pause point. */
private[graft] object ProtocolPoints {
  private val hooks =
    new java.util.concurrent.ConcurrentHashMap[Thread, String => Unit]()

  /** Install a hook for the CURRENT thread (replacing any previous). */
  def install(f: String => Unit): Unit =
    hooks.put(Thread.currentThread(), f): Unit

  /** Remove the current thread's hook. */
  def uninstall(): Unit =
    hooks.remove(Thread.currentThread()): Unit

  /** Process-wide hook for fault injection on threads the installer does
    * not own (a StreamingQuery's micro-batch thread): checked after the
    * per-thread hook. Installers must self-limit (fire-once flags) —
    * suites run sequentially, so cross-suite interference is structural,
    * not racy. */
  @volatile private var global: String => Unit = null
  def installGlobal(f: String => Unit): Unit = global = f
  def uninstallGlobal(): Unit = global = null

  /** Invoked by the protocol code at each named step boundary. */
  @inline def pause(point: String): Unit = {
    val f = hooks.get(Thread.currentThread())
    if (f != null) f(point)
    val g = global
    if (g != null) g(point)
  }
}
