package graft.queries

/** Phase-split timing for the store-backed driver faces (VERDICT r9
  * task 3). Each such face deliberately prices a throwaway-store BUILD +
  * N ADMISSIONS + a SERVE as one bench number — honest about what the
  * bench run does, but useless to a production reader, who amortizes the
  * build across a deployment and admissions across micro-batches and only
  * pays SERVE per query. This collector splits the one number without
  * changing what the driver-visible query computes:
  *
  *  - the faces wrap their steps in [[time]]`("build"|"admit"|"serve")`;
  *    with no collector installed (Verify, the driver, specs) the wrapper
  *    is a bare passthrough — zero behavior change;
  *  - [[graft.Bench]] installs a collector (thread-local, so concurrent
  *    suites never cross-talk), runs the face, and reports per-phase
  *    seconds under `phases` in bench.json.
  *
  * Repeated wraps of the same name within one face accumulate (two
  * admits report as one `admit` total). Laziness caveat: a phase reports
  * the work its block MATERIALIZES; the instrumented faces end their
  * serve phase in an eager checkpoint, so serve carries the full
  * store-read-to-result cost. */
object Phases {
  private val tl = new ThreadLocal[scala.collection.mutable.Map[String, Double]]()

  /** Run `body` with a fresh collector installed on this thread; returns
    * (result, per-phase seconds). */
  def collecting[A](body: => A): (A, Map[String, Double]) = {
    val m = scala.collection.mutable.Map.empty[String, Double]
    tl.set(m)
    try { val a = body; (a, m.toMap) }
    finally tl.remove()
  }

  /** Accumulate `body`'s elapsed seconds under `name` when a collector is
    * installed; otherwise a bare passthrough. */
  def time[A](name: String)(body: => A): A = {
    val m = tl.get()
    if (m == null) body
    else {
      val t0 = System.nanoTime()
      try body
      finally m.update(name, m.getOrElse(name, 0.0) + (System.nanoTime() - t0) / 1e9)
    }
  }
}
