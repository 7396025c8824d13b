package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` implementations — the engine's UDAF
  * surface (SURVEY.md §2.B). These are the type-safe analog of the
  * reference's containerized combiners (`MaRe.reduce`'s associative command
  * contract): partial buffers merge associatively, so Spark runs them as
  * partial + final aggregation, exactly like built-in aggregates. */
object TypedAggregators {

  /** Welford-style mergeable mean/variance (population) over doubles. */
  case class MomentsBuf(n: Long, mean: Double, m2: Double)

  class MeanVariance extends Aggregator[Double, MomentsBuf, (Double, Double)] {
    override def zero: MomentsBuf = MomentsBuf(0L, 0.0, 0.0)
    override def reduce(b: MomentsBuf, x: Double): MomentsBuf = {
      val n = b.n + 1
      val d = x - b.mean
      val mean = b.mean + d / n
      MomentsBuf(n, mean, b.m2 + d * (x - mean))
    }
    override def merge(a: MomentsBuf, b: MomentsBuf): MomentsBuf = {
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val d = b.mean - a.mean
        MomentsBuf(n, a.mean + d * b.n / n,
          a.m2 + b.m2 + d * d * a.n * b.n / n)
      }
    }
    override def finish(r: MomentsBuf): (Double, Double) =
      (r.mean, if (r.n == 0) 0.0 else r.m2 / r.n)
    override def bufferEncoder: Encoder[MomentsBuf] = Encoders.product[MomentsBuf]
    override def outputEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  }

  /** Bounded top-k collector: keeps the k LARGEST values, returned in
    * descending order (associative merge keeps only k elements per buffer —
    * constant state regardless of group size). */
  class TopK(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {
    override def zero: Seq[Double] = Vector.empty
    override def reduce(b: Seq[Double], x: Double): Seq[Double] =
      (b :+ x).sorted(Ordering[Double].reverse).take(k)
    override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] =
      (a ++ b).sorted(Ordering[Double].reverse).take(k)
    override def finish(r: Seq[Double]): Seq[Double] = r
    override def bufferEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** [[TopK]] with a PAYLOAD: keeps the k best (score, id) pairs under
    * (score DESC, id ASC) — the map-side partial heap behind
    * `q81_group_topk_agg`'s aggregate top-k. Exact-integer ordering with
    * the id tiebreak means eviction can never disagree with a window
    * row_number on a double ulp. State is ≤ k pairs at every
    * partial/merge step, so the shuffle carries at most k rows per
    * (group, partition) where the window form shuffles every fact row. */
  class TopKBy(k: Int)
      extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
    private def best(xs: Seq[(Long, Long)]): Seq[(Long, Long)] =
      xs.sortBy { case (s, id) => (-s, id) }.take(k)
    override def zero: Seq[(Long, Long)] = Vector.empty
    override def reduce(b: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] =
      best(b :+ x)
    override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
      best(a ++ b)
    override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = best(r)
    override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Count-Min sketch over string keys (Cormode & Muthukrishnan 2005):
    * `depth` independent hash rows × `width` counters; point estimate =
    * min over rows. Completes the engine's sketch family (HLL cardinality
    * q20, KLL percentiles q25, CMS frequencies here): frequency estimation
    * in O(depth × width) memory per group REGARDLESS of key cardinality —
    * the bounded-state stand-in for the exact (source, token) heavy-hitters
    * shuffle when the vocabulary itself no longer fits.
    *
    * Guarantees (pinned by FunctionsSpec): estimate ≥ true count always
    * (counters only over-count); estimate ≤ true + εN with probability
    * 1−δ where ε = e/width, δ = e^−depth. Merge = cell-wise add (same
    * seeds), so partial aggregation works like any built-in. Hashes are
    * seeded deterministically — two sketches of the same data are
    * identical, keeping reruns reproducible. */
  case class CmsBuf(n: Long, cells: Array[Long])

  class CountMinSketch(depth: Int = 4, width: Int = 1024)
      extends Aggregator[String, CmsBuf, CmsBuf] {
    require(depth >= 1 && width >= 2)
    override def zero: CmsBuf = CmsBuf(0L, new Array[Long](depth * width))
    override def reduce(b: CmsBuf, x: String): CmsBuf = {
      var r = 0
      while (r < depth) {
        b.cells(r * width + CountMinSketch.cell(x, r, width)) += 1L
        r += 1
      }
      CmsBuf(b.n + 1, b.cells)
    }
    override def merge(a: CmsBuf, b: CmsBuf): CmsBuf = {
      var i = 0
      while (i < a.cells.length) { a.cells(i) += b.cells(i); i += 1 }
      CmsBuf(a.n + b.n, a.cells)
    }
    override def finish(r: CmsBuf): CmsBuf = r
    override def bufferEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
    override def outputEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
  }

  object CountMinSketch {
    /** Row-seeded cell index for a key (MurmurHash3 of the string, mixed
      * with the row seed). */
    def cell(key: String, row: Int, width: Int): Int = {
      val h = scala.util.hashing.MurmurHash3.stringHash(key, 0x9747b28c + row)
      java.lang.Math.floorMod(h, width)
    }

    /** Point-estimate a key's frequency from a finished sketch. */
    def estimate(sketch: CmsBuf, key: String, depth: Int, width: Int): Long = {
      // dims are caller-supplied; a mismatch with the building aggregator's
      // geometry silently mis-indexes (or throws AIOOBE mid-scan) — fail fast
      require(depth * width == sketch.cells.length,
        s"sketch geometry mismatch: depth*width = ${depth * width}, " +
          s"cells = ${sketch.cells.length}")
      var best = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = sketch.cells(r * width + cell(key, r, width))
        if (c < best) best = c
        r += 1
      }
      if (best == Long.MaxValue) 0L else best
    }
  }
}
