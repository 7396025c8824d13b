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
}
