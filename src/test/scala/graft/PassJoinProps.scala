package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.PassJoinUtil
import org.apache.spark.unsafe.types.UTF8String

/** Property-based pin of the PassJoin kernel contract (no Spark session —
  * pure driver-side kernel calls): for ANY pair within edit distance ≤ k,
  * the shorter side's segment keys must intersect the longer side's
  * substring keys. This is the losslessness that makes the candidate
  * equi-join safe to use as the only generator — a fixture suite can't
  * explore segment-boundary/shift interactions the way random edit scripts
  * do. The small alphabet maximizes repeated-content collisions (the
  * hardest case for position windows). */
object PassJoinProps extends Properties("PassJoinUtil") {

  private val K = 4

  private def keySet(s: String, seg: Boolean): Set[Long] = {
    val ad =
      if (seg) PassJoinUtil.segKeys(UTF8String.fromString(s), K)
      else PassJoinUtil.subKeys(UTF8String.fromString(s), K)
    ad.toLongArray().toSet
  }

  private val alpha: Gen[Char] = Gen.oneOf('a', 'b', ' ', 'é')

  private val baseGen: Gen[String] = for {
    n <- Gen.choose(0, 60)
    cs <- Gen.listOfN(n, alpha)
  } yield cs.mkString

  /** One random edit (insert / delete / substitute) — BMP chars only, so
    * Java length == code-point length and the ≤1-edit ground truth holds. */
  private def editGen(s: String): Gen[String] = for {
    op <- Gen.choose(0, 2)
    c <- alpha
    out <- op match {
      case 0 if s.nonEmpty => // delete
        Gen.choose(0, s.length - 1).map(p => s.take(p) + s.drop(p + 1))
      case 1 => // insert
        Gen.choose(0, s.length).map(p => s.take(p) + c + s.drop(p))
      case _ if s.nonEmpty => // substitute
        Gen.choose(0, s.length - 1).map(p => s.updated(p, c))
      case _ => Gen.const(s + c)
    }
  } yield out

  private val pairGen: Gen[(String, String)] = for {
    a <- baseGen
    m <- Gen.choose(0, K)
    b <- (0 until m).foldLeft(Gen.const(a))((g, _) => g.flatMap(editGen))
  } yield (a, b)

  property("pairs within k edits always share a (segment ⋈ substring) key") =
    forAll(pairGen) { case (a, b) =>
      val (short, long) = if (a.length <= b.length) (a, b) else (b, a)
      if (short.length <= K) {
        // tiny-block territory: the join handles these outside the segment
        // path; the kernel contract only requires both sides stay ≤ 2k
        long.length <= 2 * K
      } else keySet(short, seg = true).intersect(keySet(long, seg = false)).nonEmpty
    }

  property("segKeys emits exactly k+1 keys for len ≥ k+1, none below") =
    forAll(baseGen) { s =>
      val n = keySet(s, seg = true).size
      // k+1 segments; distinct-set size may dip only via hash-equal segments
      if (s.length > K) n >= 1 && n <= K + 1
      else n == 0
    }

  property("subKeys covers the identity pair (distance 0)") =
    forAll(baseGen) { s =>
      s.length <= K ||
        keySet(s, seg = true).intersect(keySet(s, seg = false)).nonEmpty
    }
}
