package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.queries.DedupRewrite

/** Property-based pin of the span-rewrite contract on GENERATED corpora —
  * shapes a fixture suite doesn't explore: empty docs, whitespace runs and
  * mixed case (normalization edges), docs shorter than one chunk, heavy
  * within- and cross-doc duplication from a tiny vocabulary, and duplicate
  * spans landing at different chunk offsets. The whole property runs
  * through the REAL operator (temp-parquet corpus → dedupChunks) and
  * compares against an independent driver recompute of the policy.
  *
  * Kept to few, large cases: each trial pays a Spark job, so the generator
  * packs many docs per corpus instead of many corpora. */
object DedupChunksProps extends Properties("DedupRewrite") {
  import TestSpark.spark
  import spark.implicits._

  private val W = DedupRewrite.ChunkWords

  // tiny vocabulary + whitespace/case noise → dense span collisions AND
  // normalization exercise in one generator
  private val word: Gen[String] = Gen.oneOf("ab", "cd", "EF", "gh", "ij")
  private val sep: Gen[String] = Gen.oneOf(" ", "  ", "\t", " \n")
  private val docGen: Gen[String] = for {
    n <- Gen.frequency(1 -> Gen.const(0), 9 -> Gen.choose(1, 3 * W + 5))
    ws <- Gen.listOfN(n, word)
    ss <- Gen.listOfN(math.max(n - 1, 0), sep)
  } yield ws.zip(ss).map { case (w, s) => w + s }.mkString +
    (if (n > 0) ws.last else "")

  // each trial is a real Spark job over a 24-doc corpus — 15 trials give
  // wide shape coverage without turning the suite into a bench
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  private def normTokens(text: String): Seq[String] =
    text.toLowerCase.trim.split("\\s+").toSeq.filter(_.nonEmpty)

  property("operator equals the keep-first policy recompute") =
    forAll(Gen.listOfN(24, docGen)) { texts =>
      val dir = java.nio.file.Files.createTempDirectory("graft_chunkprop_").toString
      try {
        texts.zipWithIndex
          .map { case (t, i) => (i.toLong, t, "en", "src", t.length.toLong) }
          .toDF("doc_id", "text", "lang", "source", "n_chars")
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")

        val got = DedupRewrite.dedupChunks(spark, dir)
          .as[(Long, Long, Long, String)].collect()
          .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

        // independent recompute: normalize, chunk, global min-(id, idx)
        val chunks = texts.zipWithIndex.flatMap { case (t, i) =>
          normTokens(t).grouped(W).zipWithIndex.map { case (ws, ci) =>
            (i.toLong, ci.toLong, ws.mkString(" "))
          }
        }
        val first = chunks.groupBy(_._3).view
          .mapValues(cs => cs.map(c => (c._1, c._2)).min).toMap
        val expect = texts.indices.map { i =>
          val mine = chunks.filter(_._1 == i.toLong)
          val kept = mine.filter(c => first(c._3) == ((c._1, c._2)))
          i.toLong -> ((normTokens(texts(i)).length.toLong,
            kept.length.toLong,
            kept.sortBy(_._2).map(_._3).mkString(" ")))
        }.toMap
        got == expect
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
        true
      }
    }
}
