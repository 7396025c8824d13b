package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions => TF, VectorFunctions}
import graft.queries.Dedup

/** Adversarial scale fixtures pinning candidate VOLUME — not just
  * losslessness — for the two sub-quadratic candidate generators. The
  * losslessness of each generator is property-tested elsewhere
  * (PassJoinProps, PrepOpsSpec/LlmOpsSpec differentials); these specs catch a
  * regression to a quadratic generator, which would stay correct and green
  * everywhere else while silently destroying the 100 TB story.
  *
  * Fixture (a) — uniform-length corpus: every doc the same length, so
  * length-band blocking degenerates to ONE band and its within-band join
  * emits C(n,2) ≈ n²/2 candidates. PassJoin segment filtering must stay ≤
  * c·n: candidates require an exact (length, position, content) segment
  * match, which unrelated fixed-length random strings essentially never
  * produce.
  *
  * Fixture (b) — tiny-vocabulary repetitive corpus: every doc shares a long
  * run of identical filler, so every naive inverted-index join (or a prefix
  * ordered by token VALUE rather than rarity) meets all n docs on the filler
  * shingles' posting lists → C(n,2) candidates. Rarest-first prefix ordering
  * must keep those high-df shingles out of the index and stay ≤ c·n.
  */
class CandidateVolumeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("PassJoin candidates stay linear on a uniform-length corpus") {
    val rnd = new scala.util.Random(42)
    val n = 500
    val len = 36
    def randDoc(): String =
      (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val originals = (0 until n).map(i => (i.toLong, randDoc()))
    // positive controls: 10 twins at edit distance ≤ 4 (so zero candidates
    // can't pass because the fixture is degenerate)
    val twins = (0 until 10).map { i =>
      val t = originals(i)._2
      ((n + i).toLong, t.updated(3, '0').updated(30, '1')) // 2 substitutions
    }
    val docs = (originals ++ twins).toDF("doc_id", "text")
      .select($"doc_id", TF.normalizeText($"text").as("t"))
      .withColumn("len", length($"t"))
    val k = 4

    // every doc has the same length -> band blocking is one band, C(510,2) =
    // 129,795 candidates; PassJoin must stay linear
    val candCount = Dedup.passJoinCandidates(docs, k).count()
    assert(candCount <= 2L * (n + 10),
      s"PassJoin candidate volume $candCount exceeds 2n on a uniform-length " +
        "corpus — generator has regressed toward quadratic")

    // and the generator is still lossless here: the verified pairs are
    // exactly the 10 planted twins
    val pairs = Dedup.passJoinPairs(docs, k)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val expected = (0 until 10).map(i => (i.toLong, (n + i).toLong)).toSet
    assert(pairs == expected,
      s"missing=${expected -- pairs} extra=${pairs -- expected}")
  }

  test("prefix-filter candidates stay linear on a tiny-vocab repetitive corpus") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val n = 300
    // 40 shared filler tokens (identical run in every doc -> shingle df = n)
    val filler = (0 until 40).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    // 60 per-doc unique tokens (shingle df = 1), so the rarest-first prefix
    // (|prefix| = sz - ceil(sz/2) + 1 ≈ sz/2) is filled entirely by df=1
    // shingles and posting lists never exceed 1
    def uniqueTail(id: Int): String =
      (0 until 60).map(j => s"u${id}w$j").mkString(" ")
    val originals = (0 until n).map(i => (i.toLong, s"$filler ${uniqueTail(i)}"))
    // positive controls: 5 twins sharing the unique tail (Jaccard ~ 0.98)
    val twins = (0 until 5).map { i =>
      ((n + i).toLong, s"$filler ${uniqueTail(i)} extraword")
    }
    val docs = (originals ++ twins).toDF("doc_id", "text")
      .select(lit("fix").as("source"), $"doc_id",
        VectorFunctions.shingleHashSet($"text", 3).as("sh"))
      .withColumn("sz", size($"sh"))

    // a naive inverted index (no prefix filter, or value-ordered prefix)
    // meets all docs on the filler posting lists -> C(305,2) = 46,360
    // candidates; rarest-first prefix filtering must stay linear
    val candCount = Dedup.prefixFilterCandidates(docs, tNum = 1, tDen = 2).count()
    assert(candCount <= 2L * (n + 5),
      s"prefix-filter candidate volume $candCount exceeds 2n on a " +
        "repetitive corpus — rarest-first ordering has regressed")

    // lossless here: verified pairs are exactly the 5 planted twins
    val pairs = Dedup.prefixFilterJaccardPairs(docs, tNum = 1, tDen = 2)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val expected = (0 until 5).map(i => (i.toLong, (n + i).toLong)).toSet
    assert(pairs == expected,
      s"missing=${expected -- pairs} extra=${pairs -- expected}")
  }

  test("span-overlap df cap keeps a boilerplate-heavy corpus linear") {
    // every doc opens with the same 20-token license header — without the
    // df cap its grams alone join all C(n,2) pairs; with the cap they are
    // classified as boilerplate (df = n > 32) and generate nothing
    val n = 300
    val header = (0 until 20).map(j => s"license$j").mkString(" ")
    def uniqueBody(id: Int): String =
      (0 until 30).map(j => s"b${id}w$j").mkString(" ")
    val originals = (0 until n).map(i => (i.toLong, s"$header ${uniqueBody(i)}"))
    // planted: 5 docs that copy a full unique paragraph from docs 0..4
    // (rare grams, df = 2 — the signal the cap must NOT suppress)
    val copies = (0 until 5).map { i =>
      ((n + i).toLong, s"$header ${uniqueBody(i)} trailing words here")
    }
    val docs = (originals ++ copies).toDF("doc_id", "text")
    val pairs = Dedup.spanOverlapOn(docs, n = 12, dfCap = 32)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val expected = (0 until 5).map(i => (i.toLong, (n + i).toLong)).toSet
    assert(pairs == expected,
      s"missing=${expected -- pairs} extra=${pairs -- expected}")
  }

  test("phash band-join candidates stay linear over distinct payloads " +
      "(copies having collapsed upstream)") {
    import graft.queries.Multimodal
    // 600 UNRELATED payloads: their 64-bit simhashes are ~uniform, so a
    // 16-bit band key collides between two docs w.p. ~2^-16 and expected
    // candidate volume is 4·C(600,2)/65536 ≈ 11 — the linear regime the
    // banding scheme promises once exact copies are collapsed to reps (the
    // quadratic failure mode, pinned separately in LlmOpsSpec). A planted
    // twin pair keeps the fixture non-degenerate.
    // RANDOM payloads, not templated text: docs sharing a template share
    // most 4-byte windows and land simhash-close — which is near-dup
    // behavior, not the unrelated-corpus regime this fixture pins
    val rnd = new scala.util.Random(7)
    val n = 600
    def randPayload(): String =
      (0 until 200).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val docs = (0 until n).map(i => (i.toLong, randPayload())) :+
      ((n.toLong, (0 until 200).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString))
    val twinned = docs.updated(n, (n.toLong, docs.head._2 + "tail"))
    val hashed = twinned.toDF("doc_id", "text")
      .select($"doc_id", $"text")
      .as[(Long, String)]
      .map { case (id, t) => (id, Multimodal.byteSimHash64(t.getBytes("UTF-8"))) }
      .toDF("doc_id", "ph")
    val candCount = Multimodal.phashBandCandidates(hashed).count()
    assert(candCount <= 2L * (n + 1),
      s"phash candidate volume $candCount exceeds 2n on distinct payloads — " +
        "banding has regressed toward quadratic")
    // non-degeneracy: the planted twin must survive to a verified pair
    val pairs = Multimodal.multimodalPhashDedupOn(twinned.toDF("doc_id", "text"))
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs.exists { case (a, b, _) => a == 0L && b == n.toLong },
      s"planted twin lost: $pairs")
  }
}
