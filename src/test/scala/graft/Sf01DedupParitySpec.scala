package graft

import org.apache.spark.sql.functions._
import org.scalatest.Tag
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions => TF, VectorFunctions}
import graft.queries.Dedup
import graft.sources.Tables

/** Marks the ~minutes-scale sf0.1 differentials; exclude with
  * `testOnly -- -l graft.SlowTest` for a fast iteration loop. The default
  * `sbt test` RUNS these — they are part of the green bar. */
object SlowTest extends Tag("graft.SlowTest")

/** sf0.1 parity for the six oracle-checked dedup queries. The driver's
  * DuckDB oracle gates at sf0.01 (500 docs); the dedup family has the most
  * scale-sensitive numerics (float Jaccard boundaries, band membership,
  * segment-hash collisions), and a d389b86-class bug — correct at one SF,
  * wrong at the next — would pass every sf0.01 gate. DuckDB itself is
  * driver-side tooling, not on this JVM's classpath, so each query is
  * re-checked at sf0.1 (5,000 docs, 10× the oracle corpus) against an
  * INDEPENDENT implementation instead: brute-force cross joins, the
  * quadratic blocked/band fallbacks, and a driver-side union-find — the
  * same differentials the small-scale specs trust, at the bench SF. */
class Sf01DedupParitySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val sfBig = "/root/testdata/sf0.1"

  /** Brute-force exact-Jaccard pairs at threshold `t` over word-3-shingle
    * hash sets — O(n²) cross join with only a (lossless) size-ratio
    * pre-filter, sharing no candidate-generation code with the LSH path. */
  private lazy val bruteHighJaccardPairs: Set[(Long, Long)] = {
    val docs = Tables.documents(spark, sfBig)
      .select($"doc_id", VectorFunctions.shingleHashSet($"text", 3).as("sh"))
      .withColumn("sz", size($"sh"))
    val a = docs.select($"doc_id".as("doc_a"), $"sh".as("sh_a"), $"sz".as("sz_a"))
    val b = docs.select($"doc_id".as("doc_b"), $"sh".as("sh_b"), $"sz".as("sz_b"))
    a.crossJoin(b)
      .filter($"doc_a" < $"doc_b")
      // J >= 0.8 needs |min| >= 0.8*|max| — provably lossless, kills ~all pairs
      // before the merge-intersection
      .filter(least($"sz_a", $"sz_b") * 5 >= greatest($"sz_a", $"sz_b") * 4)
      .withColumn("inter", VectorFunctions.intersectSizeSorted($"sh_a", $"sh_b"))
      .filter($"inter" * 5 >= ($"sz_a" + $"sz_b" - $"inter") * 4) // I/U >= 4/5
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
  }

  /** Driver-side union-find closure of [[bruteHighJaccardPairs]] over all
    * sf0.1 doc ids — the independent clustering the CC loop is checked
    * against. Returns id -> min-id-of-component. */
  private lazy val bruteLabels: Map[Long, Long] = {
    val ids = Tables.documents(spark, sfBig).select($"doc_id").as[Long].collect()
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    bruteHighJaccardPairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    ids.map(i => i -> find(i)).toMap
  }

  test("dedup_exact at sf0.1 equals a raw-text-equality groupBy", SlowTest) {
    val viaMd5 = Dedup.dedupExact(spark, sfBig)
      .select($"keeper_id", $"n_copies").as[(Long, Long)].collect().toSet
    val viaText = Tables.documents(spark, sfBig)
      .groupBy($"text")
      .agg(min($"doc_id").as("keeper_id"), count(lit(1)).as("n_copies"))
      .select($"keeper_id", $"n_copies").as[(Long, Long)].collect().toSet
    assert(viaMd5 == viaText,
      s"md5-only=${viaMd5 -- viaText} text-only=${viaText -- viaMd5}")
  }

  test("dedup_minhash_pairs at sf0.1 equals brute-force exact Jaccard >= 0.8", SlowTest) {
    val lsh = Dedup.dedupMinhashPairs(spark, sfBig)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    // exact-verified candidates can't emit false positives; this pins that
    // 8x4 banding recall stays exact at 10x the oracle corpus (a borderline
    // pair whose bands all split IS the failure mode this spec exists for)
    assert(lsh == bruteHighJaccardPairs,
      s"missing=${bruteHighJaccardPairs -- lsh} extra=${lsh -- bruteHighJaccardPairs}")
  }

  test("dedup_ngram_jaccard at sf0.1 equals the blocked all-pairs form", SlowTest) {
    val pp = Dedup.dedupNgramJaccard(spark, sfBig)
      .select($"source", $"doc_a", $"doc_b", $"jaccard")
      .as[(String, Long, Long, Double)].collect().toSet
    val docs = Tables.documents(spark, sfBig)
      .select($"source", $"doc_id", VectorFunctions.shingleHashSet($"text", 3).as("sh"))
      .withColumn("sz", size($"sh"))
    val blocked = Dedup.blockedJaccardPairs(docs, 0.5)
      .select($"source", $"doc_a", $"doc_b", $"jac")
      .as[(String, Long, Long, Double)].collect().toSet
    // both sides compute jac as the same int-derived double -> exact equality
    assert(pp == blocked,
      s"prefix-only=${(pp -- blocked).take(5)} blocked-only=${(blocked -- pp).take(5)}")
  }

  test("dedup_fuzzy at sf0.1 equals the band-join form", SlowTest) {
    val pass = Dedup.fuzzyPairs(spark, sfBig, k = 4)
      .as[(Long, Long, Long)].collect().toSet
    val n = Tables.documents(spark, sfBig)
      .select($"doc_id", TF.normalizeText($"text").as("t"))
      .withColumn("len", length($"t"))
    val band = Dedup.bandFuzzyPairs(n, k = 4, bucketWidth = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(pass == band,
      s"passjoin-only=${(pass -- band).take(5)} band-only=${(band -- pass).take(5)}")
  }

  test("dedup_clusters at sf0.1 equals a driver-side union-find closure", SlowTest) {
    val engine = Dedup.dedupClusters(spark, sfBig)
      .select($"cluster_rep", $"n_members").as[(Long, Long)].collect().toSet
    val expected = bruteLabels.groupBy(_._2)
      .map { case (rep, m) => (rep, m.size.toLong) }.toSet
    assert(engine == expected,
      s"engine-only=${(engine -- expected).take(5)} uf-only=${(expected -- engine).take(5)}")
  }

  test("dedup_span_overlap at sf0.1 equals a driver-side inverted-index recompute", SlowTest) {
    val got = Dedup.dedupSpanOverlap(spark, sfBig)
      .as[(Long, Long, Long)].collect().toSet
    def toks(s: String): Seq[String] = {
      val n = s.toLowerCase.replaceAll("\\s+", " ").trim
      if (n.isEmpty) Seq.empty else scala.collection.immutable.ArraySeq
        .unsafeWrapArray(n.split(' '))
    }
    // inverted index on STRING grams: postings capped at 32 generate pairs
    // directly — O(postings × cap), not O(n²)
    val postings = scala.collection.mutable.Map.empty[String, List[Long]]
    Tables.documents(spark, sfBig).select($"doc_id", $"text")
      .as[(Long, String)].collect()
      .foreach { case (id, t) =>
        toks(t).sliding(12).filter(_.size == 12).map(_.mkString(" ")).toSet
          .foreach(g => postings(g) = id :: postings.getOrElse(g, Nil)) }
    val pairCounts = scala.collection.mutable.Map.empty[(Long, Long), Long]
    postings.values.filter(_.size <= 32).foreach { docs =>
      for (a <- docs; b <- docs if a < b)
        pairCounts((a, b)) = pairCounts.getOrElse((a, b), 0L) + 1L
    }
    val expected = pairCounts.map { case ((a, b), c) => (a, b, c) }.toSet
    assert(got == expected,
      s"engine-only=${(got -- expected).take(5)} driver-only=${(expected -- got).take(5)}")
  }

  test("dedup_canonical at sf0.1 equals driver-side best-quality selection", SlowTest) {
    val engine = Dedup.dedupCanonical(spark, sfBig)
      .select($"cluster_rep", $"n_members", $"canonical_doc", $"best_quality")
      .as[(Long, Long, Long, Double)].collect().toSet
    val quality = Tables.documents(spark, sfBig)
      .select($"doc_id", TF.qualityScore($"text").as("q"))
      .as[(Long, Double)].collect().toMap
    val expected = bruteLabels.groupBy(_._2).map { case (rep, m) =>
      val members = m.keys.toSeq
      // max quality, ties to the smaller doc_id — same order as the max_by struct
      val best = members.minBy(id => (-quality(id), id))
      (rep, members.size.toLong, best, members.map(quality).max)
    }.toSet
    assert(engine == expected,
      s"engine-only=${(engine -- expected).take(5)} driver-only=${(expected -- engine).take(5)}")
  }

  test("dedup_lines at sf0.1 equals a driver-side line-df recompute", SlowTest) {
    val engine = graft.queries.Dedup.dedupLines(spark, sfBig)
      .as[(Long, Long, Long, String)].collect().toSet
    val raw = Tables.documents(spark, sfBig)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val df = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[Long]]
    raw.foreach { case (id, text) =>
      text.split("\n", -1).filter(_.trim.nonEmpty)
        .foreach(l => df.getOrElseUpdate(l, scala.collection.mutable.Set.empty) += id)
    }
    val boiler = df.collect { case (l, docs) if docs.size >= 2 => l }.toSet
    val expected = raw.map { case (id, text) =>
      val lines = text.split("\n", -1)
      val kept = lines.filterNot(boiler)
      (id, lines.length.toLong, kept.length.toLong, kept.mkString("\n"))
    }.toSet
    assert(engine == expected,
      s"engine-only=${(engine -- expected).take(3)} driver-only=${(expected -- engine).take(3)}")
  }

  test("prep_negative_pairs at sf0.1 equals a driver-side draw + Jaccard recompute", SlowTest) {
    val engine = graft.queries.DataPipeline.negativePairs(spark, sfBig)
      .as[(Long, Long, Long, Double)].collect().toSet
    val sh = Tables.documents(spark, sfBig)
      .select($"doc_id", VectorFunctions.shingleHashSet($"text", 3).as("sh"))
      .as[(Long, Seq[Long])].collect().toMap
      .filter(_._2.nonEmpty).view.mapValues(_.toSet).toMap
    val n = sh.keys.max + 1
    val expected = (for {
      a <- sh.keys.toSeq; slot <- 1L to 2L
      md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"neg:$a:$slot".getBytes("UTF-8"))
      h = java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
      neg = (a + h % (n - 1) + 1) % n
      if sh.contains(neg)
      jac = sh(a).intersect(sh(neg)).size.toDouble / sh(a).union(sh(neg)).size.toDouble
      if jac < 0.5
    } yield (a, slot, neg, jac)).toSet
    assert(engine == expected,
      s"engine-only=${(engine -- expected).take(3)} driver-only=${(expected -- engine).take(3)}")
  }

  test("text_lm_score at sf0.1 equals a driver-side smoothed-LM recompute", SlowTest) {
    val engine = graft.queries.TextAnalysis.textLmScore(spark, sfBig)
      .as[(Long, Long, Double)].collect()
    def toksOf(t: String): Array[String] = {
      val n = t.toLowerCase.replaceAll("[ \t\n\f\r]+", " ").trim
      if (n.isEmpty) Array.empty else n.split(' ')
    }
    def isTrain(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      md.take(1).map("%02x".format(_)).mkString < "cc"
    }
    val raw = Tables.documents(spark, sfBig)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => (id, toksOf(t)) }.filter(_._2.length >= 2)
    val cu = scala.collection.mutable.Map.empty[String, Long]
    val cb = scala.collection.mutable.Map.empty[(String, String), Long]
    raw.filter(d => isTrain(d._1)).foreach { case (_, ts) =>
      ts.foreach(w => cu(w) = cu.getOrElse(w, 0L) + 1)
      ts.sliding(2).foreach(p => if (p.length == 2) {
        val k = (p(0), p(1)); cb(k) = cb.getOrElse(k, 0L) + 1
      })
    }
    val v = cu.size.toLong
    val expected = raw.map { case (id, ts) =>
      val terms = ts.sliding(2).filter(_.length == 2).map { p =>
        val num = (cb.getOrElse((p(0), p(1)), 0L) + 1).toDouble
        val den = (cu.getOrElse(p(0), 0L) + v).toDouble
        math.log(num / den) / math.log(2.0)
      }.toSeq
      id -> ((terms.length.toLong, terms.sum / terms.length))
    }.toMap
    assert(engine.length == expected.size)
    engine.foreach { case (id, n, score) =>
      val (en, es) = expected(id)
      assert(n == en, s"doc $id bigram count")
      // engine output passed round(_, 6); driver sum order differs by ulps
      assert(math.abs(score - es) < 5.1e-7, s"doc $id: $score vs $es")
    }
  }

  test("prep_domain_cap at sf0.1 equals a driver-side running-sum recompute", SlowTest) {
    val budget = 1300L
    val engine = graft.queries.DataPipeline.domainCap(spark, sfBig, budget)
      .as[(Long, String, Long, Long)].collect().toSet
    val toks = Tables.documents(spark, sfBig)
      .select($"doc_id", $"source", TF.textScanStats($"text").getItem(0).cast("long"))
      .as[(Long, String, Long)].collect()
    val expected = toks.groupBy(_._2).flatMap { case (src, docs) =>
      val ordered = docs.map { case (id, _, t) =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"cap:$id:$src".getBytes("UTF-8"))
        (md.map("%02x".format(_)).mkString, id, t)
      }.sortBy(d => (d._1, d._2))
      var cum = 0L
      ordered.toSeq.flatMap { case (_, id, t) =>
        val r = if (cum < budget) Some((id, src, t, cum)) else None
        cum += t
        r
      }
    }.toSet
    assert(engine == expected,
      s"engine-only=${(engine -- expected).take(3)} driver-only=${(expected -- engine).take(3)}")
  }

  test("prep_token_budget at sf0.1 equals a driver-side global running sum", SlowTest) {
    val budget = 8000L
    val engine = graft.queries.DataPipeline.tokenBudget(spark, sfBig, budget)
      .as[(Long, Double, Long, Long)].collect().toSet
    // independent path: collect (quality, tokens), ONE driver-side sort +
    // running sum — no bins, no windows, no broadcast
    val docs = Tables.documents(spark, sfBig)
      .select($"doc_id", TF.qualityScore($"text").as("q"),
        TF.textScanStats($"text").getItem(0).cast("long").as("t"))
      .as[(Long, Double, Long)].collect()
      .sortBy { case (id, q, _) => (-q, id) }
    var cum = 0L
    val expected = docs.flatMap { case (id, q, t) =>
      val r = if (cum < budget) Some((id, q, t, cum)) else None
      cum += t
      r
    }.toSet
    assert(engine == expected,
      s"engine-only=${(engine -- expected).take(3)} driver-only=${(expected -- engine).take(3)}")
  }

  test("events_anomaly at sf0.1 equals an exact-rational driver recompute", SlowTest) {
    // independent arithmetic: BigInt, so even a boundary day exactly AT 2σ
    // is decided identically (the engine's BIGINT inequality is exact too —
    // this differential would catch an accidental drift to float stddev)
    val daily = Tables.events(spark, sfBig)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("cnt"))
      .as[(String, java.sql.Date, Long)].collect()
    val expected = daily.groupBy(_._1).iterator.flatMap { case (_, rows) =>
      val n = BigInt(rows.length)
      val s = rows.map(r => BigInt(r._3)).sum
      val q = rows.map(r => BigInt(r._3) * BigInt(r._3)).sum
      rows.filter { r =>
        val dev = n * BigInt(r._3) - s
        dev * dev > 4 * (n * q - s * s)
      }.map(r => (r._1, r._2.toString, r._3))
    }.toSet
    val got = graft.queries.EventsQueries.eventsAnomaly(spark, sfBig).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expected, s"only=${got -- expected} missing=${expected -- got}")
    assert(got.nonEmpty, "sf0.1 must surface at least the partial boundary days")
  }

  test("events_histogram at sf0.1 equals a driver-side bucket recompute", SlowTest) {
    // the float-boundary class this pins: a value landing exactly ON a
    // bucket edge at 10× the oracle corpus must bucket identically in the
    // engine's codegen'd floor((v-lo)/w) and an independent driver fold —
    // same IEEE ops, same clamp, zero-filled spine, HALF_UP display edges
    val vals = Tables.events(spark, sfBig)
      .select($"event_type", $"value").as[(String, Double)].collect()
    val nb = 10
    def r6(x: Double): Double =
      BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = vals.groupBy(_._1).flatMap { case (et, rows) =>
      val vs = rows.map(_._2)
      val lo = vs.min
      val w = math.max((vs.max - lo) / nb, 1e-12)
      val counts = vs.groupBy { v =>
        math.min(math.max(math.floor((v - lo) / w), 0.0), (nb - 1).toDouble).toLong
      }.view.mapValues(_.length.toLong).toMap
      (0L until nb.toLong).map { b =>
        (et, b, r6(lo + b * w), r6(lo + (b + 1) * w), counts.getOrElse(b, 0L))
      }
    }.toSet
    val got = graft.queries.EventsQueries.eventsHistogram(spark, sfBig)
      .as[(String, Long, Double, Double, Long)].collect().toSet
    assert(got == expected,
      s"only=${(got -- expected).take(5)} missing=${(expected -- got).take(5)}")
    // (all buckets are populated at this volume — the empty-spine face is
    // exercised by the sf0.01 oracle row and the FunnelRetentionSpec fixture)
    assert(got.nonEmpty)
  }

  test("text_novelty at sf0.1 equals a driver-side string-gram recompute", SlowTest) {
    // independent path end to end: STRING 8-grams built by a driver fold
    // (no hashed-shingle kernel, no shuffled min-agg), so this catches both
    // a gram-hash collision merging posting lists at 10× the oracle corpus
    // and any first-occurrence attribution drift in the join shape
    val texts = Tables.documents(spark, sfBig)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def grams(text: String): Set[String] = {
      val norm = text.toLowerCase.replaceAll("\\s+", " ").trim
      val toks = if (norm.isEmpty) Array.empty[String] else norm.split(' ')
      if (toks.length < 8) Set.empty
      else toks.sliding(8).map(_.mkString(" ")).toSet
    }
    val docGrams = texts.map { case (id, t) => id -> grams(t) }
    val first = scala.collection.mutable.Map.empty[String, Long]
    docGrams.sortBy(_._1).foreach { case (id, gs) =>
      gs.foreach(g => if (!first.contains(g) || first(g) > id) first(g) = id)
    }
    val expected = docGrams.collect { case (id, gs) if gs.nonEmpty =>
      val novel = gs.count(first(_) == id)
      (id, gs.size.toLong, novel.toLong,
        BigDecimal(novel.toDouble / gs.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = graft.queries.TextAnalysis.textNovelty(spark, sfBig)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == expected,
      s"only=${(got -- expected).take(5)} missing=${(expected -- got).take(5)}")
  }
}
