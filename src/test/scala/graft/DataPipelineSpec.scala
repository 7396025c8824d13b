package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions => TF}
import graft.queries.DataPipeline
import graft.sources.Tables

/** Properties of the training-data-prep operators that the DuckDB oracle
  * cannot express (determinism across runs, structural invariants of packing
  * and chunking) or that deserve a sharper pin than a hash match. */
class DataPipelineSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("split assignment is deterministic and roughly 80/10/10") {
    val a = DataPipeline.splitAssign(spark, sf).collect()
    val b = DataPipeline.splitAssign(spark, sf).collect()
    assert(a.sameElements(b), "split assignment changed between runs")
    val counts = a.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    val frac = counts("train").toDouble / a.length
    assert(frac > 0.6 && frac < 0.95, s"train fraction $frac out of range")
  }

  test("mixture sampling keeps rate-1.0 sources whole and is deterministic") {
    val kept = DataPipeline.mixWeighted(spark, sf)
      .groupBy($"source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val sizes = Tables.documents(spark, sf)
      .groupBy($"source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    DataPipeline.mixRates.foreach { case (src, rate) =>
      if (rate >= 1.0)
        assert(kept.getOrElse(src, 0L) == sizes(src), s"$src lost docs at rate 1.0")
      else
        assert(kept.getOrElse(src, 0L) <= sizes(src))
    }
    // downsampled tiers keep fewer docs in aggregate than full tiers
    def tierTotal(r: Double) = DataPipeline.mixRates.collect {
      case (s, rate) if rate == r => kept.getOrElse(s, 0L)
    }.sum
    assert(tierTotal(0.1) < tierTotal(1.0))
    val again = DataPipeline.mixWeighted(spark, sf).count()
    assert(again == kept.values.sum)
  }

  test("sequence packs are contiguous doc ranges covering every token") {
    val packs = DataPipeline.packSequences(spark, sf)
      .select($"source", $"pack_id", $"n_docs", $"total_tokens",
        $"first_doc", $"last_doc")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val allTokens = Tables.documents(spark, sf)
      .select(sum(TF.tokenCount($"text").cast("long"))).as[Long].head()
    assert(packs.map(_._4).sum == allTokens, "packs do not cover all tokens")
    packs.groupBy(_._1).foreach { case (src, ps) =>
      val sorted = ps.sortBy(_._2)
      assert(sorted.head._2 == 0L, s"$src pack ids do not start at 0")
      assert(sorted.map(_._2).toSeq == (0L until sorted.length).toSeq,
        s"$src pack ids not consecutive")
      sorted.sliding(2).foreach {
        case Array(p, q) =>
          assert(p._6 < q._5, s"$src packs ${p._2},${q._2} overlap in doc range")
        case _ => ()
      }
    }
  }

  test("even-indexed chunks reconstruct the normalized document exactly") {
    val chunks = DataPipeline.textChunks(spark, sf) // size 32, stride 16
    val rebuilt = chunks.filter($"chunk_id" % 2 === 0)
      .groupBy($"doc_id")
      .agg(array_join(array_sort(collect_list(struct($"chunk_id", $"chunk")))
        .getField("chunk"), " ").as("rebuilt"),
        sum($"n_chunk_tokens").as("n_tokens_rebuilt"))
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", TF.normalizeText($"text").as("norm"),
        TF.tokenCount($"text").cast("long").as("n_tokens"))
    val joined = rebuilt.join(docs, "doc_id")
    assert(joined.filter($"rebuilt" =!= $"norm").count() == 0,
      "even-chunk concatenation diverged from normalized text")
    assert(joined.filter($"n_tokens_rebuilt" =!= $"n_tokens").count() == 0)
    // chunk count per doc = ceil(n_tokens / stride)
    val nChunks = chunks.groupBy($"doc_id").agg(count(lit(1)).as("n"))
      .join(docs, "doc_id")
      .filter($"n" =!= ceil($"n_tokens" / 16.0).cast("long"))
    assert(nChunks.count() == 0, "chunk count != ceil(n_tokens/stride)")
  }

  test("redaction leaves no digits behind") {
    val remaining = DataPipeline.textRedact(spark, sf)
      .filter($"redacted".rlike("[0-9]")).count()
    assert(remaining == 0)
  }

  test("outlier filter keeps exactly the rows above an independent p99 recompute") {
    val res = DataPipeline.outlierFilter(spark, sf)
      .select($"l_returnflag", $"l_orderkey", $"l_linenumber")
      .as[(String, Long, Long)].collect().toSet
    val rows = Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_orderkey", $"l_linenumber".cast("long"),
        $"l_extendedprice")
      .as[(String, Long, Long, Double)].collect()
    // independent exact p99 (linear interpolation, the percentile/
    // quantile_cont definition) per group
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (_, grp) =>
      val sorted = grp.map(_._4).sorted
      val pos = 0.99 * (sorted.length - 1)
      val (lo, hi) = (sorted(pos.toInt), sorted(math.ceil(pos).toInt))
      val p99 = lo + (pos - pos.toInt) * (hi - lo)
      grp.filter(_._4 > p99).map(r => (r._1, r._2, r._3)).toSeq
    }.toSet
    assert(res == expected,
      s"missing=${(expected -- res).take(5)} extra=${(res -- expected).take(5)}")
    assert(res.nonEmpty && res.size < rows.length / 50,
      s"p99 filter kept ${res.size} of ${rows.length}")
  }
}
