package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SimilaritySearch

/** Pins sim_recall_report (rows-only): the report's numbers must equal a
  * recompute from the constituent frames, and the means must clear the
  * same floors the per-method differential specs assert. */
class SimRecallReportSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("report equals a recomputed overlap@K; floors hold") {
    val report = SimilaritySearch.simRecallReport(spark, sf)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(report.keySet == Set("lsh", "ivf", "ivfpq"))

    val brute = SimilaritySearch.simBruteforceTopk(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val k = brute.values.head.size
    def recompute(df: org.apache.spark.sql.DataFrame): (Long, Double, Double) = {
      val ann = df.select($"query_id", $"neighbor_id").as[(Long, Long)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val recalls = brute.keys.toSeq.sorted
        .map(q => ann.getOrElse(q, Set.empty).count(brute(q)).toDouble / k)
      (recalls.length.toLong,
        math.rint(recalls.sum / recalls.length * 10000) / 10000,
        math.rint(recalls.min * 10000) / 10000)
    }
    val expected = Map(
      "lsh" -> recompute(SimilaritySearch.simLshTopk(spark, sf)),
      "ivf" -> recompute(SimilaritySearch.simIvfTopk(spark, sf)),
      "ivfpq" -> recompute(SimilaritySearch.simIvfPqTopk(spark, sf)))
    expected.foreach { case (m, e) =>
      assert(report(m) == e, s"method $m: got ${report(m)} expect $e")
    }
    // the same floors the per-method differential specs assert
    assert(report("lsh")._2 >= SimilaritySearch.LshSpecRecallFloor)
    assert(report("ivf")._2 >= SimilaritySearch.IvfSpecRecallFloor)
  }
}
