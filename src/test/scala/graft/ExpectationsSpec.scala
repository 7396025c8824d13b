package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Expectations
import graft.sources.Tables

class ExpectationsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def reportOf(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Option[Long])] =
    df.collect().map { r =>
      r.getString(0) -> ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long])))
    }.toMap

  test("real-corpus report equals a driver-side recompute of every rule") {
    val df = Expectations.check(spark, sf)
    val got = reportOf(df)
    assert(got.size == 10, s"ten rules expected, got ${got.keySet}")

    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text", $"lang", $"n_chars")
      .as[(Long, String, String, Long)].collect()
    val li = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_quantity", $"l_shipdate".cast("timestamp"))
      .as[(Long, Double, Timestamp)].collect()
    val cutoff = Timestamp.valueOf("2001-01-01 00:00:00")

    def expect(viol: Seq[Long]): (Long, Option[Long]) =
      (viol.length.toLong, viol.minOption)

    assert(got("docs_text_nonempty") ==
      expect(docs.filter(d => d._2 == null || d._2.isEmpty).map(_._1).toSeq))
    assert(got("docs_nchars_consistent") ==
      expect(docs.filter(d => d._4 != d._2.length.toLong).map(_._1).toSeq))
    assert(got("docs_min_length_200") ==
      expect(docs.filter(_._2.length < 200).map(_._1).toSeq))
    assert(got("docs_lang_allowed") ==
      expect(docs.filter(d => !Set("en", "zh", "es", "de", "fr")(d._3)).map(_._1).toSeq))
    assert(got("lineitem_qty_range") ==
      expect(li.filter(l => l._2 < 1 || l._2 > 50).map(_._1).toSeq))
    assert(got("lineitem_ship_before_2001") ==
      expect(li.filter(l => !l._3.before(cutoff)).map(_._1).toSeq))
    // clean-by-construction rules must report zero with no key
    Seq("docs_docid_unique", "orders_price_positive",
      "orders_custkey_fk", "lineitem_orderkey_fk").foreach { r =>
      assert(got(r) == ((0L, None)), s"$r expected clean, got ${got(r)}")
    }
    // the freshness rule must actually fire on this corpus — a report that
    // cannot show nonzero accounting proves nothing
    assert(got("lineitem_ship_before_2001")._1 > 0)
  }

  test("every rule fires on an injected-corruption fixture with exact counts and min keys") {
    val docs = Seq(
      (1L, "x".* (300), "en", 300L),
      (1L, "x".* (300), "en", 300L),   // dup doc_id
      (2L, "", "en", 0L),              // empty text (also <200)
      (3L, "y".* (250), "xx", 250L),   // bad lang
      (4L, "z".* (250), "en", 999L))   // n_chars mismatch
      .toDF("doc_id", "text", "lang", "n_chars")
    val orders = Seq(
      (10L, 1L, -5.0, Timestamp.valueOf("1996-01-01 00:00:00")),
      (11L, 77L, 100.0, Timestamp.valueOf("1996-01-01 00:00:00")))  // orphan custkey
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val lineitem = Seq(
      (10L, 99.0, Timestamp.valueOf("1996-06-01 00:00:00")),   // qty out of range
      (10L, 5.0, Timestamp.valueOf("2001-06-01 00:00:00")),    // stale shipment
      (42L, 5.0, Timestamp.valueOf("1996-06-01 00:00:00")))    // orphan orderkey
      .toDF("l_orderkey", "l_quantity", "l_shipdate")
    val customer = Seq(Tuple1(1L)).toDF("c_custkey")

    val got = reportOf(Expectations.checkTables(docs, orders, lineitem, customer))
    assert(got("docs_docid_unique") == ((1L, Some(1L))))
    assert(got("docs_text_nonempty") == ((1L, Some(2L))))
    assert(got("docs_min_length_200") == ((1L, Some(2L))))
    assert(got("docs_lang_allowed") == ((1L, Some(3L))))
    assert(got("docs_nchars_consistent") == ((1L, Some(4L))))  // only doc 4 (999 vs 250)
    assert(got("orders_price_positive") == ((1L, Some(10L))))
    assert(got("orders_custkey_fk") == ((1L, Some(11L))))
    assert(got("lineitem_qty_range") == ((1L, Some(10L))))
    assert(got("lineitem_ship_before_2001") == ((1L, Some(10L))))
    assert(got("lineitem_orderkey_fk") == ((1L, Some(42L))))
  }

  test("rules fold into one scan per table family (plan pin)") {
    val df = Expectations.check(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    def scans(t: String): Int = (t + "\\.parquet").r.findAllIn(plan).size
    // naive = one scan per rule (5 documents rules); folded = row-rules scan
    // + the uniqueness groupBy scan
    assert(scans("documents") == 2, s"documents scans:\n$plan")
    // row-rules scan + the FK child scan
    assert(scans("lineitem") == 2, s"lineitem scans:\n$plan")
    // row-rules scan + FK outer scan + FK parent scan
    assert(scans("orders") == 3, s"orders scans:\n$plan")
    assert(scans("customer") == 1, s"customer scans:\n$plan")
  }
}
