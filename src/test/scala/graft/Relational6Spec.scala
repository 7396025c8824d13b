package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Relational6
import graft.sources.Tables

class Relational6Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("q58 equals the naive correlated recompute; one fact scan, no subquery") {
    val df = Relational6.q58SmallQtyRevenue(spark, sf)
    val rows = df.select($"p_brand", $"n_small", $"avg_yearly")
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty, "q58 must find small-quantity lines")

    // naive driver recompute: per-part avg threshold applied row-at-a-time,
    // exact integer arithmetic (quantities are integral; prices in cents)
    val parts = Tables.part(spark, sf)
      .filter($"p_brand".isin("Brand#12", "Brand#23"))
      .select($"p_partkey", $"p_brand").as[(Long, String)].collect().toMap
    val li = Tables.lineitem(spark, sf)
      .select($"l_partkey", $"l_quantity", $"l_extendedprice")
      .as[(Long, Double, Double)].collect()
      .filter(r => parts.contains(r._1))
    val byPart = li.groupBy(_._1)
    val expect = li
      .filter { case (pk, q, _) =>
        val g = byPart(pk)
        // 5 * q * cnt < sum_qty  <=>  q < 0.2 * avg
        5L * q.toLong * g.length < g.map(_._2.toLong).sum
      }
      .groupBy(r => parts(r._1))
      .map { case (brand, rs) =>
        brand -> ((rs.length.toLong, rs.map(r => math.round(r._3 * 100)).sum))
      }
    val got = rows.map(r => r._1 -> ((r._2, math.round(r._3 * 7.0 * 100)))).toMap
    assert(got == expect.toMap, s"got=$got expect=$expect")

    // decorrelation shape: ONE lineitem scan through one window — never a
    // per-row subquery, a self-join second scan, or a cartesian
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("lineitem\\.parquet".r.findAllIn(plan).size == 1,
      s"exactly one lineitem scan expected:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"part dim must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("Subquery"),
      s"no subquery / cartesian:\n$plan")
  }

  test("q59 equals the grouped-HAVING recompute; detail joins broadcast the tail") {
    val df = Relational6.q59BigOrders(spark, sf)
    df.collect()
    val got = df.select($"o_orderkey", $"total_qty", $"c_custkey")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    val li = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity")
      .as[(Long, Double)].collect()
    val bigOrders = li.groupBy(_._1).view
      .mapValues(_.map(_._2.toLong).sum).filter(_._2 > 170).toMap
    val orderCust = Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey")
      .as[(Long, Long)].collect().toMap
    val expect = bigOrders.map { case (ok, q) => ok -> ((q, orderCust(ok))) }
    assert(got == expect, s"${got.size} got vs ${expect.size} expect")

    // the >170 tail is tiny relative to the detail tables: AQE must turn
    // both detail joins into broadcasts — a sort-merge join here means the
    // full orders/customer tables shuffled against a filtered aggregate
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("SortMergeJoin"),
      s"detail joins must broadcast the filtered tail:\n$plan")
  }

  test("q60 keeps zero-order customers; ON-clause filter never drops rows") {
    val df = Relational6.q60CustDist(spark, sf)
    val rows = df.as[(Long, Long)].collect()
    assert(rows.nonEmpty)

    val cust = Tables.customer(spark, sf).select($"c_custkey").as[Long].collect()
    val ords = Tables.orders(spark, sf)
      .filter($"o_orderpriority" =!= "1-URGENT")
      .select($"o_custkey").as[Long].collect()
    val perCust = ords.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expect = cust.map(c => perCust.getOrElse(c, 0L))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows.toMap == expect, "distribution must match the recompute")
    // the histogram MUST include the customers with zero non-urgent orders
    // (the whole point of ON-clause vs WHERE filtering); the generator
    // leaves some customers orderless at every sf
    assert(rows.toMap.contains(0L) == expect.contains(0L))
    // total across the distribution is every customer exactly once
    assert(rows.map(_._2).sum == cust.length.toLong)
  }

  test("q61 bitmap distinct equals COUNT(DISTINCT) with no Expand in the plan") {
    val df = Relational6.q61BitmapDistinct(spark, sf)
    val got = df.as[(String, Long)].collect().toMap
    val expect = Tables.events(spark, sf)
      .groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == expect, s"got=$got expect=$expect")
    // the scale claim: bitmap aggregation avoids the two-phase distinct
    // rewrite entirely — no Expand node, and the first aggregate's shuffle
    // key is (type, bucket), carrying 4 KB bitmaps instead of raw ids
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"bitmap path must not Expand:\n$plan")
  }

  test("q62 folds match a driver-side recompute bitwise; single-scan plan") {
    val df = Relational6.q62HigherOrder(spark, sf)
    val rows = df.as[(Long, Int, Int, Double, Double)].collect()
    assert(rows.nonEmpty)

    val vecs = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toMap
    rows.foreach { case (id, nDims, nPos, norm2, dotRev) =>
      val v = vecs(id).map(_.toDouble)
      assert(nDims == v.length && nPos == v.count(_ > 0d))
      // same left-fold order as the engine lambda: bitwise equality expected
      assert(norm2 == v.foldLeft(0d)((a, x) => a + x * x),
        s"norm2 mismatch for vec $id")
      val rev = v.reverse
      assert(dotRev == v.indices.map(i => v(i) * rev(i)).foldLeft(0d)(_ + _),
        s"dot_rev mismatch for vec $id")
    }
    // per-row lambdas: the only exchange in the plan is the display sort
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("Exchange".r.findAllIn(plan).size <= 1,
      s"higher-order ops must not shuffle (display sort only):\n$plan")
  }

  test("q64 equals the flat recompute; the disjunction is torn apart into BOTH scans") {
    val df = Relational6.q64DisjunctiveTiers(spark, sf)
    val rows = df.as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)

    val parts = Tables.part(spark, sf).select($"p_partkey", $"p_brand", $"p_size")
      .as[(Long, String, Int)].collect().map(p => p._1 -> ((p._2, p._3))).toMap
    val li = Tables.lineitem(spark, sf)
      .select($"l_partkey", $"l_quantity", $"l_extendedprice", $"l_discount")
      .as[(Long, Double, Double, Double)].collect()
    def inTier(b: String, sz: Int, q: Double) =
      (b == "Brand#12" && sz >= 1 && sz <= 15 && q >= 1 && q <= 11) ||
      (b == "Brand#23" && sz >= 16 && sz <= 30 && q >= 10 && q <= 20) ||
      (b == "Brand#5" && sz >= 31 && sz <= 50 && q >= 20 && q <= 30)
    val expect = li.flatMap { case (pk, q, price, disc) =>
      parts.get(pk).collect { case (b, sz) if inTier(b, sz, q) =>
        (b, math.round(price * 100) * (100L - math.round(disc * 100)))
      }
    }.groupBy(_._1).view.mapValues(xs => (xs.length.toLong, xs.map(_._2).sum)).toMap
    val got = rows.map(r => r._1 -> ((r._2, math.round(r._3 * 10000)))).toMap
    assert(got == expect, s"got=$got expect=$expect")

    // CNF extraction must push a table-local Or into EACH scan: the
    // lineitem reader prunes on the quantity-range union, the part reader
    // on the brand/size union — not a post-join residual-only plan
    df.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.catalyst.expressions.Or
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec => allScans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(allScans)
    }
    val scans = allScans(df.queryExecution.executedPlan)
    def hasOrOn(col: String) = scans.exists(s =>
      s.schema.fieldNames.contains(col) && s.dataFilters.exists {
        case o: Or => o.references.exists(_.name == col)
        case _ => false
      })
    assert(hasOrOn("l_quantity"),
      s"lineitem scan must receive the quantity-union Or:\n${scans.map(_.dataFilters)}")
    assert(hasOrOn("p_brand"),
      s"part scan must receive the brand/size-union Or:\n${scans.map(_.dataFilters)}")
  }

  test("q65 map lambdas equal the relational recompute, exact ppm cut") {
    val df = Relational6.q65MapFunctions(spark, sf)
    val got = df.as[(Long, String, Int, Long, Long)].collect()
    assert(got.nonEmpty)

    val ev = Tables.events(spark, sf)
      .select($"user_id", $"event_type").as[(Long, String)].collect()
    val perUser = ev.groupBy(_._1).view.mapValues { xs =>
      xs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    }.toMap
    val expect = perUser.toSeq.flatMap { case (u, counts) =>
      val total = counts.values.sum
      counts.toSeq.collect {
        case (et, c) if c * 1000000L / total >= 200000L =>
          (u, et, counts.size, total, c * 1000000L / total)
      }
    }.sortBy(r => (r._1, r._2))
    assert(got.toSeq == expect, s"${got.length} got vs ${expect.length} expect")
    // a user's surviving shares can never exceed 5 entries (ppm >= 200000
    // each, summing to <= 1e6 after floor division)
    got.groupBy(_._1).foreach { case (u, rs) =>
      assert(rs.length <= 5, s"user $u kept ${rs.length} dominant types")
      assert(rs.map(_._5).sum <= 1000000L)
    }
  }

  test("q66 regex aggregates equal a driver-side java.util.regex recompute") {
    val df = Relational6.q66RegexFamily(spark, sf)
    val got = df.as[(String, Long, Long, Long, Option[Long], String)].collect()
    assert(got.nonEmpty)

    val ev = Tables.events(spark, sf)
      .select($"event_type", $"props").as[(String, String)].collect()
    val digits = "[0-9]+".r
    val kPat = "\"k\": ([0-9]+)".r
    val expect = ev.groupBy(_._1).view.mapValues { xs =>
      val props = xs.map(_._2)
      (props.length.toLong,
        props.count(p => digits.findFirstIn(p).isDefined).toLong,
        props.map(p => digits.findAllIn(p).size.toLong).sum,
        props.flatMap(p => kPat.findFirstMatchIn(p).map(_.group(1).toLong))
          .reduceOption(_ max _),
        props.map(p => digits.replaceAllIn(p, "N")).min)
    }.toMap
    got.foreach { case (et, n, nd, runs, maxK, tpl) =>
      assert((n, nd, runs, maxK, tpl) == expect(et), s"type $et")
    }
  }

  test("q67 name-aligned union NULL-fills drift; positional union would mis-bind") {
    val df = Relational6.q67SchemaDrift(spark, sf)
    val got = df.as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)

    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"n_chars", length($"text").cast("long"))
      .as[(Long, String, Long, Long)].collect()
    val expect = docs.groupBy(_._2).view.mapValues { ds =>
      val missing = ds.count(_._1 % 3 == 0).toLong
      // old-snapshot rows repair n_chars from text length
      val chars = ds.map(d => if (d._1 % 3 == 0) d._4 else d._3).sum
      (ds.length.toLong, missing, chars)
    }.toMap
    got.foreach { case (src, n, miss, chars) =>
      assert((n, miss, chars) == expect(src), s"source $src")
    }
    // the failure mode q67 exists to avoid: positional union of the
    // 3-column snapshot is rejected outright (arity), not silently bound
    val oldSnap = Tables.documents(spark, sf).filter($"doc_id" % 3 === 0)
      .select($"doc_id", $"text", $"source")
    intercept[org.apache.spark.sql.AnalysisException] {
      oldSnap.union(Tables.documents(spark, sf)).collect()
    }
  }

  test("q68 top-20 equals the exact-cents recompute; heap top-k, no global sort") {
    val df = Relational6.q68TopReturns(spark, sf)
    val got = df.select($"c_custkey", $"revenue", $"n_return_lines")
      .as[(Long, Double, Long)].collect()
    assert(got.length == 20)

    val oc = Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey")
      .as[(Long, Long)].collect().toMap
    val rev = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    Tables.lineitem(spark, sf)
      .filter($"l_returnflag" === "R")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      .as[(Long, Double, Double)].collect()
      .foreach { case (ok, p, d) =>
        val cust = oc(ok)
        val cents = math.round(p * 100) * (100L - math.round(d * 100))
        val (r, n) = rev.getOrElse(cust, (0L, 0L))
        rev(cust) = (r + cents, n + 1)
      }
    val expect = rev.toSeq.sortBy { case (c, (r, _)) => (-r, c) }.take(20)
      .map { case (c, (r, n)) => (c, r, n) }
    assert(got.map(g => (g._1, math.round(g._2 * 10000), g._3)).toSeq == expect)

    // the LIMIT must lower to a bounded heap (TakeOrderedAndProject), not a
    // global range-partitioned sort of the aggregate output
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be a bounded heap:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"no global sort exchange for a top-20:\n$plan")
  }

  test("q63 collated grouping merges case classes exactly like GROUP BY lower()") {
    val df = Relational6.q63Collation(spark, sf)
    val got = df.as[(String, Long, Long)].collect()

    val expect = Tables.documents(spark, sf)
      .select($"doc_id", $"n_chars",
        when($"doc_id" % 2 === 1, upper($"source")).otherwise($"source")
          .as("m"))
      .groupBy(lower($"m").as("k"))
      .agg(count(lit(1)).as("n"), sum($"n_chars").as("t"))
      .select(upper($"k"), $"n", $"t")
      .as[(String, Long, Long)].collect()
    assert(got.sortBy(_._1).toSeq == expect.sortBy(_._1).toSeq)
    // the collation really merged both spellings into one group per source
    val nSources = Tables.documents(spark, sf)
      .select(countDistinct($"source")).as[Long].head()
    assert(got.length.toLong == nSources,
      s"expected one group per source, got ${got.length} vs $nSources")
  }
}
