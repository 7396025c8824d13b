package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cost-based optimization: with ANALYZE'd table statistics and
  * `spark.sql.cbo.joinReorder`, Catalyst abandons the user's syntactic
  * join order for the cost-optimal one — the 100 TB knob that makes a
  * badly-written three-way join plan like the well-written one. The repo's
  * own queries hand-order their joins (dims broadcast, facts last), but a
  * real deployment ingesting user SQL relies on exactly this machinery,
  * so the spec pins that the engine's tables + stats actually enable it.
  */
class CboSpec extends AnyFunSuite {
  import TestSpark._

  test("with stats, join reorder pulls the selective dimension ahead of the fact table") {
    graft.sources.Tables.lineitem(spark, sf).write.mode("overwrite").saveAsTable("cbo_lineitem")
    graft.sources.Tables.orders(spark, sf).write.mode("overwrite").saveAsTable("cbo_orders")
    // a sharply selective "dimension": 20 customers
    graft.sources.Tables.customer(spark, sf).limit(20)
      .write.mode("overwrite").saveAsTable("cbo_customer")
    try {
      Seq("cbo_lineitem", "cbo_orders", "cbo_customer").foreach { t =>
        spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
      }
      // written WORST-first: the fact table leads, the selective dim trails
      val q =
        """SELECT c.c_name, count(*) AS n
          |FROM cbo_lineitem l
          |JOIN cbo_orders o ON o.o_orderkey = l.l_orderkey
          |JOIN cbo_customer c ON c.c_custkey = o.o_custkey
          |GROUP BY c.c_name""".stripMargin
      def joinOrder(): Seq[String] = {
        val p = spark.sql(q).queryExecution.optimizedPlan.toString
        "cbo_[a-z]+".r.findAllIn(p).toSeq.distinct
      }
      spark.conf.set("spark.sql.cbo.enabled", "false")
      val naive = joinOrder()
      assert(naive == Seq("cbo_lineitem", "cbo_orders", "cbo_customer"),
        s"without CBO the syntactic order must survive: $naive")

      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val cbo = joinOrder()
      assert(cbo != naive, "stats + joinReorder must change the order")
      assert(cbo.indexOf("cbo_customer") < cbo.indexOf("cbo_lineitem"),
        s"the 20-row dim must join before the fact table: $cbo")

      // and the reordered plan still computes the same result
      val rows = spark.sql(q).collect().map(r => (r.getString(0), r.getLong(1))).toMap
      spark.conf.set("spark.sql.cbo.enabled", "false")
      val naiveRows = spark.sql(q).collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(rows == naiveRows, "reorder must not change semantics")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      Seq("cbo_lineitem", "cbo_orders", "cbo_customer").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
      }
    }
  }
}
