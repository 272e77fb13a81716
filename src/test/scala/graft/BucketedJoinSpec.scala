package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Co-located joins via bucketing — the pre-partitioning story for
  * repeated large-table joins at 100 TB: bucket both fact tables on
  * the join key once at write time, and every subsequent join on that
  * key runs with ZERO shuffle exchanges.
  */
class BucketedJoinSpec extends AnyFunSuite with Matchers {
  import TestSpark.{spark, sf0001}

  test("orders ⋈ lineitem on bucketed tables has no shuffle exchange") {
    // disable auto-broadcast: at test scale AQE would broadcast the tiny
    // tables, hiding the bucketed sort-merge path this spec asserts
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try bucketedJoinBody()
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
  }

  private def bucketedJoinBody(): Unit = {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.orders(spark, sf0001).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    Tables.lineitem(spark, sf0001).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    joined.queryExecution.toRdd.count() // finalize AQE
    val plan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    // the join itself must not introduce an exchange: bucket layout IS
    // the partitioning (only the final aggregation may shuffle)
    val joinSection = plan.split("HashAggregate").last
    joinSection should include("SortMergeJoin")
    joinSection should not include "Exchange hashpartitioning"

    // and it returns the same result as the plain join
    val want = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    got shouldBe want
  }
}
