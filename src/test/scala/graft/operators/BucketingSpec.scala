package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed tables join with ZERO exchanges and match the plain join") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey", "c_name", "c_nationkey")
      .withColumnRenamed("c_custkey", "o_custkey")

    Bucketing.writeBucketed(orders, "b_orders", "o_custkey", 8)
    Bucketing.writeBucketed(customer, "b_customer", "o_custkey", 8)
    // model the at-scale case this layout exists for: NEITHER side fits
    // a broadcast (locally the tiny dim would broadcast and the planner
    // would ignore bucketing)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark, "b_orders", "b_customer", "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")

      val expected = orders.join(customer, "o_custkey")
      assert(joined.count() == expected.count())
      val a = joined.orderBy("o_orderkey").collect().map(_.toSeq)
      val b = expected.orderBy("o_orderkey").collect().map(_.toSeq)
      assert(a.sameElements(b), "bucketed join result differs from plain join")

      // aggregation on the bucket key also rides the file layout:
      // no exchange below the final aggregate either
      val agg = spark.table("b_orders").groupBy("o_custkey")
        .agg(sum("o_totalprice"))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        "groupBy on the bucket key should reuse the bucket distribution")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
