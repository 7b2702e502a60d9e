package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the sales-mining operators: basket pair support /
  * lift arithmetic, equal-frequency bucket tie handling, and the RFM
  * grid's score orientation (higher = better on all three axes).
  */
class RetailAnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pairAssociations: support counts orders, lift vs independence") {
    // 4 orders: {A,B} {A,B} {A,C} {B}; duplicate line for A in o1 must
    // not double-count
    val lines = Seq(
      (1L, 10L), (1L, 10L), (1L, 20L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 30L),
      (4L, 20L))
      .toDF("l_orderkey", "l_partkey")
    val got = RetailAnalytics.pairAssociations(lines, minSupport = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // only (10,20) survives minSupport=2: support 2; c_A=3, c_B=3,
    // n_orders=4 -> lift = 2*4/(3*3) = 8/9 -> 8888 bp exactly
    assert(got == Map((10L, 20L) -> ((2L, 8888L))))
  }

  test("eqFreqBuckets: strict-rank buckets, ties share a bucket") {
    // values 1,2,2,2,9 with k=2: cum_lt(1)=0 -> b1; cum_lt(2)=1 ->
    // 1+(2*1) div 5 = 1 (all three ties together); cum_lt(9)=4 -> b2
    val vals = Seq(1L, 2L, 2L, 2L, 9L).toDF("x")
    val got = RetailAnalytics.eqFreqBuckets(vals, "x", 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 1, 2L -> 1, 9L -> 2))
  }

  test("rfm: score orientation and exact cents") {
    // two customers: c1 ordered recently, twice, big spend; c2 long ago,
    // once, small spend. With k=2, c1 must land at (2,2,2), c2 (1,1,1).
    val orders = Seq(
      (1L, "2024-06-01", 100.005), (1L, "2024-06-10", 200.0),
      (2L, "2024-01-01", 10.0))
      .toDF("o_custkey", "d", "o_totalprice")
      .selectExpr("o_custkey", "CAST(d AS DATE) AS o_orderdate",
        "o_totalprice")
    val got = RetailAnalytics.rfm(orders, k = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    // c1 cents: the double nearest 100.005 sits just ABOVE it, so
    // floor(100.005*100+0.5) = 10001 — pinned here because the oracle
    // must reproduce exactly this binary64 behavior — plus 20000
    assert(got == Map(
      (2, 2, 2) -> ((1L, 30001L)),
      (1, 1, 1) -> ((1L, 1000L))))
  }
}
