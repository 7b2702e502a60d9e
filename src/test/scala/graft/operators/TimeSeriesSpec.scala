package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the time-series family (exact EWMA weights and
  * partial-window mass, autocorrelation sign, seasonality index
  * arithmetic, CUSUM argmax + tie rule, forecast-from-rounded-line) and
  * the concentration metrics (Pareto tie-sharing deciles, Gini via the
  * histogram rank-sum identity, HHI monopoly/split poles).
  */
class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** n events of `tpe` on day `d` (one per second from midnight). */
  private def events(rows: (String, String, Int)*) = {
    val flat = rows.flatMap { case (d, tpe, n) =>
      (0 until n).map(i => (s"$d 00:00:${"%02d".format(i)}", tpe)) }
    flat.toDF("t", "event_type")
      .selectExpr("CAST(t AS TIMESTAMP) AS ts", "event_type")
  }

  test("ewma: power-of-two weights, partial mass at series start") {
    val got = TimeSeries.ewma(events(
        ("2024-01-01", "click", 1),
        ("2024-01-02", "click", 2),
        ("2024-01-03", "click", 4)))
      .orderBy("day")
      .collect().map(r => (r.getLong(3), r.getLong(4), r.getLong(5)))
    // d1: num=1*64, mass=64 -> 10000; d2: 2*64+1*32=160 over 96 ->
    // 16666; d3: 4*64+2*32+1*16=336 over 112 -> 30000
    assert(got.toSeq == Seq((64L, 64L, 10000L), (160L, 96L, 16666L),
      (336L, 112L, 30000L)))
  }

  test("autocorr: a perfectly alternating series reads -1") {
    val got = TimeSeries.autocorr(events(
        ("2024-01-01", "click", 1), ("2024-01-02", "click", 2),
        ("2024-01-03", "click", 1), ("2024-01-04", "click", 2),
        ("2024-01-05", "click", 1)))
      .collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 4L) // 4 consecutive pairs
    assert(got(0).getDouble(2) == -1.0)
  }

  test("autocorr: constant series and single-pair series read null, no throw") {
    // constant daily counts -> both variances 0 -> undefined, null
    val const = TimeSeries.autocorr(events(
        ("2024-01-01", "click", 2), ("2024-01-02", "click", 2),
        ("2024-01-03", "click", 2))).collect()
    assert(const.length == 1 && const(0).getLong(1) == 2L &&
      const(0).isNullAt(2))
    // two observed days -> np = 1 -> variance identically 0 -> null
    val pair = TimeSeries.autocorr(events(
        ("2024-01-01", "click", 1), ("2024-01-02", "click", 3))).collect()
    assert(pair.length == 1 && pair(0).getLong(1) == 1L &&
      pair(0).isNullAt(2))
  }

  test("seasonality: index is volume share over calendar share, in bp") {
    // two Mondays at 3 events, one Tuesday at 2: Monday carries 6/8 of
    // volume on 2/3 of days -> 11250 bp; Tuesday 2/8 on 1/3 -> 7500
    val got = TimeSeries.seasonality(events(
        ("2024-01-01", "click", 3), // Monday
        ("2024-01-08", "click", 3), // Monday
        ("2024-01-02", "click", 2))) // Tuesday
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got == Map(0L -> ((2L, 6L, 11250L)), 1L -> ((1L, 2L, 7500L))))
  }

  test("cusum: argmax of |S|, earliest day on ties") {
    // counts 1,1,10,1: scaled devs 4x-13 = -9,-9,27,-9; S = -9,-18,9,0
    // -> peak |S| = 18 on day 2
    val got = TimeSeries.cusumChangepoint(events(
        ("2024-01-01", "click", 1), ("2024-01-02", "click", 1),
        ("2024-01-03", "click", 10), ("2024-01-04", "click", 1)))
      .collect()
    assert(got.length == 1)
    assert(got(0).getDate(1).toString == "2024-01-02")
    assert(got(0).getLong(2) == -18L)
    assert(got(0).getLong(3) == 4L)
  }

  test("forecast: exact line recovered, projection from the rounded pair") {
    // y = 2x + 1 over x = 0,1,2 -> slope 2, intercept 1, forecast(3) = 7
    val got = TimeSeries.linearForecast(events(
        ("2024-01-01", "click", 1), ("2024-01-02", "click", 3),
        ("2024-01-03", "click", 5)))
      .collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getLong(1) == 3L)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 1.0)
    assert(r.getLong(4) == 3L && r.getDouble(5) == 7.0)
  }

  test("pareto: tie-sharing deciles, exact cumulative share") {
    // spends $100, $1, $1, $1: the whale buckets alone (decile 1), the
    // tied $1 run shares decile 3 (cum_lt 1 of 4 -> 1 + 10 div 4)
    val orders = Seq((1L, 100.0), (2L, 1.0), (3L, 1.0), (4L, 1.0))
      .toDF("o_custkey", "o_totalprice")
    val got = RetailAnalytics.paretoDeciles(orders)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      1 -> ((1L, 10000L, 9708L, 9708L)),
      3 -> ((3L, 300L, 291L, 10000L))))
  }

  test("gini: equal spend reads 0, two-point max skew reads 5000 bp") {
    val eq = Seq((1L, 5.0), (2L, 5.0)).toDF("o_custkey", "o_totalprice")
    assert(RetailAnalytics.gini(eq).collect()(0).getLong(2) == 0L)
    // {$0, $10}: G = (n-1)/n = 1/2 for n=2
    val skew = Seq((1L, 0.0), (2L, 10.0)).toDF("o_custkey", "o_totalprice")
    val r = RetailAnalytics.gini(skew).collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 10L &&
      r.getLong(2) == 5000L)
  }

  test("pareto: all-zero-cent spend reads null shares, no ANSI divide") {
    // every price rounds to 0 cents -> total 0 -> shares of nothing are
    // undefined -> null, matching the oracle's NULL
    val tiny = Seq((1L, 0.004), (2L, 0.003)).toDF("o_custkey", "o_totalprice")
    val got = RetailAnalytics.paretoDeciles(tiny).collect()
    assert(got.nonEmpty && got.forall(r => r.isNullAt(3) && r.isNullAt(4)))
  }

  test("gini/hhi: all-sub-dollar spend reads null, no ANSI divide") {
    // every customer's spend rounds to $0 -> total s = 0 -> the ratio
    // is undefined; both metrics must emit null instead of throwing.
    val tiny = Seq((1L, 0.40), (2L, 0.25)).toDF("o_custkey", "o_totalprice")
    val g = RetailAnalytics.gini(tiny).collect()(0)
    assert(g.getLong(0) == 2L && g.getLong(1) == 0L && g.isNullAt(2))
    val seg = Seq(("1-URGENT", 1L, 0.40), ("1-URGENT", 2L, 0.25))
      .toDF("o_orderpriority", "o_custkey", "o_totalprice")
    val h = RetailAnalytics.hhi(seg).collect()(0)
    assert(h.getLong(1) == 2L && h.isNullAt(2))
  }

  test("hhi: monopoly reads 1e8, an even split reads 1e8/n") {
    val orders = Seq(
      ("1-URGENT", 1L, 50.0), ("1-URGENT", 2L, 50.0),
      ("2-HIGH", 3L, 80.0))
      .toDF("o_orderpriority", "o_custkey", "o_totalprice")
    val got = RetailAnalytics.hhi(orders)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == Map("1-URGENT" -> ((2L, 50000000L)),
      "2-HIGH" -> ((1L, 100000000L))))
  }
}
