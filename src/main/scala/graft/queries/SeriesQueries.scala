package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-series + concentration analytics: EWMA smoothing, lag-1
  * autocorrelation, day-of-week seasonality, CUSUM changepoint, linear
  * forecast (graft.operators.TimeSeries) and the Pareto / Gini / HHI
  * concentration family (graft.operators.RetailAnalytics). Exactness
  * rule as everywhere: integral outputs (power-of-two weights, basis
  * points, scaled indices) except the regression-style queries, which
  * follow the q_regression recipe — exact DECIMAL power sums, one
  * round(…, 6) double emission.
  */
object SeriesQueries {
  type Q = (SparkSession, String) => DataFrame

  /** DuckDB daily-count base, shared by every time-series oracle. */
  private val dailySql =
    """SELECT CAST(make_timestamp(epoch_ns(ts)//1000) AS DATE) AS day,
      |    event_type, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2""".stripMargin

  /** q_ewma oracle, generated from the same lag/weight list the
    * operator derives (lookback 6 → weights 64..1, newest heaviest).
    */
  private val ewmaOracle: String = {
    val lags = (0 to 6).map(k => (k, 1L << (6 - k)))
    val lagCols = lags.map { case (k, _) =>
      s"lag(n, $k) OVER w AS l$k" }.mkString(",\n    ")
    val num = lags.map { case (k, wt) =>
      s"coalesce(l$k, 0) * $wt" }.mkString(" + ")
    val mass = lags.map { case (k, wt) =>
      s"CASE WHEN l$k IS NOT NULL THEN $wt ELSE 0 END" }.mkString(" + ")
    s"""WITH d AS (
       |  $dailySql),
       |l AS (
       |  SELECT day, event_type, n,
       |    $lagCols
       |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day)),
       |e AS (
       |  SELECT day, event_type, n,
       |    CAST($num AS BIGINT) AS ewma_num,
       |    CAST($mass AS BIGINT) AS w_mass
       |  FROM l)
       |SELECT day, event_type, n, ewma_num, w_mass,
       |  (10000 * ewma_num) // w_mass AS ewma_bp
       |FROM e ORDER BY event_type, day""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    // exponentially weighted daily volume, exact power-of-two weights
    "q_ewma" -> ((s, dir) =>
      graft.operators.TimeSeries.ewma(Tables(s, dir, "events"))
        .orderBy("event_type", "day")),

    // lag-1 Pearson autocorrelation of daily volume per series
    "q_autocorr" -> ((s, dir) =>
      graft.operators.TimeSeries.autocorr(Tables(s, dir, "events"))
        .orderBy("event_type")),

    // day-of-week seasonality index in exact basis points
    "q_seasonality" -> ((s, dir) =>
      graft.operators.TimeSeries.seasonality(Tables(s, dir, "events"))
        .orderBy("event_type", "dow")),

    // CUSUM changepoint: day of peak cumulative mean deviation
    "q_changepoint" -> ((s, dir) =>
      graft.operators.TimeSeries.cusumChangepoint(Tables(s, dir, "events"))
        .orderBy("event_type")),

    // per-series OLS trend + next-day projection from the rounded line
    "q_forecast" -> ((s, dir) =>
      graft.operators.TimeSeries.linearForecast(Tables(s, dir, "events"))
        .orderBy("event_type")),

    // revenue-concentration deciles (1 = biggest spenders) with the
    // cumulative "top-d holds X bp" curve
    "q_pareto" -> ((s, dir) =>
      graft.operators.RetailAnalytics.paretoDeciles(Tables(s, dir, "orders"))
        .orderBy("decile")),

    // Gini coefficient of customer spend, exact bp via the histogram
    // rank-sum identity (no per-entity rank)
    "q_gini" -> ((s, dir) =>
      graft.operators.RetailAnalytics.gini(Tables(s, dir, "orders"))),

    // Herfindahl index of spend concentration per order priority
    "q_hhi" -> ((s, dir) =>
      graft.operators.RetailAnalytics.hhi(Tables(s, dir, "orders"))
        .orderBy("segment")))

  val oracles: Map[String, String] = Map(
    "q_ewma" -> ewmaOracle,

    // exact DECIMAL power sums over (n_t, n_{t-1}) pairs, round(…, 6)
    // at the end — the corr-matrix recipe; DECIMAL(30,0) keeps DuckDB
    // on the int128 path
    "q_autocorr" ->
      s"""WITH d AS (
         |  $dailySql),
         |p AS (
         |  SELECT event_type, n,
         |    lag(n, 1) OVER (PARTITION BY event_type ORDER BY day) AS prev
         |  FROM d),
         |g AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS np,
         |    sum(CAST(n AS DECIMAL(30,0))) AS sx,
         |    sum(CAST(prev AS DECIMAL(30,0))) AS sy,
         |    sum(CAST(n AS DECIMAL(30,0)) * CAST(n AS DECIMAL(30,0))) AS sxx,
         |    sum(CAST(n AS DECIMAL(30,0)) * CAST(prev AS DECIMAL(30,0))) AS sxy,
         |    sum(CAST(prev AS DECIMAL(30,0)) * CAST(prev AS DECIMAL(30,0))) AS syy
         |  FROM p WHERE prev IS NOT NULL GROUP BY 1)
         |SELECT event_type, np,
         |  round((CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE) -
         |         CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
         |    (sqrt(CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE) -
         |          CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
         |     sqrt(CAST(np AS DOUBLE) * CAST(syy AS DOUBLE) -
         |          CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS autocorr
         |FROM g ORDER BY event_type""".stripMargin,

    // idx_bp = (10000 * vol_dow * days_total) // (days_dow * vol_total);
    // ISO-monday-0 weekday (Spark weekday == DuckDB isodow - 1)
    "q_seasonality" ->
      s"""WITH d AS (
         |  $dailySql),
         |g AS (
         |  SELECT event_type, CAST(isodow(day) - 1 AS BIGINT) AS dow,
         |    CAST(count(*) AS BIGINT) AS days, CAST(sum(n) AS BIGINT) AS vol
         |  FROM d GROUP BY 1, 2)
         |SELECT event_type, dow, days, vol,
         |  CAST((10000 * vol * (sum(days) OVER (PARTITION BY event_type))) //
         |       (days * (sum(vol) OVER (PARTITION BY event_type))) AS BIGINT)
         |    AS idx_bp
         |FROM g ORDER BY event_type, dow""".stripMargin,

    // S_t = sum_{i<=t}(n_days*x_i - total) — integral CUSUM; argmax of
    // |S| per series, earliest day on ties
    "q_changepoint" ->
      s"""WITH d AS (
         |  $dailySql),
         |t AS (
         |  SELECT day, event_type, n,
         |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days,
         |    CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS tot
         |  FROM d),
         |c AS (
         |  SELECT day, event_type, n_days,
         |    CAST(sum(n_days * n - tot) OVER (PARTITION BY event_type
         |      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cusum
         |  FROM t),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY event_type
         |    ORDER BY abs(cusum) DESC, day) AS rk FROM c)
         |SELECT event_type, day AS change_day, cusum, n_days
         |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin,

    // the q_regression recipe on (day index, volume), then the next-day
    // projection computed FROM the rounded slope/intercept pair
    "q_forecast" ->
      s"""WITH d AS (
         |  $dailySql),
         |x AS (
         |  SELECT event_type, n,
         |    CAST(date_diff('day',
         |      min(day) OVER (PARTITION BY event_type), day) AS BIGINT) AS x
         |  FROM d),
         |g AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
         |    CAST(max(x) AS BIGINT) AS x_max,
         |    sum(CAST(x AS DECIMAL(30,0))) AS sx,
         |    sum(CAST(n AS DECIMAL(30,0))) AS sy,
         |    sum(CAST(x AS DECIMAL(30,0)) * CAST(x AS DECIMAL(30,0))) AS sxx,
         |    sum(CAST(x AS DECIMAL(30,0)) * CAST(n AS DECIMAL(30,0))) AS sxy
         |  FROM x GROUP BY 1),
         |f AS (
         |  SELECT event_type, n_days,
         |    round((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE) -
         |           CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
         |          (CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE) -
         |           CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
         |    round((CAST(sy AS DOUBLE) -
         |          (CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE) -
         |           CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
         |          (CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE) -
         |           CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
         |           CAST(sx AS DOUBLE)) / CAST(n_days AS DOUBLE), 6)
         |      AS intercept,
         |    x_max + 1 AS next_x
         |  FROM g WHERE n_days >= 2)
         |SELECT event_type, n_days, slope, intercept, next_x,
         |  round(slope * CAST(next_x AS DOUBLE) + intercept, 6) AS forecast
         |FROM f ORDER BY event_type""".stripMargin,

    // deciles via strict-rank over the negated whole-dollar histogram
    // (ties share a decile — the rfm bucket rule); shares in exact bp
    "q_pareto" ->
      """WITH per AS (
        |  SELECT o_custkey AS cust,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |b AS (SELECT cust, cents, -(cents // 100) AS neg_dollars FROM per),
        |bk AS (SELECT v, least(10, 1 + (10 * coalesce(sum(n) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)) //
        |    sum(n) OVER ()) AS decile
        |  FROM (SELECT neg_dollars AS v, count(*) AS n FROM b GROUP BY 1)),
        |g AS (
        |  SELECT CAST(decile AS INTEGER) AS decile,
        |    CAST(count(*) AS BIGINT) AS customers,
        |    CAST(sum(cents) AS BIGINT) AS cents
        |  FROM b JOIN bk ON bk.v = b.neg_dollars GROUP BY 1)
        |SELECT decile, customers, cents,
        |  CAST((10000 * cents) // (sum(cents) OVER ()) AS BIGINT) AS share_bp,
        |  CAST((10000 * (sum(cents) OVER (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))) //
        |    (sum(cents) OVER ()) AS BIGINT) AS cum_share_bp
        |FROM g ORDER BY decile""".stripMargin,

    // histogram rank-sum identity: a tie run of c values starting at
    // rank r0 contributes v*(c*r0 + c(c-1)/2); HUGEINT mirrors the
    // engine's DECIMAL(38,0) headroom
    "q_gini" ->
      """WITH per AS (
        |  SELECT o_custkey AS cust,
        |    sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
        |  FROM orders GROUP BY 1),
        |h AS (SELECT cents // 100 AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM per GROUP BY 1),
        |r AS (SELECT v, c, coalesce(sum(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1 AS r0
        |  FROM h),
        |g AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n_cust,
        |    sum(v::HUGEINT * c) AS s,
        |    sum(v::HUGEINT * (c * r0 + (c * (c - 1)) // 2)) AS rank_sum
        |  FROM r)
        |SELECT n_cust, CAST(s AS BIGINT) AS dollars,
        |  CAST((10000::HUGEINT * (2 * rank_sum - (n_cust + 1) * s)) //
        |       (n_cust::HUGEINT * s) AS BIGINT) AS gini_bp
        |FROM g""".stripMargin,

    // HHI*1e8 = (1e8 * sum(c_i^2)) // (sum c_i)^2 on whole dollars
    "q_hhi" ->
      """WITH pc AS (
        |  SELECT o_orderpriority AS segment, o_custkey AS cust,
        |    sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
        |  FROM orders GROUP BY 1, 2),
        |d AS (SELECT segment, cents // 100 AS dollars FROM pc),
        |g AS (
        |  SELECT segment, CAST(count(*) AS BIGINT) AS n_cust,
        |    sum(dollars::HUGEINT) AS s,
        |    sum(dollars::HUGEINT * dollars) AS ssq
        |  FROM d GROUP BY 1)
        |SELECT segment, n_cust,
        |  CAST((100000000::HUGEINT * ssq) // (s * s) AS BIGINT) AS hhi
        |FROM g ORDER BY segment""".stripMargin)
}
