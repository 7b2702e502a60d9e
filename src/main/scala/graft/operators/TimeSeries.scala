package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over an event log, one step past
  * [[EventAnalytics.dailyAnomaly]]'s trailing-median family: exponential
  * smoothing, autocorrelation, day-of-week seasonality, CUSUM
  * changepoint location, and a per-series linear forecast.
  *
  * Shared scale shape: every operator first collapses the event log to
  * (day, series) counts in ONE aggregation — the only data-sized pass —
  * and all window work (lags, cumulative sums, ranks) runs over that
  * tiny frame (days × types), partitioned by series. Nothing after the
  * first aggregate grows with the corpus.
  *
  * Exactness rule as everywhere: smoothing weights are powers of two so
  * the weighted sums stay integral; correlation/regression reduce to
  * exact DECIMAL power sums with one rounded double emission at the end
  * (the corr-matrix recipe from [[Stats]]).
  */
object TimeSeries {

  /** The shared base: one aggregation of the log to daily counts. */
  def dailyCounts(events: DataFrame, tsCol: String = "ts",
                  typeCol: String = "event_type"): DataFrame =
    events.groupBy(col(tsCol).cast("date").as("day"),
        col(typeCol).as("event_type"))
      .agg(count(lit(1)).as("n"))

  /** EXPONENTIALLY WEIGHTED MOVING AVERAGE of the daily volume, exact:
    * weights are 2^(lookback-k) for lag k (newest day heaviest), so the
    * weighted numerator and the weight mass are plain BIGINTs and the
    * smoothed level lands as basis points of one event —
    * ewma_bp = (10000 · Σ n_{t-k}·2^{L-k}) div Σ 2^{L-k}, the sums over
    * the lags actually present (series starts aren't zero-padded).
    * Lags are ROW lags over observed days: a calendar gap compresses,
    * which is the standard "as-observed" EWMA over an irregular series.
    */
  def ewma(events: DataFrame, tsCol: String = "ts",
           typeCol: String = "event_type", lookback: Int = 6): DataFrame = {
    require(lookback >= 1 && lookback <= 30, "2^lookback must stay BIGINT-exact under 10000x")
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val lags = (0 to lookback).map(k => (k, lag(col("n"), k).over(w)))
    val num = lags.map { case (k, l) =>
      coalesce(l, lit(0L)) * lit(1L << (lookback - k)) }.reduce(_ + _)
    val mass = lags.map { case (k, l) =>
      when(l.isNotNull, lit(1L << (lookback - k))).otherwise(lit(0L)) }
      .reduce(_ + _)
    dailyCounts(events, tsCol, typeCol)
      .withColumn("ewma_num", num)
      .withColumn("w_mass", mass)
      .select(col("day"), col("event_type"), col("n"),
        col("ewma_num"), col("w_mass"),
        expr("(10000 * ewma_num) div w_mass").as("ewma_bp"))
  }

  /** LAG-1 AUTOCORRELATION of the daily volume per series: Pearson r
    * between (n_t, n_{t-1}) over consecutive observed days, computed
    * from exact DECIMAL power sums with one round(…, 6) double at the
    * end (the corr-matrix recipe — wide decimals keep both engines on
    * the int128 path, the final libm ops are a fixed sequence).
    */
  def autocorr(events: DataFrame, tsCol: String = "ts",
               typeCol: String = "event_type"): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val d = (c: String) => col(c).cast("decimal(30,0)")
    val pairs = dailyCounts(events, tsCol, typeCol)
      .withColumn("prev", lag(col("n"), 1).over(w))
      .filter(col("prev").isNotNull)
    pairs
      .groupBy("event_type")
      .agg(count(lit(1)).as("np"),
        sum(d("n")).as("sx"), sum(d("prev")).as("sy"),
        sum(d("n") * d("n")).as("sxx"),
        sum(d("n") * d("prev")).as("sxy"),
        sum(d("prev") * d("prev")).as("syy"))
      .withColumn("vx", col("np").cast("double") * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double"))
      .withColumn("vy", col("np").cast("double") * col("syy").cast("double") -
        col("sy").cast("double") * col("sy").cast("double"))
      // Constant series (or np=1) make a variance 0 → 0/0; the classic
      // autocorrelation is undefined there, so emit null — matching the
      // DuckDB oracle's NaN (canonicalized to null by the gate) instead
      // of letting the divide blow up. Same guard shape as
      // Stats.regression's deny =!= 0 guard.
      .select(col("event_type"), col("np"),
        when(col("vx") > 0.0 && col("vy") > 0.0,
          round((col("np").cast("double") * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) /
            (sqrt(col("vx")) * sqrt(col("vy"))), 6))
          .as("autocorr"))
  }

  /** DAY-OF-WEEK SEASONALITY INDEX per series, exact basis points:
    * idx_bp = (10000 · volume_dow · days_total) div (days_dow ·
    * volume_total) — 10000 means the weekday carries exactly its
    * calendar share. Weekdays are ISO-monday-0 (Spark `weekday`;
    * DuckDB `isodow - 1`). Products stay BIGINT-exact to ~9e14
    * volume·days — past that the same plan lifts into DECIMAL(38,0).
    */
  def seasonality(events: DataFrame, tsCol: String = "ts",
                  typeCol: String = "event_type"): DataFrame = {
    val d = dailyCounts(events, tsCol, typeCol)
      .withColumn("dow", weekday(col("day")).cast("long"))
    val wAll = Window.partitionBy(col("event_type"))
    d.groupBy("event_type", "dow")
      .agg(count(lit(1)).as("days"), sum(col("n")).as("vol"))
      .withColumn("days_tot", sum(col("days")).over(wAll))
      .withColumn("vol_tot", sum(col("vol")).over(wAll))
      .select(col("event_type"), col("dow"), col("days"), col("vol"),
        expr("(10000 * vol * days_tot) div (days * vol_tot)").as("idx_bp"))
  }

  /** CUSUM CHANGEPOINT: the day where the cumulative deviation from
    * the series mean peaks — the classic single-changepoint locator.
    * Kept integral by scaling through the day count: S_t =
    * Σ_{i≤t} (n_days·x_i − Σx)  (= n_days² · the usual mean-centered
    * CUSUM), so the argmax is identical and exact. Ties on |S| break
    * to the earliest day. One row per series: the located day, the
    * signed peak, and the series extent.
    */
  def cusumChangepoint(events: DataFrame, tsCol: String = "ts",
                       typeCol: String = "event_type"): DataFrame = {
    val bySeries = Window.partitionBy(col("event_type"))
    val cum = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = dailyCounts(events, tsCol, typeCol)
      .withColumn("n_days", count(lit(1)).over(bySeries))
      .withColumn("tot", sum(col("n")).over(bySeries))
      .withColumn("cusum", sum(col("n_days") * col("n") - col("tot")).over(cum))
      .withColumn("rk", row_number().over(Window.partitionBy(col("event_type"))
        .orderBy(abs(col("cusum")).desc, col("day"))))
    ranked.filter(col("rk") === 1)
      .select(col("event_type"), col("day").as("change_day"),
        col("cusum"), col("n_days"))
  }

  /** PER-SERIES LINEAR FORECAST: OLS of daily volume on the day index
    * (days since the series' first observation), then the next-day
    * projection. Sufficient statistics are exact DECIMAL sums; slope
    * and intercept are emitted at round(…, 6), and the forecast is
    * computed FROM the rounded pair — so every engine that agrees on
    * the 6-decimal line agrees on the projection bit for bit.
    */
  def linearForecast(events: DataFrame, tsCol: String = "ts",
                     typeCol: String = "event_type"): DataFrame = {
    val bySeries = Window.partitionBy(col("event_type"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(30,0)")
    val base = dailyCounts(events, tsCol, typeCol)
      .withColumn("x", datediff(col("day"),
        min(col("day")).over(bySeries)).cast("long"))
    val g = base.groupBy("event_type")
      .agg(count(lit(1)).as("nd"),
        max(col("x")).as("x_max"),
        sum(d(col("x"))).as("sx"), sum(d(col("n"))).as("sy"),
        sum(d(col("x")) * d(col("x"))).as("sxx"),
        sum(d(col("x")) * d(col("n"))).as("sxy"))
    val nD = col("nd").cast("double")
    val det = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val slope = round((nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")) / det, 6)
    val icept = round((col("sy").cast("double") -
      ((nD * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")) / det) *
        col("sx").cast("double")) / nD, 6)
    g.filter(col("nd") >= 2)
      .select(col("event_type"), col("nd").as("n_days"),
        slope.as("slope"), icept.as("intercept"),
        (col("x_max") + 1).as("next_x"))
      .withColumn("forecast",
        round(col("slope") * col("next_x").cast("double") +
          col("intercept"), 6))
  }
}
