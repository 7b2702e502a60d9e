package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: regularize an irregular event stream onto a
  * fixed per-key grid, carrying the last observation forward across
  * gaps (LOCF) — the standard feature-engineering step before joining
  * event-derived features to a training grid.
  *
  * Scale shape: one aggregation for per-key bounds, a spine explode
  * (keys × buckets — the OUTPUT size, nothing larger), one window to
  * pick each bucket's last observation, and one ordered window per key
  * for the carry-forward. Everything shuffles on the key; no
  * driver-side anything.
  */
object Resample {

  /** Daily grid per user over `events`: for every day in the user's
    * [first, last] event range, `obs_value` = value of the day's last
    * event (ties broken by event_id — deterministic) or null, and
    * `locf_value` = last non-null observation at or before that day.
    */
  def dailyLocf(events: DataFrame): DataFrame = {
    val dayUs = 86400000000L // one day in microseconds
    val us = events.select(col("user_id"), unix_micros(col("ts")).as("tus"),
      col("event_id"), col("value"))
    val spine = us.groupBy("user_id")
      .agg(expr(s"min(tus) div $dayUs").as("d0"), expr(s"max(tus) div $dayUs").as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val pick = Window.partitionBy("user_id", "day")
      .orderBy(col("tus").desc, col("event_id").desc)
    val obs = us.withColumn("day", expr(s"tus div $dayUs"))
      .withColumn("rn", row_number().over(pick)).filter(col("rn") === 1)
      .select(col("user_id"), col("day"), col("value").as("obs_value"))
    val carry = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(obs, Seq("user_id", "day"), "left")
      .withColumn("locf_value", last("obs_value", ignoreNulls = true).over(carry))
      .select("user_id", "day", "obs_value", "locf_value")
  }
}
