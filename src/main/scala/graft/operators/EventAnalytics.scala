package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Product-analytics operators over an event log — funnel conversion,
  * cohort retention, time-weighted averages. The queries every
  * clickstream warehouse runs daily; none needs more than windows +
  * aggregation, so each is one declarative plan Catalyst can push,
  * prune, and whole-stage-codegen.
  *
  * Scale shapes: each operator shuffles the event log ONCE on the
  * entity key (the Window / groupBy partitioning); everything after
  * that reuses the partitioning (no second Exchange on the same key)
  * and reduces to per-group or global rows immediately. At 100 TB the
  * cost is the one key-hash exchange — and with the log stored
  * date-partitioned, the usual "last N days" predicates prune scans
  * before it.
  */
object EventAnalytics {

  /** FUNNEL: how many users reached stage k of an ordered journey,
    * where stage k counts only STRICTLY AFTER the user's stage k-1
    * (the standard ordered-funnel semantics — a purchase before the
    * first view is not conversion).
    *
    * Per user and event ordered by time, the running minimum timestamp
    * of "qualified at stage k" chains stage to stage: a row qualifies
    * at stage k iff it carries stage k's event type and the running
    * min of stage k-1 sits strictly before it. The chain is k-1
    * dependent Window steps, but every step shares ONE window spec —
    * the plan pays a single hash Exchange + sort on the user key and
    * stacks the Window execs over it shuffle-free; the per-user
    * reduction reuses the same partitioning, and the result collapses
    * to a single row exploded into (stage, users) — nothing after the
    * one exchange is more than user-cardinality.
    *
    * Ties: RANGE frames (both engines' default for an ordered window)
    * make same-timestamp behavior symmetric and deterministic; an
    * event at exactly its predecessor stage's timestamp does NOT
    * qualify (strict `>`).
    */
  def funnel(events: DataFrame, stages: Seq[String], userCol: String,
             tsCol: String, typeCol: String): DataFrame = {
    val totals = funnelUsers(events, stages, userCol, tsCol, typeCol).agg(
      count(col("u0")).as("c0"),
      stages.indices.tail.map(i => count(col(s"u$i")).as(s"c$i")): _*)
    val rows = stages.zipWithIndex.map { case (st, i) =>
      struct(lit(i + 1).as("stage"), lit(st).as("event_type"),
        col(s"c$i").as("users"))
    }
    totals.select(explode(array(rows: _*)).as("r"))
      .select(col("r.stage"), col("r.event_type"), col("r.users"))
  }

  /** Per-user funnel frame behind [[funnel]]: `u0..u{k-1}` = the
    * earliest QUALIFIED timestamp per stage (null = stage not
    * reached), the shape a per-user conversion report or the streaming
    * twin ([[graft.streaming.StreamingOps.streamingFunnelUsers]])
    * compares against.
    */
  def funnelUsers(events: DataFrame, stages: Seq[String], userCol: String,
                  tsCol: String, typeCol: String): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    val w = Window.partitionBy(userCol).orderBy(col("__tsu"))
    // qualified-timestamp column per stage, each defined from the
    // previous stage's RUNNING MIN — materialized step by step (a
    // window function cannot nest inside another window function)
    var staged = events
      .select(col(userCol), unix_micros(col(tsCol)).as("__tsu"),
        col(typeCol).as("__et"))
      .withColumn("q0", when(col("__et") === stages.head, col("__tsu")))
    stages.tail.zipWithIndex.foreach { case (st, i) =>
      val prevMin = min(col(s"q$i")).over(w)
      staged = staged.withColumn(s"q${i + 1}",
        when(col("__et") === st && prevMin.isNotNull &&
          col("__tsu") > prevMin, col("__tsu")))
    }
    staged
      .groupBy(userCol)
      .agg(min(col("q0")).as("u0"),
        stages.indices.tail.map(i => min(col(s"q$i")).as(s"u$i")): _*)
  }

  /** COHORT RETENTION: users grouped by the period of their FIRST
    * event (the cohort), counted once per period they were active in —
    * the (cohort, period, active_users) triangle behind every
    * retention curve.
    *
    * Plan: cohort assignment is a whole-partition window min over the
    * user key (no join back to the event log — the naive two-pass
    * formulation pays an extra Exchange re-aligning the activity side
    * to the join key), then a distinct over (user, period, cohort)
    * whose rows the final count consumes AS distinct — plain
    * `count(*)`, never a countDistinct Expand. Three exchanges, each
    * over a strictly smaller frame: events → user-periods → cohort
    * cells.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      period: String = "week"): DataFrame = {
    val bucket = date_trunc(period, col(tsCol)).cast("date")
    events.select(col(userCol), bucket.as("period"))
      .withColumn("cohort",
        min(col("period")).over(Window.partitionBy(userCol)))
      .distinct()
      .groupBy("cohort", "period")
      .agg(count(lit(1)).as("active_users"))
  }

  /** TIME-WEIGHTED AVERAGE of an observed value per key: each
    * observation holds until the next one, so it weighs by its holding
    * duration — the TWAP/sensor-mean that a plain AVG gets wrong the
    * moment sampling is irregular. The last observation per key has no
    * duration and drops out (standard closed-interval convention).
    *
    * Exactness: durations are integral microseconds and values fixed
    * to DECIMAL(18,6), so the weighted sum is one exact decimal
    * aggregate (order-free, partial-combining); only the final
    * quotient runs in double, rounded to absorb ulp differences across
    * engines. One Window (lead) + one aggregation, same partitioning.
    */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tsCol: String,
                      valueCol: String,
                      tieBreakCols: Seq[String] = Nil): DataFrame = {
    val tsu = unix_micros(col(tsCol))
    // tieBreakCols pin the order of same-timestamp observations — which
    // of them carries the interval to the next distinct timestamp must
    // not depend on partition layout (zero-duration tie rows drop out)
    val w = Window.partitionBy(keyCol)
      .orderBy(tsu +: tieBreakCols.map(col): _*)
    val dur = (lead(tsu, 1).over(w) - tsu).as("dur")
    df.select(col(keyCol), col(valueCol), dur)
      .filter(col("dur").isNotNull && col("dur") > 0)
      .groupBy(keyCol)
      .agg(
        sum(col(valueCol).cast(DecimalType(18, 6)) *
          col("dur").cast(DecimalType(18, 0))).as("wsum"),
        sum(col("dur")).as("wtot"))
      .select(col(keyCol),
        round(col("wsum").cast(DoubleType) / col("wtot").cast(DoubleType), 6)
          .as("twa"),
        col("wtot").as("observed_micros"))
  }
}
