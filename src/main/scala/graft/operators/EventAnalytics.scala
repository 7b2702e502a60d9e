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
             tsCol: String, typeCol: String): DataFrame =
    funnelTotals(funnelUsers(events, stages, userCol, tsCol, typeCol), stages)

  /** The per-stage counting tail of [[funnel]] over an already-built
    * per-user stage frame (u0..u{k-1}) — shared with the streaming twin
    * ([[graft.streaming.StreamingOps.streamingFunnel]]), whose stateful
    * fold builds the frame instead of the stacked batch windows.
    */
  def funnelTotals(fu: DataFrame, stages: Seq[String]): DataFrame = {
    val totals = fu.agg(
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

  /** SESSION-SCOPED FUNNEL: [[funnel]]'s ordered-stage conversion, but
    * the chain must complete inside ONE session (30-min-gap fold, the
    * [[graft.streaming.StreamingOps.sessionize]] strict-> rule) — the
    * "did the visit convert" metric, where the plain funnel answers
    * "did the user ever convert". Counts are SESSIONS reaching each
    * stage. Stage semantics are exactly [[funnelUsers]]'s: a stage
    * event qualifies only STRICTLY after the previous stage's earliest
    * qualified time, evaluated within the session.
    *
    * Plan: the session fold is one exchange on the user key; the
    * staged running mins repartition to (user, session) — both
    * exchanges user-dominated, the aggregate collapses to one row per
    * session then |stages| rows.
    */
  def sessionFunnel(events: DataFrame, stages: Seq[String],
                    gapMinutes: Int = 30, userCol: String = "user_id",
                    tsCol: String = "ts", idCol: String = "event_id",
                    typeCol: String = "event_type"): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    val wUser = Window.partitionBy(col(userCol))
      .orderBy(col("__tsu"), col(idCol))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val sessioned = events
      .select(col(userCol), col(idCol), unix_micros(col(tsCol)).as("__tsu"),
        col(typeCol).as("__et"))
      .withColumn("__prev", lag(col("__tsu"), 1).over(wUser))
      .withColumn("__new", when(col("__prev").isNull ||
        col("__tsu") - col("__prev") > gapUs, 1).otherwise(0))
      .withColumn("__sess", sum(col("__new")).over(
        wUser.rowsBetween(Window.unboundedPreceding, 0)))
    // RANGE default frame (all tsu peers included), matching funnel:
    // tie order never changes a running min
    val w = Window.partitionBy(col(userCol), col("__sess"))
      .orderBy(col("__tsu"))
    var staged = sessioned
      .withColumn("q0", when(col("__et") === stages.head, col("__tsu")))
    stages.tail.zipWithIndex.foreach { case (st, i) =>
      val prevMin = min(col(s"q$i")).over(w)
      staged = staged.withColumn(s"q${i + 1}",
        when(col("__et") === st && prevMin.isNotNull &&
          col("__tsu") > prevMin, col("__tsu")))
    }
    val perSession = staged
      .groupBy(col(userCol), col("__sess"))
      .agg(min(col("q0")).as("u0"),
        stages.indices.tail.map(i => min(col(s"q$i")).as(s"u$i")): _*)
    val totals = perSession.agg(count(col("u0")).as("c0"),
      stages.indices.tail.map(i => count(col(s"u$i")).as(s"c$i")): _*)
    val rows = stages.zipWithIndex.map { case (st, i) =>
      struct(lit(i + 1).as("stage"), lit(st).as("event_type"),
        col(s"c$i").as("sessions"))
    }
    totals.select(explode(array(rows: _*)).as("r"))
      .select(col("r.stage"), col("r.event_type"), col("r.sessions"))
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

  /** MULTI-TOUCH ATTRIBUTION: credit each conversion's value to the
    * touch events (views, clicks, …) that preceded it within a lookback
    * window, under the three standard models at once — first-touch,
    * last-touch, and linear — reported per touch type.
    *
    * Each event finds its NEXT conversion with one reverse running-min
    * window over the user's timeline (no event×conversion self-join on
    * the touch side): ordered by (ts, id) DESC with an explicit ROWS
    * frame, the running min of conversion timestamps at the current row
    * is exactly "the earliest conversion at-or-after me" — determinism
    * under timestamp ties comes from the id in the sort, and the ROWS
    * frame keeps both engines' tie semantics identical (RANGE would
    * include same-ts peers asymmetrically). Touches outside
    * `windowDays` of their conversion drop; per conversion group
    * (user, conv_ts) one more window pass ranks touches from both ends
    * and counts them — same user partitioning, no extra shuffle.
    *
    * Money stays integral: conversion value becomes CENTS
    * (floor(v·100+0.5), one double product both engines round
    * identically), the linear model splits by INTEGER division (each
    * touch gets cents div n; the sub-cent remainder is dropped rather
    * than float-smeared), first/last assign the full cents to the
    * boundary touch. Concurrent same-timestamp conversions collapse to
    * the min-id one per (user, ts) so the credited value is unique.
    *
    * Scale shape: the windows cost ONE event-log exchange on the user
    * key; joining the per-touch frame to conversion values is a
    * key-shuffle of conversion-sized rows on (user, conv_ts); the final
    * aggregate is touch-type-sized. Nothing is driver-side, nothing is
    * quadratic in the log.
    */
  def attribution(events: DataFrame, touchTypes: Seq[String],
                  convType: String, userCol: String = "user_id",
                  tsCol: String = "ts", idCol: String = "event_id",
                  typeCol: String = "event_type",
                  valueCol: String = "value",
                  windowDays: Int = 7): DataFrame = {
    // integral microseconds throughout (the q_twap/q_asof idiom): the
    // source column may carry sub-microsecond precision in other
    // engines, and ordering/compares must not depend on it
    val winMicros = windowDays.toLong * 86400L * 1000000L
    val base = events.withColumn("tus", unix_micros(col(tsCol)))
    val wNext = Window.partitionBy(col(userCol))
      .orderBy(col("tus").desc, col(idCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val touches = base
      .withColumn("conv_tus",
        min(when(col(typeCol) === convType, col("tus"))).over(wNext))
      .filter(col(typeCol).isin(touchTypes: _*) &&
        col("conv_tus").isNotNull &&
        col("conv_tus") <= col("tus") + lit(winMicros))
    val wConv = Window.partitionBy(col(userCol), col("conv_tus"))
    val ranked = touches
      .withColumn("n_t", count(lit(1)).over(wConv))
      .withColumn("rn_a", row_number().over(
        wConv.orderBy(col("tus").asc, col(idCol).asc)))
      .withColumn("rn_d", row_number().over(
        wConv.orderBy(col("tus").desc, col(idCol).desc)))
      .select(col(userCol), col("conv_tus"), col(typeCol).as("touch_type"),
        col("n_t"), col("rn_a"), col("rn_d"))
    val convs = base.filter(col(typeCol) === convType)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(userCol), col("tus")).orderBy(col(idCol))))
      .filter(col("rn") === 1)
      .select(col(userCol), col("tus").as("conv_tus"),
        floor(col(valueCol) * lit(100.0) + lit(0.5)).cast("bigint")
          .as("cents"))
    ranked.join(convs, Seq(userCol, "conv_tus"))
      .groupBy("touch_type")
      .agg(count(lit(1)).as("n_touches"),
        sum(when(col("rn_a") === 1, col("cents")).otherwise(0L))
          .as("first_cents"),
        sum(when(col("rn_d") === 1, col("cents")).otherwise(0L))
          .as("last_cents"),
        sum(expr("cents div n_t")).as("linear_cents"))
  }

  /** FIRST-ORDER TRANSITION MATRIX over each user's event sequence —
    * the Markov-chain summary behind next-action prediction, journey
    * maps, and anomaly baselines ("error after purchase spiked"). Each
    * consecutive pair of a user's events (ordered by integral
    * microseconds, id tie-break) is one (from, to) observation; output
    * is count + row-normalized probability in integer BASIS POINTS
    * (exact div — no float compare in a gate built on this).
    *
    * Scale shape: ONE event-log exchange on the user key for the lead
    * window, then the aggregate collapses to |types|² rows; the
    * row-total normalization is a window over that tiny frame. Nothing
    * downstream of the one exchange is larger than the type vocabulary
    * squared.
    */
  /** DAILY-VOLUME ANOMALY SCORE: each (day, event type)'s count against
    * the MEDIAN of its trailing `lookback` observed days — the
    * robust-baseline monitor behind "errors spiked today" alerts (a
    * trailing mean would let one earlier spike poison its own baseline;
    * the median won't). Deviation is exact: 2·median of k integers is
    * the SUM OF THE TWO MIDDLE ORDER STATISTICS (equal when k is odd) —
    * BIGINT throughout, so dev_bp = (20000·n) div med2 never touches
    * float. Spark's median/percentile aggregates reject window frames,
    * so the frame materializes as a sorted array (≤ lookback elements)
    * and the middles index into it. Days with an empty trailing frame
    * (the first per type) drop.
    *
    * Flags are fixed odds: spike ≥ 1.5× the baseline (dev_bp ≥ 15000),
    * drop ≤ 0.6× (dev_bp ≤ 6000).
    *
    * Scale shape: the event log collapses to (day, type) counts in one
    * aggregation — the rolling median window runs over that tiny frame
    * (days × types), partitioned by type. Nothing after the first
    * aggregate is data-sized.
    */
  def dailyAnomaly(events: DataFrame, tsCol: String = "ts",
                   typeCol: String = "event_type",
                   lookback: Int = 7): DataFrame =
    anomalyTail(events
      .groupBy(col(tsCol).cast("date").as("day"),
        col(typeCol).as("event_type"))
      .agg(count(lit(1)).as("n")), lookback)

  /** The trailing-median tail of [[dailyAnomaly]] over an already-built
    * (day, event_type, n) daily-count frame — shared with the streaming
    * twin ([[graft.streaming.StreamingOps.streamingDailyAnomaly]]),
    * whose stateful streaming aggregation builds the counts instead of
    * a batch groupBy.
    */
  def anomalyTail(daily: DataFrame, lookback: Int = 7): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-lookback, -1)
    daily
      .withColumn("trail", array_sort(collect_list(col("n")).over(w)))
      .filter(size(col("trail")) > 0)
      .withColumn("med2",
        expr("""element_at(trail, CAST(((size(trail) - 1) div 2) + 1 AS INT)) +
                element_at(trail, CAST((size(trail) div 2) + 1 AS INT))"""))
      .withColumn("dev_bp", expr("(20000 * n) div med2"))
      .select(col("day"), col("event_type"), col("n"), col("med2"),
        col("dev_bp"),
        when(col("dev_bp") >= 15000, lit("spike"))
          .when(col("dev_bp") <= 6000, lit("drop"))
          .otherwise(lit("normal")).as("flag"))
  }

  /** A/B EXPERIMENT READOUT in exact integers: users split into two
    * variants by a deterministic id rule, conversion = at least
    * `minEvents` `convType` events, and the 2×2 association strength as the
    * chi-square statistic in MICRO units — χ²·1e6 = (1e6·N·(ad−bc)²)
    * div (row·col products). The cross term ad−bc stays BIGINT (exact
    * to ~6e9 users); the wide product runs in DECIMAL(38,0) — 38
    * digits of headroom, exact past any population that still needs a
    * significance test — and the integral divide lands back in BIGINT.
    * χ² ≥ 3.841 (3841459 micro) is the usual p<0.05 line; the caller
    * compares, this reports. A zero margin (nobody / everybody
    * converted, or an empty variant) makes χ² undefined — it comes
    * back null.
    *
    * Scale shape: one aggregation of the event log on the user key
    * (conversion flag per user), then a 2-row aggregate; the 2×2 math
    * runs on a single row.
    */
  def abTest(events: DataFrame, convType: String,
             userCol: String = "user_id",
             typeCol: String = "event_type",
             minEvents: Long = 1L): DataFrame = {
    val perUser = events
      .groupBy(col(userCol).as("uid"))
      .agg(sum(when(col(typeCol) === convType, 1L).otherwise(0L))
        .as("n_conv"))
      .withColumn("converted",
        when(col("n_conv") >= minEvents, 1L).otherwise(0L))
      .withColumn("variant", expr("uid % 2"))
    perUser
      .groupBy()
      .agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("users_a"),
        sum(when(col("variant") === 0, col("converted")).otherwise(0L))
          .as("conv_a"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("users_b"),
        sum(when(col("variant") === 1, col("converted")).otherwise(0L))
          .as("conv_b"))
      // degenerate-margin guards (the r13 convention): an empty
      // variant leaves its rate undefined, and a zero χ² margin
      // (empty variant, zero conversions, or universal conversion)
      // leaves the statistic undefined — emit null like the oracle's
      // NULL instead of an ANSI divide-by-zero
      .select(col("users_a"), col("conv_a"), col("users_b"), col("conv_b"),
        when(col("users_a") > 0, expr("(10000 * conv_a) div users_a"))
          .as("cr_a_bp"),
        when(col("users_b") > 0, expr("(10000 * conv_b) div users_b"))
          .as("cr_b_bp"),
        // a = conv_a, b = users_a - conv_a, c = conv_b, d = users_b - conv_b
        when(col("users_a") > 0 && col("users_b") > 0 &&
            col("conv_a") + col("conv_b") > 0 &&
            col("users_a") + col("users_b") > col("conv_a") + col("conv_b"),
          expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * (users_a + users_b) *
                 CAST(conv_a * (users_b - conv_b) -
                      conv_b * (users_a - conv_a) AS DECIMAL(38,0)) *
                 CAST(conv_a * (users_b - conv_b) -
                      conv_b * (users_a - conv_a) AS DECIMAL(38,0)))
                div (CAST(users_a AS DECIMAL(38,0)) * users_b *
                     (conv_a + conv_b) *
                     (users_a + users_b - conv_a - conv_b)) AS BIGINT)"""))
          .as("chi2_micro"))
  }

  def transitionMatrix(events: DataFrame, userCol: String = "user_id",
                       tsCol: String = "ts", idCol: String = "event_id",
                       typeCol: String = "event_type"): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(unix_micros(col(tsCol)), col(idCol))
    transitionAgg(events
      .select(col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull))
  }

  /** K-STEP PATH MINING: every window of `steps` consecutive events in
    * a user's timeline becomes one `a>b>c` path string, counted across
    * users — the "common journeys" view one order up from
    * [[transitionMatrix]] (which is `steps` = 2 before normalization).
    * The caller ranks/limits; the path grammar (`>`-joined types) keeps
    * the output a plain string column.
    *
    * Scale shape: the `steps - 1` leads share ONE window spec, so the
    * plan pays a single event-log exchange on the user key and stacks
    * the leads over it; the aggregate collapses to at most
    * |types|^steps rows.
    */
  def pathMining(events: DataFrame, steps: Int = 3,
                 userCol: String = "user_id", tsCol: String = "ts",
                 idCol: String = "event_id",
                 typeCol: String = "event_type"): DataFrame = {
    require(steps >= 2, "a path needs at least two steps")
    val w = Window.partitionBy(col(userCol))
      .orderBy(unix_micros(col(tsCol)), col(idCol))
    val legs = (1 until steps).map(i => lead(col(typeCol), i).over(w))
    // concat (not concat_ws): null legs must null the whole path, and
    // the LAST leg being non-null implies all earlier legs are too
    // (lead(i) has a row wherever lead(i+1) does)
    val path = concat((col(typeCol) +: legs.flatMap(l =>
      Seq(lit(">"), l))): _*)
    events
      .select(path.as("path"), legs.last.isNotNull.as("__full"))
      .filter(col("__full"))
      .groupBy("path")
      .agg(count(lit(1)).as("n"))
  }

  /** The aggregation tail of [[transitionMatrix]] over an already-built
    * (from_type, to_type) pair frame — shared with the streaming twin
    * ([[graft.streaming.StreamingOps.streamingTransitions]]), whose
    * stateful fold emits the pairs instead of a lead window.
    */
  def transitionAgg(pairs: DataFrame): DataFrame =
    pairs
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total",
        sum("n").over(Window.partitionBy("from_type")))
      .withColumn("p_bp", expr("(10000 * n) div row_total"))
      .select("from_type", "to_type", "n", "p_bp")
}
