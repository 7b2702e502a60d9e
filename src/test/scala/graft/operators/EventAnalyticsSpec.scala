package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the event-analytics operators: ordered-funnel
  * strictness (stage k counts only strictly after stage k-1), OLS
  * closed-form exactness on a perfect line, and TWAP's holding-time
  * weighting vs the plain average.
  */
class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: (String, Long, String)*) =
    rows.toSeq.toDF("user_id", "us", "event_type")
      .selectExpr("user_id", "timestamp_micros(us) AS ts", "event_type")

  test("sessionFunnel: the chain must complete inside one session") {
    def ev(id: Long, us: Long, user: Long, et: String) =
      (id, new java.sql.Timestamp(us / 1000), user, et)
    val gapUs = 30L * 60L * 1000000L
    // u1 session 1: view -> click -> purchase (full chain, one visit);
    // u1 session 2 (after the gap): purchase alone — must NOT count
    //   (its chain restarts; the user-level funnel WOULD credit it);
    // u2: view in session 1, click only after the gap — the click's
    //   session has no view, so stage 2 is never reached.
    val events = Seq(
      ev(1, 1000000L, 1, "view"), ev(2, 2000000L, 1, "click"),
      ev(3, 3000000L, 1, "purchase"),
      ev(4, 3000000L + gapUs + 1000000L, 1, "purchase"),
      ev(5, 1000000L, 2, "view"),
      ev(6, 1000000L + gapUs + 1000000L, 2, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = EventAnalytics.sessionFunnel(events,
        Seq("view", "click", "purchase"), gapMinutes = 30)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    // sessions: u1s1 (view+click+purchase), u1s2 (purchase), u2s1
    // (view), u2s2 (click) -> stage1: 2 sessions saw a view; stage2: 1;
    // stage3: 1
    assert(got == Map(1 -> 2L, 2 -> 1L, 3 -> 1L))
    // control: the USER-level funnel credits u2's cross-session click
    val userLevel = EventAnalytics.funnel(events,
        Seq("view", "click", "purchase"), "user_id", "ts", "event_type")
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(userLevel == Map(1 -> 2L, 2 -> 2L, 3 -> 1L))
  }

  test("funnel: stages count only strictly after the previous stage") {
    val events = ev(
      // u1 converts fully in order
      ("u1", 1000L, "view"), ("u1", 2000L, "click"), ("u1", 3000L, "purchase"),
      // u2 purchases BEFORE clicking: reaches stage 2 only
      ("u2", 1000L, "view"), ("u2", 1500L, "purchase"), ("u2", 2000L, "click"),
      // u3 clicks at the SAME timestamp as its view: strict > excludes it
      ("u3", 1000L, "view"), ("u3", 1000L, "click"),
      // u4 clicks with no view at all: reaches no stage
      ("u4", 1000L, "click"), ("u4", 2000L, "purchase"))
    val got = EventAnalytics
      .funnel(events, Seq("view", "click", "purchase"), "user_id", "ts", "event_type")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("funnel: an earlier-stage event AFTER a later one still opens the chain") {
    // view at t=5 is u's first view; the click at t=6 follows it -> stage 2,
    // even though a (non-qualifying) click already happened at t=1
    val events = ev(("u", 1L, "click"), ("u", 5L, "view"), ("u", 6L, "click"))
    val got = EventAnalytics
      .funnel(events, Seq("view", "click"), "user_id", "ts", "event_type")
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSeq
    assert(got == Seq((1, 1L), (2, 1L)))
  }

  test("olsFit recovers an exact line with r2 = 1; degenerate groups go null") {
    val pts = Seq.tabulate(20)(i => ("a", i.toDouble, 3.5 * i + 2.0)) ++
      Seq(("b", 4.0, 9.9)) ++                       // n = 1: no line
      Seq(("c", 2.0, 1.0), ("c", 2.0, 5.0))        // zero x-variance
    val df = pts.toDF("g", "x", "y")
    val rows = Stats.olsFit(df, Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toMap
    assert(rows("a") == ((20L, Some(3.5), Some(2.0), Some(1.0))))
    assert(rows("b") == ((1L, None, None, None)))
    assert(rows("c") == ((2L, None, None, None)))
  }

  test("timeWeightedAvg weighs by holding duration, not sample count") {
    // value 10 holds 1s, value 0 holds 9s, final observation drops out:
    // twa = (10*1e6 + 0*9e6) / 1e7 = 1.0 — a plain AVG would say 40/3
    val df = Seq(("u", 0L, 10.0), ("u", 1000000L, 0.0), ("u", 10000000L, 100.0))
      .toDF("user_id", "us", "value")
      .selectExpr("user_id", "monotonically_increasing_id() AS event_id",
        "timestamp_micros(us) AS ts", "value")
    val r = EventAnalytics
      .timeWeightedAvg(df, "user_id", "ts", "value", tieBreakCols = Seq("event_id"))
      .collect()
    assert(r.length == 1)
    assert(r.head.getDouble(1) == 1.0)
    assert(r.head.getLong(2) == 10000000L)
  }

  test("attribution: first/last/linear credit, window cutoff, tie semantics") {
    def evA(rows: (Long, Long, Long, String, Double)*) =
      rows.toSeq.toDF("event_id", "us", "user_id", "event_type", "value")
        .selectExpr("event_id", "timestamp_micros(us) AS ts", "user_id",
          "event_type", "value")
    val day = 86400L * 1000000L
    val events = evA(
      // u1: three touches then a 1.00 purchase — linear 100 div 3 = 33 each
      (1L, 1000L, 1L, "view", 0.0), (2L, 2000L, 1L, "click", 0.0),
      (3L, 3000L, 1L, "signup", 0.0), (4L, 4000L, 1L, "purchase", 1.0),
      // u2: view 8 days before the purchase (outside the 7-day window),
      // click AFTER it (no next conversion) — neither attributes
      (5L, 0L, 2L, "view", 0.0), (6L, 8L * day, 2L, "purchase", 1.0),
      (7L, 8L * day + 1L, 2L, "click", 0.0),
      // u3: click at the SAME micro as the purchase, smaller id — the
      // ROWS frame over (ts, id) DESC sees the purchase -> attributed
      (10L, 5000L, 3L, "click", 0.0), (11L, 5000L, 3L, "purchase", 2.0),
      // u4: click at the same micro but LARGER id than the purchase —
      // the frame does not reach it -> dropped
      (20L, 6000L, 4L, "purchase", 3.0), (21L, 6000L, 4L, "click", 0.0),
      // u5: two same-micro purchases collapse to the min-id one (4.00)
      (29L, 6500L, 5L, "view", 0.0),
      (30L, 7000L, 5L, "purchase", 4.0), (31L, 7000L, 5L, "purchase", 5.0),
      // u6: the view credits its NEAREST next purchase (1.00), not the 9.00
      (40L, 1000L, 6L, "view", 0.0), (41L, 2000L, 6L, "purchase", 1.0),
      (42L, 9000L, 6L, "purchase", 9.0))
    val got = EventAnalytics
      .attribution(events, Seq("click", "signup", "view"), "purchase")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    //                      n     first  last  linear
    assert(got("view") == ((3L, 600L, 500L, 533L)))
    assert(got("click") == ((2L, 200L, 200L, 233L)))
    assert(got("signup") == ((1L, 0L, 100L, 33L)))
    // conservation: first and last each distribute every attributed
    // conversion's cents exactly once (800 total); linear loses only
    // the integer-division remainder (u1's 100 -> 3x33)
    assert(got.values.map(_._2).sum == 800L)
    assert(got.values.map(_._3).sum == 800L)
    assert(got.values.map(_._4).sum == 799L)
  }

  test("dailyAnomaly: trailing-median baseline, half-integral medians exact") {
    // one type, 4 days with counts 10, 20, 10, 30: day1 has no trailing
    // frame and drops; day2 baseline med2=20; day3 trailing {10,20} ->
    // median 15 -> med2=30; day4 trailing {10,20,10} -> med2=20
    val rows = Seq((1, 10), (2, 20), (3, 10), (4, 30)).flatMap {
      case (d, n) => (1 to n).map(i =>
        (d.toLong * 1000000L + i, s"2024-03-0$d 12:00:00", "e"))
    }
    val events = rows.toDF("event_id", "s", "event_type")
      .selectExpr("event_id", "CAST(s AS TIMESTAMP) AS ts", "event_type")
    val got = EventAnalytics.dailyAnomaly(events, lookback = 7)
      .collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    assert(got == Map(
      "2024-03-02" -> ((20L, 20L, 20000L, "spike")),
      "2024-03-03" -> ((10L, 30L, 6666L, "normal")),
      "2024-03-04" -> ((30L, 20L, 30000L, "spike"))))
  }

  test("pathMining: sliding 3-windows per user, no cross-user paths") {
    val events = Seq(
      (1L, 1000L, 1L, "view"), (2L, 2000L, 1L, "click"),
      (3L, 3000L, 1L, "view"), (4L, 4000L, 1L, "purchase"),
      (10L, 1000L, 2L, "view"), (11L, 2000L, 2L, "click"))
      .toDF("event_id", "us", "user_id", "event_type")
      .selectExpr("event_id", "timestamp_micros(us) AS ts", "user_id",
        "event_type")
    val got = EventAnalytics.pathMining(events)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // u1's 4 events yield exactly 2 sliding trigrams; u2 has only 2
    // events -> no trigram, and no path bridges into u1's timeline
    assert(got == Map(
      "view>click>view" -> 1L, "click>view>purchase" -> 1L))
  }

  test("abTest: 2x2 chi-square in exact micro units") {
    // variant by uid parity: A = {0 converted, 2 not}, B = {1, 3 both
    // converted} -> a=1 b=1 c=2 d=0, N=4, chi2 = 4*(0-2)^2/(2*2*3*1)
    // = 4/3 -> 1333333 micro
    val events = Seq(
      (0L, "purchase"), (2L, "view"), (1L, "purchase"), (3L, "purchase"))
      .toDF("user_id", "event_type")
    val r = EventAnalytics.abTest(events, "purchase").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 1L, 2L, 2L)))
    assert((r.getLong(4), r.getLong(5), r.getLong(6)) ==
      ((5000L, 10000L, 1333333L)))
  }

  test("abTest: degenerate margins read null, no ANSI divide") {
    // every uid even -> variant B empty: cr_b and chi2 undefined -> null
    val oneSided = Seq((0L, "purchase"), (2L, "view"), (4L, "purchase"))
      .toDF("user_id", "event_type")
    val r1 = EventAnalytics.abTest(oneSided, "purchase").collect().head
    assert(r1.getLong(2) == 0L && r1.getLong(4) == 6666L &&
      r1.isNullAt(5) && r1.isNullAt(6))
    // both variants present but NOBODY converts -> rates 0, chi2 null
    // (zero conversion margin)
    val noConv = Seq((0L, "view"), (1L, "view"))
      .toDF("user_id", "event_type")
    val r2 = EventAnalytics.abTest(noConv, "purchase").collect().head
    assert(r2.getLong(4) == 0L && r2.getLong(5) == 0L && r2.isNullAt(6))
    // EVERYBODY converts -> rates 10000, chi2 null (zero non-conversion
    // margin)
    val allConv = Seq((0L, "purchase"), (1L, "purchase"))
      .toDF("user_id", "event_type")
    val r3 = EventAnalytics.abTest(allConv, "purchase").collect().head
    assert(r3.getLong(4) == 10000L && r3.getLong(5) == 10000L &&
      r3.isNullAt(6))
  }

  test("transitionMatrix: per-user consecutive pairs, row-normalized basis points") {
    val events = Seq(
      (1L, 1000L, 1L, "view"), (2L, 2000L, 1L, "click"),
      (3L, 3000L, 1L, "view"), (4L, 4000L, 1L, "purchase"),
      (10L, 1000L, 2L, "click"), (11L, 2000L, 2L, "view"))
      .toDF("event_id", "us", "user_id", "event_type")
      .selectExpr("event_id", "timestamp_micros(us) AS ts", "user_id",
        "event_type")
    val got = EventAnalytics.transitionMatrix(events)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // view row: 2 transitions split 1/1 -> 5000 bp each; click row: both
    // users go click->view -> 10000 bp; no cross-user pair (u2's click
    // never chains to u1's view)
    assert(got == Map(
      ("view", "click") -> ((1L, 5000L)),
      ("view", "purchase") -> ((1L, 5000L)),
      ("click", "view") -> ((2L, 10000L))))
  }
}
