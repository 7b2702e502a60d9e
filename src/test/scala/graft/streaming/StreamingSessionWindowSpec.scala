package graft.streaming

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two edge semantics `q_stream_session`'s oracle depends on,
  * with crafted data the fixtures never exercise (verified: zero
  * exact-gap inter-event deltas and zero sessions ending exactly at
  * max-ts in sf0.001/0.01/0.1):
  *
  *  1. GAP BOUNDARY — an event exactly `gap` after its predecessor
  *     still MERGES into the session: Spark coalesces per-event
  *     [ts, ts+gap) windows when they overlap OR touch, so a new
  *     session starts only when the inter-event gap strictly EXCEEDS
  *     the gap duration — the same strict-`>` rule as the batch
  *     `StreamingOps.sessionize` fold.
  *  2. EMISSION BOUNDARY — append mode emits a session once the
  *     watermark reaches its end (end <= watermark, 0-delay watermark =
  *     max event time); a session whose end is exactly the watermark IS
  *     emitted, one still inside the gap horizon is held in state.
  *
  * Plus the fixture-level equivalence: the emitted set equals the batch
  * gap-fold with the same `end <= max_ts` emission filter.
  */
class StreamingSessionWindowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def craftedDir(rows: Seq[(Long, Long, Long)]): String =
    StreamFixtures.craftedEvents(spark,
      rows.map { case (id, user, offUs) => (id, user, offUs, "click") })

  test("gap boundary: an exactly-gap-after event merges (strict >); " +
      "emission boundary: end == watermark emits, open sessions hold") {
    val gapUs = 30L * 60 * 1000000
    // u1: two events exactly gap apart — touching windows merge, and the
    //     merged session's end (+60min) is exactly the final watermark;
    // u2: two events gap+1us apart — strictly past the gap, splits; the
    //     first split session (end +30m+1us) is behind the watermark;
    // u3: one event at +60min (sets the final watermark), session open
    val dir = craftedDir(Seq(
      (1L, 1L, 0L), (2L, 1L, gapUs),
      (3L, 2L, 0L), (4L, 2L, gapUs + 1),
      (5L, 3L, 2 * gapUs)))
    val out = StreamingOps.sessionWindowStats(spark, dir, gapMinutes = 30)
      .select("user_id", "n_events", "session_start", "session_end")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // u1 merges (1 session of 2, end == watermark → still emitted);
    // u2 splits — only its first session is emitted (second ends
    // +60min+1us, past the watermark → held); u3 held
    assert(out == Seq((1L, 2L), (2L, 1L)),
      s"observed (user, n_events): $out")
  }

  test("watermark granularity: Spark truncates max event time to MILLISECONDS " +
      "— a session ending in the final partial millisecond is held") {
    val gapUs = 30L * 60 * 1000000
    // u1: session end = +30min (whole ms, behind the watermark);
    // u2: session end = +60min+300µs — inside the final PARTIAL ms;
    // u3: event at +60min+500µs sets max event time (own session open).
    // A µs-granular watermark would emit u2; Spark's ms-truncated one
    // (EventTimeStats tracks milliseconds) must not.
    val dir = craftedDir(Seq(
      (1L, 1L, 0L),
      (2L, 2L, gapUs + 300),
      (3L, 3L, 2 * gapUs + 500)))
    val out = StreamingOps.sessionWindowStats(spark, dir, gapMinutes = 30)
      .select("user_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(out == Seq(1L), s"observed emitted users: $out")
  }

  test("parquet append sink == memory sink; a second drain with the same " +
      "checkpoint emits nothing new") {
    val dir = "/root/testdata/sf0.001"
    val sink = java.nio.file.Files.createTempDirectory("sess-sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sess-ckpt").toString
    val appended = StreamingOps
      .sessionWindowStatsAppend(spark, dir, gapMinutes = 30, sink, ckpt)
      .collect().map(_.toSeq.map(String.valueOf)).toSeq.sorted(
        Ordering.by((s: Seq[String]) => s.mkString("|")))
    val memory = StreamingOps.sessionWindowStats(spark, dir, gapMinutes = 30)
      .collect().map(_.toSeq.map(String.valueOf)).toSeq.sorted(
        Ordering.by((s: Seq[String]) => s.mkString("|")))
    assert(appended.nonEmpty)
    assert(appended == memory)
    // exactly-once across drains: the checkpoint remembers both the
    // processed file and the emitted state — a replay appends nothing
    val again = StreamingOps
      .sessionWindowStatsAppend(spark, dir, gapMinutes = 30, sink, ckpt)
      .collect()
    assert(again.length == appended.length)
  }

  test("fixture equivalence: emitted sessions == batch gap-fold filtered " +
      "by end <= max event time") {
    val dir = "/root/testdata/sf0.001"
    val gapUs = 30L * 60 * 1000000
    val streamed = StreamingOps.sessionWindowStats(spark, dir, gapMinutes = 30)
      .select("session_start", "session_end", "user_id", "n_events", "sum_value")
      .collect().map(_.toSeq).toSet

    val ev = Tables(spark, dir, "events")
    // the emission cutoff is the MILLISECOND-truncated max event time
    // (Spark's EventTimeStats granularity — pinned by the test above)
    val maxUs = ev.agg(max(unix_micros(col("ts")))).head().getLong(0) / 1000 * 1000
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us")
    val batch = ev.select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("value"))
      .withColumn("new_session",
        when(col("us") - lag(col("us"), 1).over(w) > gapUs ||
          lag(col("us"), 1).over(w).isNull, 1).otherwise(0))
      .withColumn("sid", sum("new_session")
        .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(timestamp_micros(min("us")).as("session_start"),
        timestamp_micros(max(col("us") + gapUs)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType)
          .as("sum_value"))
      .filter(unix_micros(col("session_end")) <= maxUs)
      .select("session_start", "session_end", "user_id", "n_events", "sum_value")
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
