package graft.streaming

import graft.{Tables, TestSpark}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

case class Ev(user_id: Long, event_id: Long, tus: Long)
case class SessionOut(user_id: Long, event_id: Long, session_seq: Long)

object StreamingSpec {
  /** True streaming sessionizer: state = (last event time, session
    * counter) per user. Top-level so the closure serializes without
    * dragging the test class (and its SparkSession) along.
    */
  def sessionFn(gapUs: Long)(
      user: Long, events: Iterator[Ev],
      state: GroupState[(Long, Long)]): Iterator[SessionOut] = {
    var (lastT, seq) = state.getOption.getOrElse((Long.MinValue, 0L))
    val out = events.toSeq.sortBy(e => (e.tus, e.event_id)).map { e =>
      if (lastT == Long.MinValue || e.tus - lastT > gapUs) seq += 1
      lastT = e.tus
      SessionOut(user, e.event_id, seq)
    }
    state.update((lastT, seq))
    out.iterator
  }
}

/** Streaming semantics: the AvailableNow windowed agg must equal the
  * batch computation, and a genuine stateful
  * `flatMapGroupsWithState` sessionizer must agree with the batch
  * window-expression form in `StreamingOps.sessionize`.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming windowed agg equals batch tumbling-window agg") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingOps.hourlyEventStats(spark, dir)
      .collect().map(_.toSeq).toSet
    val batch = Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n_events"), col("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stream-stream time-bounded join equals the batch join") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingOps.clickPurchaseStreamJoin(spark, dir)
      .collect().map(_.toSeq).toSet
    val ev = Tables(spark, dir, "events")
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts".as("click_ts"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("p_user"),
        $"ts".as("purchase_ts"), $"value".as("purchase_value"))
    val batch = clicks.join(purchases,
        $"user_id" === $"p_user" &&
          $"purchase_ts" >= $"click_ts" - expr("INTERVAL 1 HOUR") &&
          $"purchase_ts" <= $"click_ts")
      .select("click_id", "user_id", "click_ts", "purchase_id", "purchase_ts",
        "purchase_value")
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("append-mode parquet sink emits exactly the watermark-expired windows") {
    val dir = "/root/testdata/sf0.001"
    val sink = java.nio.file.Files.createTempDirectory("stream-sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("stream-ckpt").toString
    val appended = StreamingOps.hourlyEventStatsAppend(spark, dir, sink, ckpt)
      .collect().map(_.toSeq).toSet

    val batch = Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("window.start").as("bucket"), col("window.end").as("wend"),
        col("event_type"), col("n_events"), col("sum_value"))
      .collect()
    // final watermark after AvailableNow drains = max(ts) - 1 hour; only
    // windows whose end is at or before it are finalized and written
    val maxTs = Tables(spark, dir, "events").agg(max("ts")).head().getTimestamp(0)
    val watermarkMs = maxTs.getTime - 3600 * 1000L
    val expired = batch.filter(_.getTimestamp(1).getTime <= watermarkMs)
      .map(r => Seq(r.get(0), r.get(2), r.get(3), r.get(4))).toSet
    val unexpired = batch.map(_.toSeq).length - expired.size

    assert(appended.nonEmpty)
    assert(appended == expired,
      s"append sink (${appended.size}) != expired batch windows (${expired.size})")
    assert(unexpired > 0, "test vacuous: every window expired")
  }

  test("append sink with no expired windows returns an empty typed frame") {
    // all events inside one hour -> final watermark (max ts - 1h) never
    // passes any window end -> the parquet sink holds zero data files;
    // the explicit-schema read must return empty, not throw on inference
    val srcDir = java.nio.file.Files.createTempDirectory("stream-esrc")
    val hourNs = 3600L * 1000 * 1000 * 1000
    val tmp = java.nio.file.Files.createTempDirectory("stream-etmp").toString
    Seq((1L, hourNs + 1000L, 1L, "click", 1.0, "{}"),
        (2L, hourNs + 2000L, 2L, "click", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp)).iterator()
    var moved = false
    while (part.hasNext && !moved) {
      val p = part.next()
      if (p.getFileName.toString.endsWith(".parquet")) {
        java.nio.file.Files.copy(p, srcDir.resolve("events.parquet"))
        moved = true
      }
    }
    assert(moved, "no part file written")
    val sink = java.nio.file.Files.createTempDirectory("stream-esink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("stream-eckpt").toString
    val out = StreamingOps.hourlyEventStatsAppend(spark, srcDir.toString, sink, ckpt)
    assert(out.columns.toSeq == Seq("bucket", "event_type", "n_events", "sum_value"))
    assert(out.count() == 0L)
  }

  test("flatMapGroupsWithState sessionizer agrees with the batch fold") {
    val dir = "/root/testdata/sf0.001"
    val events = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      .as[Ev]

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(events.collect().toIndexedSeq)
    val gapUs = 30L * 60 * 1000000
    val q = mem.toDS().groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        StreamingSpec.sessionFn(gapUs))
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("sess_out")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = StreamingOps.sessionize(Tables(spark, dir, "events"), 30)
      .collect().map(r => (r.getLong(1), r.getLong(0)) -> r.getLong(3)).toMap
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
