package graft.streaming

import java.nio.file.Files
import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming daily-anomaly twin equals the batch operator: on the
  * whole corpus in one micro-batch, and across a batch split where a
  * DAY's events straddle the boundary (complete-mode state must merge
  * the two partial counts into one daily row, not emit two).
  */
class StreamingAnomalySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("ts", TimestampType), StructField("event_type", StringType)))

  private def stream(dir: String, maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n)).parquet(dir)
  }

  private def rows(df: DataFrame): Set[(String, String, Long, Long, Long, String)] =
    df.collect().map(r => (r.getDate(0).toString, r.getString(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))).toSet

  test("single batch over the testdata events == batch dailyAnomaly") {
    val dir = Files.createTempDirectory("sanom1").toString + "/events"
    graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .select("ts", "event_type")
      .coalesce(1).write.parquet(dir)
    val streamed = StreamingOps.streamingDailyAnomalyFrom(stream(dir))
    val batch = graft.operators.EventAnalytics.dailyAnomaly(
      spark.read.parquet(dir))
    assert(rows(streamed) == rows(batch))
    assert(streamed.count() > 0)
  }

  test("a day split across two batches merges into one count") {
    val dir = Files.createTempDirectory("sanom2").toString
    def ev(d: String, sec: Int, et: String) =
      (java.sql.Timestamp.valueOf(s"$d 00:00:%02d".format(sec)), et)
    // day 1 fully in f1; day 2 split 2+3 across f1/f2; day 3 in f2.
    // counts must read 4, 5, 1 — a per-batch append would read day 2
    // twice (2 and 3) and poison the trailing median.
    val f1 = Seq(ev("2024-01-01", 0, "click"), ev("2024-01-01", 1, "click"),
      ev("2024-01-01", 2, "click"), ev("2024-01-01", 3, "click"),
      ev("2024-01-02", 0, "click"), ev("2024-01-02", 1, "click"))
    val f2 = Seq(ev("2024-01-02", 2, "click"), ev("2024-01-02", 3, "click"),
      ev("2024-01-02", 4, "click"), ev("2024-01-03", 0, "click"))
    f1.toDF("ts", "event_type").coalesce(1).write.parquet(s"$dir/f1")
    f2.toDF("ts", "event_type").coalesce(1).write.parquet(s"$dir/f2")
    val streamed = StreamingOps.streamingDailyAnomalyFrom(
      stream(s"$dir/*/", maxFilesPerTrigger = Some(1)))
    val all = (f1 ++ f2).toDF("ts", "event_type")
    val batch = graft.operators.EventAnalytics.dailyAnomaly(all)
    assert(rows(streamed) == rows(batch))
    // day 2 specifically: one row, n = 5, baseline med2 = 2*4 from day 1
    val d2 = rows(streamed).filter(_._1 == "2024-01-02")
    assert(d2 == Set(("2024-01-02", "click", 5L, 8L, 12500L, "normal")))
  }

  test("streaming top-k: counts accumulate across batches, ties break by user") {
    val dir = Files.createTempDirectory("stopk").toString
    val uschema = StructType(Seq(StructField("user_id", LongType)))
    def f(users: Long*) = users.toDF("user_id")
    // u1: 2+2 across batches = 4; u2: 3 in one batch; u3: 1+2 = 3
    // top-2 must read (u1,4),(u2,3) — the u2/u3 tie breaks to lower id,
    // and a per-batch append would leave u1 at 2, behind u2
    f(1L, 1L, 2L, 2L, 2L, 3L).coalesce(1).write.parquet(s"$dir/f1")
    f(1L, 1L, 3L, 3L).coalesce(1).write.parquet(s"$dir/f2")
    val stream = spark.readStream.schema(uschema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/*/")
    val got = StreamingOps.streamingTopKFrom(stream, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 4L), (2L, 3L)))
  }
}
