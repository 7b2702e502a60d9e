package graft.streaming

import java.nio.file.Files
import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming transition matrix equals the batch operator: on the
  * whole corpus in one micro-batch, and across a time-ordered batch
  * split where a user's consecutive pair CROSSES the boundary (the
  * stored last event must bridge into the next batch's first).
  */
class StreamingTransitionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType)))

  private def stream(dir: String, maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n)).parquet(dir)
  }

  private def rows(df: DataFrame): Set[(String, String, Long, Long)] =
    df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet

  test("single batch over the testdata events == batch transitionMatrix") {
    val dir = Files.createTempDirectory("strans1").toString + "/events"
    graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "ts", "user_id", "event_type")
      .coalesce(1).write.parquet(dir)
    val streamed = StreamingOps.streamingTransitionsFrom(stream(dir))
    val batch = graft.operators.EventAnalytics.transitionMatrix(
      spark.read.parquet(dir))
    assert(rows(streamed) == rows(batch))
    assert(streamed.count() > 0)
  }

  test("pairs crossing a time-ordered batch boundary bridge through state") {
    val dir = Files.createTempDirectory("strans2").toString
    def ev(id: Long, us: Long, user: Long, et: String) =
      (id, new java.sql.Timestamp(us / 1000), user, et)
    // batch 1: u1 view->click, u2 view; batch 2: u1 purchase (bridges
    // from batch 1's click), u2 click (bridges from batch 1's view)
    val b1 = Seq(ev(1, 1000000L, 1, "view"), ev(2, 2000000L, 1, "click"),
      ev(3, 1000000L, 2, "view"))
    val b2 = Seq(ev(4, 5000000L, 1, "purchase"), ev(5, 5000000L, 2, "click"))
    b1.toDF("event_id", "ts", "user_id", "event_type")
      .coalesce(1).write.parquet(s"$dir/f1")
    b2.toDF("event_id", "ts", "user_id", "event_type")
      .coalesce(1).write.parquet(s"$dir/f2")
    // one file per trigger, oldest first (file mtime order) — f1 then f2
    val streamed = StreamingOps.streamingTransitionsFrom(
      stream(s"$dir/*/", maxFilesPerTrigger = Some(1)))
    val all = (b1 ++ b2).toDF("event_id", "ts", "user_id", "event_type")
    val batch = graft.operators.EventAnalytics.transitionMatrix(all)
    assert(rows(streamed) == rows(batch))
    // the bridge pairs specifically: click->purchase and view->click
    val got = rows(streamed).map(t => (t._1, t._2))
    assert(got.contains(("click", "purchase")) && got.contains(("view", "click")))
  }
}
