package graft.streaming

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime
import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming funnel equals the batch funnel: on the whole corpus in
  * one micro-batch, and across a time-ordered batch split where user
  * journeys CROSS the boundary (view in batch 1, click/purchase in
  * batch 2 — the state must carry).
  */
class StreamingFunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val stages = Seq("view", "click", "purchase")
  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType)))

  private def stream(dir: String, maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n)).parquet(dir)
  }

  private def rows(df: DataFrame): Set[(Long, Option[Long], Option[Long], Option[Long])] =
    df.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getLong(1)),
      if (r.isNullAt(2)) None else Some(r.getLong(2)),
      if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet

  test("single batch over the testdata events == batch funnelUsers") {
    val dir = Files.createTempDirectory("sfunnel1").toString + "/events"
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "ts", "user_id", "event_type")
    ev.coalesce(1).write.parquet(dir)
    val streamed = StreamingOps.streamingFunnelUsers(stream(dir), stages)
    val batch = graft.operators.EventAnalytics.funnelUsers(
        spark.read.parquet(dir), stages, "user_id", "ts", "event_type")
      // batch emits every user; the stream emits only users who reached
      // stage 1 (others never change state) — restrict to comparable rows
      .filter(col("u0").isNotNull)
    assert(rows(streamed) == rows(batch))
    assert(streamed.count() > 0)
  }

  test("journeys crossing a time-ordered batch boundary carry state") {
    val dir = Files.createTempDirectory("sfunnel2").toString
    def ev(id: Long, us: Long, user: Long, et: String) =
      (id, new java.sql.Timestamp(us / 1000), user, et)
    // batch 1 (early): u1 views; u2 views+clicks; u3 clicks (no view)
    val b1 = Seq(ev(1, 1000000L, 1, "view"), ev(2, 1000000L, 2, "view"),
      ev(3, 2000000L, 2, "click"), ev(4, 1000000L, 3, "click"))
    // batch 2 (late): u1 clicks then purchases; u2 purchases; u3 purchases
    val b2 = Seq(ev(5, 5000000L, 1, "click"), ev(6, 6000000L, 1, "purchase"),
      ev(7, 5000000L, 2, "purchase"), ev(8, 5000000L, 3, "purchase"))
    b1.toDF("event_id", "ts", "user_id", "event_type")
      .coalesce(1).write.parquet(s"$dir/f1")
    b2.toDF("event_id", "ts", "user_id", "event_type")
      .coalesce(1).write.parquet(s"$dir/f2")
    // glob the part files into one source dir with mod times enforcing order
    val src = Files.createTempDirectory("sfunnel2src").toString
    def mv(from: String, name: String, t: Long): Unit = {
      val part = Files.list(Paths.get(from)).iterator()
      var p: java.nio.file.Path = null
      while (part.hasNext) { val c = part.next()
        if (c.getFileName.toString.endsWith(".parquet")) p = c }
      val dst = Paths.get(src, name)
      Files.copy(p, dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(t))
    }
    mv(s"$dir/f1", "b1.parquet", 1000000L)
    mv(s"$dir/f2", "b2.parquet", 2000000L)

    val streamed = StreamingOps.streamingFunnelUsers(
      stream(src, maxFilesPerTrigger = Some(1)), stages)
    val batch = graft.operators.EventAnalytics.funnelUsers(
        spark.read.parquet(src), stages, "user_id", "ts", "event_type")
      .filter(col("u0").isNotNull)
    assert(rows(streamed) == rows(batch))
    // the cross-boundary conversions specifically
    assert(rows(streamed) == Set(
      (1L, Some(1000000L), Some(5000000L), Some(6000000L)),
      (2L, Some(1000000L), Some(2000000L), Some(5000000L))))
  }
}
