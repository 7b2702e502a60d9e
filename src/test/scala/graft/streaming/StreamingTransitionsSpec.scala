package graft.streaming

import java.nio.file.Files
import scala.jdk.CollectionConverters._
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

  test("random (tsu,id)-ordered splits with timestamp ties == batch, 5 seeds") {
    // the equivalence contract says arrival order must respect the
    // (tsu, id) total order — so ANY split of the sorted sequence must
    // reproduce the batch matrix exactly, including ties straddling a
    // boundary (same tsu, consecutive ids in different batches)
    val types = Seq("view", "click", "purchase", "error")
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val events = (1 to 120).map { id =>
        // tsu drawn from a SMALL range to force plenty of ties
        (id.toLong, rnd.nextInt(8).toLong * 1000000L,
          rnd.nextInt(6).toLong, types(rnd.nextInt(types.size)))
      }
      val ordered = events.sortBy(e => (e._2, e._1))
      val cut1 = 1 + rnd.nextInt(118)
      val cut2 = cut1 + 1 + rnd.nextInt(119 - cut1)
      val dir = Files.createTempDirectory(s"strans-p$seed").toString
      Seq(ordered.slice(0, cut1), ordered.slice(cut1, cut2),
        ordered.slice(cut2, ordered.size)).zipWithIndex.foreach {
        case (chunk, i) =>
          chunk.map { case (id, us, user, et) =>
            (id, new java.sql.Timestamp(us / 1000), user, et)
          }.toDF("event_id", "ts", "user_id", "event_type")
            .coalesce(1).write.parquet(s"$dir/f$i")
          // pin mtime order on the part FILES (the source sorts files,
          // not dirs) so the triggers fire f0, f1, f2
          val walk = java.nio.file.Files.walk(
            java.nio.file.Paths.get(s"$dir/f$i"))
          try walk.iterator().asScala.foreach(p =>
            java.nio.file.Files.setLastModifiedTime(p,
              java.nio.file.attribute.FileTime.fromMillis(
                1000000L + i * 60000L)))
          finally walk.close()
      }
      val streamed = StreamingOps.streamingTransitionsFrom(
        stream(s"$dir/*/", maxFilesPerTrigger = Some(1)))
      val batch = graft.operators.EventAnalytics.transitionMatrix(
        events.map { case (id, us, user, et) =>
          (id, new java.sql.Timestamp(us / 1000), user, et)
        }.toDF("event_id", "ts", "user_id", "event_type"))
      assert(rows(streamed) == rows(batch), s"seed $seed diverged")
    }
  }
}
