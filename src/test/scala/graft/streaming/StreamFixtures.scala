package graft.streaming

import java.nio.file.{Files, Path}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Shared crafted-events builder for the streaming boundary specs: one
  * definition of the events schema and the single-FILE layout
  * (`events.parquet` — the name eventsStream's pathGlobFilter expects),
  * so a fixture-shape change edits every crafted test at once.
  */
object StreamFixtures {
  /** 2025-01-01 00:00:00 UTC, micros. */
  val t0Us = 1735689600000000L

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Write `(event_id, user_id, offsetMicros, event_type)` rows as a
    * dir holding a single file named events.parquet; returns the dir.
    */
  def craftedEvents(spark: SparkSession,
                    rows: Seq[(Long, Long, Long, String)]): String = {
    val dir = Files.createTempDirectory("crafted-events")
    val stage = Files.createTempDirectory("crafted-stage")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, user, offUs, tpe) =>
        Row(id,
          java.sql.Timestamp.from(java.time.Instant.EPOCH
            .plus(java.time.Duration.ofNanos((t0Us + offUs) * 1000))),
          user, tpe, 1.0, "{}")
      }, 1), schema)
    df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val st = Files.list(stage)
    val part = try st.filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    finally st.close()
    Files.move(part, dir.resolve("events.parquet"))
    // the stage dir is spent; reclaim it rather than accumulating per test
    val st2 = Files.list(stage)
    try st2.forEach((p: Path) => Files.deleteIfExists(p)) finally st2.close()
    Files.deleteIfExists(stage)
    dir.toString
  }
}
