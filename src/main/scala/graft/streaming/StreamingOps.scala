package graft.streaming

import java.util.UUID
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured-Streaming operators over the events table.
  *
  * The reference is batch-only (SURVEY §2.9), but its drop-folder pattern
  * maps naturally onto a file-source stream with `Trigger.AvailableNow`.
  * This module provides that path: a real `readStream` → windowed
  * aggregation → sink pipeline that, driven to completion, produces the
  * same result a batch query would — which is exactly what the DuckDB
  * oracle checks.
  *
  * At scale this runs unchanged as a continuous job: the file source
  * discovers new daily drops, the tumbling window aggregates with
  * watermark-bounded state, and the memory sink becomes a parquet/Kafka
  * sink.
  */
object StreamingOps {

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // TIMESTAMP(NANOS) read as raw nanos
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling 1-hour windowed counts and sums per event type, computed by
    * an actual streaming query driven to completion with AvailableNow.
    */
  def hourlyEventStats(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val name = "stream_" + UUID.randomUUID().toString.replace("-", "")
    val stream = spark.readStream
      .schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet") // the sf dir holds all tables
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("sum_value"))
    val q = stream.writeStream
      .format("memory").queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Sessionization via stateful streaming: gaps > `gapMinutes` split a
    * user's events into sessions. Implemented with the batch-equivalent
    * window expression here (deterministic, oracle-checkable); the
    * streaming form is `groupByKey(user).flatMapGroupsWithState` with a
    * processing-time timeout carrying the same fold.
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_seq",
        sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("event_id"), col("user_id"), col("ts"), col("session_seq"))
  }
}
