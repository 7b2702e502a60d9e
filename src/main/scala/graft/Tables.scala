package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated TPC-H-ish parquet fixtures
  * (`TESTDATA.md`): one parquet directory per table under
  * `/root/testdata/sf{0.001,0.01,0.1}/`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` is physically TIMESTAMP(NANOS) parquet, which Spark's
    * vectorized reader rejects outright. Read nanos as long and truncate
    * to microsecond timestamps — the same floor-truncation DuckDB applies,
    * so oracle comparisons agree.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      // `div` = integral division; `/` would go through DOUBLE and lose
      // precision above 2^53 (epoch-ns values are ~1.7e18).
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
