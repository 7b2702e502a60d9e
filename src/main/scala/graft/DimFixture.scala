package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The padded sf-scaled dim fixture shared by the scale probes
  * ([[DimMergeProbe]], [[CdcProbe]]): one row per order, ~190 B wide so
  * bytes-written/bytes-scanned numbers mean something, plus the
  * delta-shaped day-2 snapshot whose `updMod`/`delMod` set the churn
  * scale. ONE definition — the probes' cross-references (the
  * `1 − exp(−c/B)` rewrite/prune law) are only comparable because they
  * run on the same fixture.
  */
private[graft] object DimFixture {
  val Dim = "dim_big"
  val ts0: Timestamp = Timestamp.valueOf("2021-03-01 00:00:00")
  val ts1: Timestamp = Timestamp.valueOf("2021-03-02 00:00:00")

  val schema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("status", StringType),
    StructField("priority", StringType),
    StructField("payload", StringType),
    StructField("create_dt", TimestampType),
    StructField("update_dt", TimestampType),
    StructField("processed_dt", TimestampType)))

  val keys: Seq[String] = Seq("id")
  val cmp: Seq[String] = Seq("status", "priority", "payload")

  /** The day-1 dim image from sf orders, padded to ~190 B rows. */
  def seed(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders").select(
      col("o_orderkey").as("id"),
      col("o_orderstatus").as("status"),
      col("o_orderpriority").as("priority"),
      rpad(concat_ws("|", col("o_orderkey"), col("o_custkey"),
        col("o_totalprice")), 160, "x").as("payload"),
      lit(ts0).as("create_dt"),
      lit(null).cast(TimestampType).as("update_dt"),
      lit(ts0).as("processed_dt"))

  /** Day-2 snapshot (no processed_dt — mergeAudit stamps it).
    * `updMod`/`delMod` set the churn scale: updates hit
    * `id % updMod == 7`, deletes `id % delMod == 3`, inserts
    * `delMod`-spaced fresh keys. `updMod == 0` means NO churn at all —
    * the snapshot equals the dim image (the skip-write fast path).
    */
  def snapshot(s: SparkSession, dir: String,
               updMod: Int, delMod: Int): DataFrame = {
    val base0 = seed(s, dir).drop("processed_dt")
    if (updMod == 0) return base0
    val base = base0.filter(col("id") % delMod =!= 3)
    val churned = base.withColumn("payload",
        when(col("id") % updMod === 7, concat(lit("UPD|"), col("payload")))
          .otherwise(col("payload")))
      .withColumn("update_dt",
        when(col("id") % updMod === 7, lit(ts1)).otherwise(col("update_dt")))
    val inserts = Tables(s, dir, "orders")
      .filter(col("o_orderkey") % delMod === 5)
      .select((col("o_orderkey") + lit(1000000000L)).as("id"),
        col("o_orderstatus").as("status"),
        col("o_orderpriority").as("priority"),
        rpad(lit("NEW"), 160, "y").as("payload"),
        lit(ts1).as("create_dt"),
        lit(null).cast(TimestampType).as("update_dt"))
    churned.unionByName(inserts)
  }
}
