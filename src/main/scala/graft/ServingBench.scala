package graft

import java.nio.file.Files
import java.sql.Timestamp
import graft.etl.{ResultCache, Warehouse}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Serving-layer latency probe (round-9, VERDICT item 8): `q_serving`
  * proves the cache path's CORRECTNESS; this main gives the serving
  * claim a NUMBER. A dashboard-style aggregate over a warehouse fact
  * is issued repeatedly through [[ResultCache.through]]; the probe
  * reports the cold miss (evaluate + store + read-back), the hit-path
  * latency distribution (key derivation + stored-parquet scan — the
  * repeated-point-read case), and the uncached latency of the same
  * query for contrast. Every sample forces the plan with `.count()`,
  * so a hit's number is a full job over the stored result, not a
  * plan-build time.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.ServingBench
  */
object ServingBench {
  private val schema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  private def servingQuery(wh: Warehouse): DataFrame =
    wh.read("facts").groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("total"))

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-serving-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val wh = new Warehouse(spark, Files.createTempDirectory("servebench").toString,
      Map("facts" -> schema), partitionSpec = Map.empty, bucketSpec = Map.empty)
    locally {
      val t = wh.begin()
      t.append("facts", spark.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority"))
      t.commit()
    }
    // warm-up: session + codegen + file listing outside the samples
    wh.read("facts").count()

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val cold = time(ResultCache.through(wh, servingQuery(wh)).count())
    require(ResultCache.wouldHit(wh, servingQuery(wh)), "entry must be stored")

    val hits = (1 to 50).map { _ =>
      time(ResultCache.through(wh, servingQuery(wh)).count())
    }.sorted
    val direct = (1 to 5).map(_ => time(servingQuery(wh).count())).min

    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    def pct(p: Double) = hits(math.min(hits.size - 1, (p * hits.size).toInt))
    println(s"""{"probe":"serving_latency","sf":"$dir","rows":${wh.read("facts").count()},""" +
      s""""cold_miss_secs":${f(cold)},"hit_min_secs":${f(hits.head)},""" +
      s""""hit_p50_secs":${f(pct(0.5))},"hit_p95_secs":${f(pct(0.95))},""" +
      s""""direct_min_secs":${f(direct)},"n_hits":${hits.size}}""")
    spark.stop()
  }
}
