package graft

import java.nio.file.{Files, Path, Paths}
import java.sql.Timestamp
import graft.etl.{ChangeFeed, Scd1, Warehouse}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Scale evidence for the pruned change feed: after a delta-sized SCD1
  * merge on a bucketed dim, `ChangeFeed.tableChangesPruned` must read
  * ~`touched/B` of the dim's files while the full diff reads both
  * whole versions — same answer, churn-proportional cost. This main
  * measures both paths on an sf1-sized dim (~1.5M rows, padded rows)
  * and prints one JSON line for SCALING_r9.txt.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/testdata/sf1 runMain graft.CdcProbe
  */
object CdcProbe {
  private val Dim = "dim_cdc"
  private val ts0 = Timestamp.valueOf("2021-03-01 00:00:00")
  private val ts1 = Timestamp.valueOf("2021-03-02 00:00:00")

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("status", StringType),
    StructField("priority", StringType),
    StructField("payload", StringType),
    StructField("create_dt", TimestampType),
    StructField("update_dt", TimestampType),
    StructField("processed_dt", TimestampType)))

  private val keys = Seq("id")
  private val cmp = Seq("status", "priority", "payload")

  private def seed(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders").select(
      col("o_orderkey").as("id"),
      col("o_orderstatus").as("status"),
      col("o_orderpriority").as("priority"),
      rpad(concat_ws("|", col("o_orderkey"), col("o_custkey"),
        col("o_totalprice")), 160, "x").as("payload"),
      lit(ts0).as("create_dt"),
      lit(null).cast(TimestampType).as("update_dt"),
      lit(ts0).as("processed_dt"))

  /** Delta-shaped day-2 snapshot; `updMod`/`delMod` set the churn scale
    * (keys hash-spread over buckets, so touched ≈ B·(1−exp(−c/B)) —
    * the DimMergeProbe law governs the prune ratio too).
    */
  private def snapshot(s: SparkSession, dir: String,
                       updMod: Int, delMod: Int): DataFrame =
    seed(s, dir).drop("processed_dt")
      .filter(col("id") % delMod =!= 3)
      .withColumn("payload",
        when(col("id") % updMod === 7, concat(lit("UPD|"), col("payload")))
          .otherwise(col("payload")))
      .withColumn("update_dt",
        when(col("id") % updMod === 7, lit(ts1)).otherwise(col("update_dt")))

  private def bytesOf(paths: Seq[String]): Long =
    paths.map(p => Files.size(Paths.get(p.stripPrefix("file:")))).sum

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val nBuckets = sys.env.getOrElse("SPARK_GRAFT_BUCKETS", "256").toInt
    val updMod = sys.env.getOrElse("SPARK_GRAFT_UPDMOD", "10007").toInt
    val delMod = sys.env.getOrElse("SPARK_GRAFT_DELMOD", "20011").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = Files.createTempDirectory("cdc-probe").toString
    val wh = new Warehouse(spark, root, schemas = Map(Dim -> schema),
      partitionSpec = Map.empty, bucketSpec = Map(Dim -> ("id", nBuckets)))
    locally {
      val t = wh.begin(); t.overwrite(Dim, seed(spark, dir)); t.commit()
    }
    val vA = wh.versions().last
    val snap = snapshot(spark, dir, updMod, delMod)
    val txn = wh.begin()
    val touched = Scd1.changedKeyBuckets(txn.read(Dim), snap, keys, cmp,
      nBuckets, deletesVisible = true)
    val inT = Scd1.inBuckets(keys, nBuckets, touched.toIndexedSeq)
    txn.overwriteBuckets(Dim,
      Scd1.mergeAudit(txn.read(Dim).filter(inT), snap.filter(inT), keys, cmp, ts1),
      touched.toIndexedSeq)
    txn.commit()
    val vB = wh.versions().last

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val full = ChangeFeed.tableChanges(wh, Dim, vA, vB, keys)
    val pruned = ChangeFeed.tableChangesPruned(wh, Dim, vA, vB, keys)
    val (nFull, sFull) = time(full.count())
    val (nPruned, sPruned) = time(pruned.count())
    // honesty: identical change sets, not just equal counts
    val diffRows = pruned.exceptAll(full).count() + full.exceptAll(pruned).count()
    require(diffRows == 0L, s"pruned and full diffs disagree on $diffRows rows")
    val fFull = full.inputFiles
    val fPruned = pruned.inputFiles
    println(s"""{"metric":"cdc_prune","buckets":$nBuckets,""" +
      s""""touched_buckets":${touched.length},"changes":$nFull,""" +
      s""""changes_pruned":$nPruned,"full_secs":${f"$sFull%.2f"},""" +
      s""""pruned_secs":${f"$sPruned%.2f"},""" +
      s""""full_files":${fFull.length},"pruned_files":${fPruned.length},""" +
      s""""full_bytes":${bytesOf(fFull.toIndexedSeq)},""" +
      s""""pruned_bytes":${bytesOf(fPruned.toIndexedSeq)}}""")
    spark.stop()
  }
}
