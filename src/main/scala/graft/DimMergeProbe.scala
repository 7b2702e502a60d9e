package graft

import java.nio.file.{Files, Path, Paths}
import java.sql.Timestamp
import graft.etl.{Scd1, Warehouse}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Scale evidence for SURVEY §4's one owned constraint: "avoid full-dim
  * rewrites per run". [[Scd1.changedKeyBuckets]] + `overwriteBuckets`
  * prune the nightly SCD1 merge to the key-hash buckets that actually
  * contain an insert/update/delete; everything else hard-links into the
  * new immutable dir. This main MEASURES that claim at an sf1-sized dim
  * (~1.5M rows, padded to realistic row width): the same ~1% churn
  * merges twice — once through the partial path, once as a full-dim
  * overwrite — and the JSON line reports seconds and NEWLY WRITTEN
  * bytes for each. The interesting number at 100 TB is the byte ratio:
  * with 64 buckets and 1% daily churn essentially every bucket contains
  * SOME changed key, so the write shrinks only ~0-30% at this bucket
  * count — the probe also runs a 1024-bucket layout, where the same
  * churn leaves most buckets untouched, to show the knob that makes the
  * ratio approach the churn rate. (Bucket count is a per-table layout
  * choice: a 100 TB dim runs thousands of buckets, not 64.)
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/testdata/sf1 runMain graft.DimMergeProbe
  */
object DimMergeProbe {
  private val Dim = "dim_big"
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

  /** The day-1 dim image from sf orders: one row per order, padded to
    * ~190 B so bytes-written numbers mean something.
    */
  private def seed(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders").select(
      col("o_orderkey").as("id"),
      col("o_orderstatus").as("status"),
      col("o_orderpriority").as("priority"),
      rpad(concat_ws("|", col("o_orderkey"), col("o_custkey"),
        col("o_totalprice")), 160, "x").as("payload"),
      lit(ts0).as("create_dt"),
      lit(null).cast(TimestampType).as("update_dt"))

  /** Day-2 snapshot: ~1% updates (payload flip), 0.1% deletes, 0.1%
    * inserts — the reference pipeline's realistic nightly churn shape.
    */
  private def snapshot(s: SparkSession, dir: String): DataFrame = {
    val base = seed(s, dir).filter(col("id") % 1000 =!= 3)
    val churned = base.withColumn("payload",
        when(col("id") % 100 === 7, concat(lit("UPD|"), col("payload")))
          .otherwise(col("payload")))
      .withColumn("update_dt",
        when(col("id") % 100 === 7, lit(ts1)).otherwise(col("update_dt")))
    val inserts = Tables(s, dir, "orders")
      .filter(col("o_orderkey") % 1000 === 5)
      .select((col("o_orderkey") + lit(1000000000L)).as("id"),
        col("o_orderstatus").as("status"),
        col("o_orderpriority").as("priority"),
        rpad(lit("NEW"), 160, "y").as("payload"),
        lit(ts1).as("create_dt"),
        lit(null).cast(TimestampType).as("update_dt"))
    churned.unionByName(inserts)
  }

  /** Recursive parquet-file listing with the stream CLOSED (fd hygiene
    * at 1024-bucket dirs).
    */
  private def parquetFiles(dir: String): Seq[Path] = {
    val st = Files.walk(Paths.get(dir))
    try st.iterator().asScala
      .filter(f => Files.isRegularFile(f) &&
        f.getFileName.toString.endsWith(".parquet")).toSeq
    finally st.close()
  }

  private def dirBytes(dir: String): Long = parquetFiles(dir).map(Files.size).sum

  /** One (bucketCount → measurements) cell: seed, churn, merge both
    * ways, report seconds + new bytes.
    */
  private def run(spark: SparkSession, dir: String, nBuckets: Int): String = {
    val snap = snapshot(spark, dir)

    // ---- partial path
    val rootP = Files.createTempDirectory(s"dmp-part-$nBuckets").toString
    val whP = new Warehouse(spark, rootP, schemas = Map(Dim -> schema),
      partitionSpec = Map.empty, bucketSpec = Map(Dim -> ("id", nBuckets)))
    locally {
      val t = whP.begin(); t.overwrite(Dim, seed(spark, dir)); t.commit()
    }
    val oldDir = whP.catalog()(Dim).head
    val oldNames = parquetFiles(oldDir).map(_.getFileName.toString).toSet
    val tP0 = System.nanoTime()
    val txn = whP.begin()
    val touched = Scd1.changedKeyBuckets(txn.read(Dim), snap, keys, cmp,
      nBuckets, deletesVisible = true)
    val inT = Scd1.inBuckets(keys, nBuckets, touched.toIndexedSeq)
    txn.overwriteBuckets(Dim,
      Scd1.mergeAudit(txn.read(Dim).filter(inT), snap.filter(inT), keys, cmp, ts1),
      touched.toIndexedSeq)
    txn.commit()
    val partialSecs = (System.nanoTime() - tP0) / 1e9
    val newDir = whP.catalog()(Dim).head
    val newBytes = parquetFiles(newDir)
      .filterNot(f => oldNames.contains(f.getFileName.toString))
      .map(Files.size).sum
    val nRows = whP.read(Dim).count()

    // ---- full-overwrite path (fresh root, same seed + churn)
    val rootF = Files.createTempDirectory(s"dmp-full-$nBuckets").toString
    val whF = new Warehouse(spark, rootF, schemas = Map(Dim -> schema),
      partitionSpec = Map.empty, bucketSpec = Map(Dim -> ("id", nBuckets)))
    locally {
      val t = whF.begin(); t.overwrite(Dim, seed(spark, dir)); t.commit()
    }
    val tF0 = System.nanoTime()
    val txf = whF.begin()
    txf.overwrite(Dim, Scd1.mergeAudit(txf.read(Dim), snap, keys, cmp, ts1))
    txf.commit()
    val fullSecs = (System.nanoTime() - tF0) / 1e9
    val fullBytes = dirBytes(whF.catalog()(Dim).head)

    // content identity: the partial path must produce the full merge
    require(whP.read(Dim).count() == whF.read(Dim).count(),
      "partial and full merges disagree on row count")

    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    s"""{"buckets":$nBuckets,"rows":$nRows,"touched":${touched.length},""" +
      s""""partial_secs":${f(partialSecs)},"partial_new_bytes":$newBytes,""" +
      s""""full_secs":${f(fullSecs)},"full_bytes":$fullBytes,""" +
      s""""bytes_ratio":${f(newBytes.toDouble / fullBytes)}}"""
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-dim-merge-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cells = Seq(64, 1024).map(n => run(spark, dir, n))
    println(s"""{"probe":"dim_merge_buckets","sf":"$dir","cells":[${cells.mkString(",")}]}""")
    spark.stop()
  }
}
