package graft

import java.nio.file.{Files, Path, Paths}
import graft.etl.{Scd1, Warehouse}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Scale evidence for SURVEY §4's one owned constraint: "avoid full-dim
  * rewrites per run". [[Scd1.changedKeyBuckets]] + `overwriteBuckets`
  * prune the nightly SCD1 merge to the key-hash buckets that actually
  * contain an insert/update/delete; everything else hard-links into the
  * new immutable dir. This main MEASURES that claim at an sf1-sized dim
  * (~1.5M rows, padded to realistic row width): the same ~1% churn
  * merges twice — once through the partial path, once as a full-dim
  * overwrite — and the JSON line reports seconds and NEWLY WRITTEN
  * bytes for each, across a churn spectrum. The governing law: with
  * `c` uniformly-hashed changed keys and `B` buckets, the expected
  * rewrite fraction is `1 − exp(−c/B)` ≈ `c/B` for `c ≪ B`. So the
  * pruning pays exactly where the reference pipeline lives — nightly
  * runs whose delta is small against the dim (a zero-change run writes
  * NOTHING; a ~100-key delta rewrites ~`100/B` of the bytes) — while
  * uniform 1%%-of-1.5M churn saturates every bucket at any practical
  * `B` and honestly degenerates to a full rewrite plus link overhead.
  * At a 100 TB dim the same law holds with B in the thousands: the
  * knob to size is B vs the EXPECTED daily delta, not the dim.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/testdata/sf1 runMain graft.DimMergeProbe
  */
object DimMergeProbe {
  // fixture shared with CdcProbe — ONE definition (DimFixture)
  private val Dim = DimFixture.Dim
  private val ts1 = DimFixture.ts1
  private val schema = DimFixture.schema
  private val keys = DimFixture.keys
  private val cmp = DimFixture.cmp

  private def seed(s: SparkSession, dir: String): DataFrame =
    DimFixture.seed(s, dir)

  private def snapshot(s: SparkSession, dir: String,
                       updMod: Int, delMod: Int): DataFrame =
    DimFixture.snapshot(s, dir, updMod, delMod)

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

  /** One (bucketCount × churn) cell: seed, churn, merge both ways,
    * report seconds + NEWLY WRITTEN bytes. The partial path mirrors
    * Pipeline exactly, including the `touched.isEmpty → no write` fast
    * path a zero-change run takes.
    */
  private def run(spark: SparkSession, dir: String, nBuckets: Int,
                  churn: String, updMod: Int, delMod: Int): String = {
    val snap = snapshot(spark, dir, updMod, delMod)

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
    if (touched.nonEmpty) {
      val inT = Scd1.inBuckets(keys, nBuckets, touched.toIndexedSeq)
      txn.overwriteBuckets(Dim,
        Scd1.mergeAudit(txn.read(Dim).filter(inT), snap.filter(inT), keys, cmp, ts1),
        touched.toIndexedSeq)
    }
    txn.commit()
    val partialSecs = (System.nanoTime() - tP0) / 1e9
    val newDir = whP.catalog()(Dim).head
    val newBytes =
      if (newDir == oldDir) 0L
      else parquetFiles(newDir)
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

    // content identity: the partial path must produce the full merge —
    // FULL symmetric-difference compare (a stale carried-over payload
    // would keep cardinality identical; a count check proves nothing)
    require(whP.read(Dim).exceptAll(whF.read(Dim)).isEmpty &&
      whF.read(Dim).exceptAll(whP.read(Dim)).isEmpty,
      "partial and full merges disagree on content")

    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    s"""{"churn":"$churn","buckets":$nBuckets,"rows":$nRows,""" +
      s""""touched":${touched.length},""" +
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
    // churn spectrum at sf1 (1.5M-row dim): zero-change run (the skip
    // path), a delta-sized run (~100 changed keys — the reference's
    // nightly shape), and uniform 1% churn (15k keys — saturates every
    // bucket at any practical count; the honest upper bound).
    val cells = Seq(
      ("none", 1024, 0, 0),
      ("delta100", 64, 15000, 150000),
      ("delta100", 1024, 15000, 150000),
      ("pct1", 1024, 100, 1000)
    ).map { case (churn, n, u, d) => run(spark, dir, n, churn, u, d) }
    println(s"""{"probe":"dim_merge_buckets","sf":"$dir","cells":[${cells.mkString(",")}]}""")
    spark.stop()
  }
}
