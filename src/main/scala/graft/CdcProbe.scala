package graft

import java.nio.file.{Files, Paths}
import java.util.Locale
import graft.etl.{ChangeFeed, Scd1, Warehouse}
import org.apache.spark.sql.SparkSession

/** Scale evidence for the pruned change feed: after a delta-sized SCD1
  * merge on a bucketed dim, `ChangeFeed.tableChangesPruned` must read
  * ~`touched/B` of the dim's files while the full diff reads both
  * whole versions — same answer, churn-proportional cost. This main
  * measures both paths on an sf1-sized dim ([[DimFixture]], the same
  * padded fixture DimMergeProbe runs on, so the two probes' `1 −
  * exp(−c/B)` readings are comparable) and prints one JSON line for
  * SCALING_r9.txt.
  *
  * Methodology: the change-set equality check (symmetric exceptAll)
  * runs FIRST — it both proves the two paths agree and warms the page
  * cache for BOTH file sets, so the timed counts that follow compare
  * warm reads to warm reads instead of crediting whichever path runs
  * second with the other's cache fill.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/testdata/sf1 runMain graft.CdcProbe
  */
object CdcProbe {

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

    import DimFixture.{Dim, cmp, keys, ts1}
    val root = Files.createTempDirectory("cdc-probe").toString
    val wh = new Warehouse(spark, root, schemas = Map(Dim -> DimFixture.schema),
      partitionSpec = Map.empty, bucketSpec = Map(Dim -> ("id", nBuckets)))
    locally {
      val t = wh.begin(); t.overwrite(Dim, DimFixture.seed(spark, dir)); t.commit()
    }
    val vA = wh.versions().last
    val snap = DimFixture.snapshot(spark, dir, updMod, delMod)
    val txn = wh.begin()
    val touched = Scd1.changedKeyBuckets(txn.read(Dim), snap, keys, cmp,
      nBuckets, deletesVisible = true)
    val inT = Scd1.inBuckets(keys, nBuckets, touched.toIndexedSeq)
    txn.overwriteBuckets(Dim,
      Scd1.mergeAudit(txn.read(Dim).filter(inT), snap.filter(inT), keys, cmp, ts1),
      touched.toIndexedSeq)
    txn.commit()
    val vB = wh.versions().last

    val full = ChangeFeed.tableChanges(wh, Dim, vA, vB, keys)
    val pruned = ChangeFeed.tableChangesPruned(wh, Dim, vA, vB, keys)
    // equality first (honesty + warms both file sets for the timings)
    val diffRows = pruned.exceptAll(full).count() + full.exceptAll(pruned).count()
    require(diffRows == 0L, s"pruned and full diffs disagree on $diffRows rows")
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (nFull, sFull) = time(full.count())
    val (nPruned, sPruned) = time(pruned.count())
    val fFull = full.inputFiles
    val fPruned = pruned.inputFiles
    def f2(d: Double): String = String.format(Locale.ROOT, "%.2f", Double.box(d))
    println(s"""{"metric":"cdc_prune","buckets":$nBuckets,""" +
      s""""touched_buckets":${touched.length},"changes":$nFull,""" +
      s""""changes_pruned":$nPruned,"full_secs":${f2(sFull)},""" +
      s""""pruned_secs":${f2(sPruned)},""" +
      s""""full_files":${fFull.length},"pruned_files":${fPruned.length},""" +
      s""""full_bytes":${bytesOf(fFull.toIndexedSeq)},""" +
      s""""pruned_bytes":${bytesOf(fPruned.toIndexedSeq)}}""")
    spark.stop()
  }
}
