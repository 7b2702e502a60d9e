package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Locale
import scala.jdk.CollectionConverters._
import graft.etl.{ChangeFeed, Scd1, Warehouse}
import org.apache.spark.sql.SparkSession

/** Scale evidence for the STREAMED change-log path ([[CdcProbe]] covers
  * the diff itself): on an sf-scaled padded dim ([[DimFixture]]), two
  * delta merges produce two committed transitions, then this measures
  *
  *  - `materializeLog`: catch-up seconds and the log's size relative
  *    to the dim — the "consumers read churn, not snapshots" claim as
  *    bytes;
  *  - `changeFeedReplica`: one catch-up drain folding BOTH transitions
  *    into one net merge, vs the naive full-overwrite refresh of the
  *    same replica — seconds and physically-written bytes (hard-linked
  *    carry-over files don't count: nlink > 1);
  *  - `compactLog`: fold seconds and net-vs-raw row ratio.
  *
  * Equality checks run before (and are excluded from) every timing,
  * per the CdcProbe methodology note. One JSON line for SCALING_r9.txt.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/testdata/sf1 runMain graft.CdcTailProbe
  */
object CdcTailProbe {

  /** Parquet DATA files only (no _SUCCESS markers, no data-skipping
    * sidecars) — the same population DimMergeProbe measures, so the
    * two probes' byte ratios are commensurable. `linkedDontCount`
    * additionally drops hard-linked carry-over files (nlink > 1),
    * isolating physically-written bytes.
    */
  private def dirBytes(dir: String, linkedDontCount: Boolean): Long = {
    val st = Files.walk(Paths.get(dir))
    try st.iterator().asScala
      .filter(f => Files.isRegularFile(f) &&
        f.getFileName.toString.endsWith(".parquet") &&
        (!linkedDontCount ||
          Files.getAttribute(f, "unix:nlink")
            .asInstanceOf[Number].longValue() <= 1))
      .map(Files.size).sum
    finally st.close()
  }

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val nBuckets = sys.env.getOrElse("SPARK_GRAFT_BUCKETS", "256").toInt
    val updMod = sys.env.getOrElse("SPARK_GRAFT_UPDMOD", "10007").toInt
    val delMod = sys.env.getOrElse("SPARK_GRAFT_DELMOD", "20011").toInt
    val updMod2 = sys.env.getOrElse("SPARK_GRAFT_UPDMOD2", "30013").toInt
    val delMod2 = sys.env.getOrElse("SPARK_GRAFT_DELMOD2", "40031").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import DimFixture.{Dim, cmp, keys, ts1}
    val root = Files.createTempDirectory("cdc-tail").toString
    val src = new Warehouse(spark, root, schemas = Map(Dim -> DimFixture.schema),
      partitionSpec = Map.empty, bucketSpec = Map(Dim -> ("id", nBuckets)))
    locally {
      val t = src.begin(); t.overwrite(Dim, DimFixture.seed(spark, dir)); t.commit()
    }
    val vA = src.versions().last
    def mergeDelta(uM: Int, dM: Int): Unit = {
      val snap = DimFixture.snapshot(spark, dir, uM, dM)
      val txn = src.begin()
      val touched = Scd1.changedKeyBuckets(txn.read(Dim), snap, keys, cmp,
        nBuckets, deletesVisible = true)
      val inT = Scd1.inBuckets(keys, nBuckets, touched.toIndexedSeq)
      txn.overwriteBuckets(Dim,
        Scd1.mergeAudit(txn.read(Dim).filter(inT), snap.filter(inT), keys, cmp, ts1),
        touched.toIndexedSeq)
      txn.commit()
    }
    mergeDelta(updMod, delMod)
    mergeDelta(updMod2, delMod2)
    val dimRows = src.read(Dim).count()
    val dimBytes = dirBytes(src.catalog()(Dim).head, linkedDontCount = false)

    // 1. log catch-up: two transitions in one call
    val logDir = Files.createTempDirectory("cdc-tail-log").toString
    val (logged, matSecs) = time(ChangeFeed.materializeLog(src, Dim, keys, logDir))
    require(logged.length == 2, s"expected 2 transitions, logged $logged")
    val logSch = ChangeFeed.logSchema(DimFixture.schema, keys)
    val logRows = spark.read.schema(logSch)
      .parquet(ChangeFeed.logGlob(logDir)).count()
    val logBytes = dirBytes(logDir, linkedDontCount = false)

    // 2. replica catch-up (net fold + one bucket-pruned merge) vs the
    // naive full refresh — both land the identical final image
    def mkReplica(): Warehouse = {
      val wh = new Warehouse(spark,
        Files.createTempDirectory("cdc-tail-rep").toString,
        schemas = Map(Dim -> DimFixture.schema), partitionSpec = Map.empty,
        bucketSpec = Map(Dim -> ("id", nBuckets)))
      val t = wh.begin(); t.overwrite(Dim, src.readAsOf(Dim, vA)); t.commit()
      wh
    }
    val replica = mkReplica()
    val (_, repSecs) = time {
      graft.streaming.StreamingOps.changeFeedReplica(spark, replica, Dim,
        keys, logDir, Files.createTempDirectory("cdc-tail-ckpt").toString)
    }
    require(replica.read(Dim).exceptAll(src.read(Dim)).isEmpty &&
      src.read(Dim).exceptAll(replica.read(Dim)).isEmpty,
      "replica diverged from the source")
    val repWritten = dirBytes(replica.catalog()(Dim).head, linkedDontCount = true)
    val full = mkReplica()
    val (_, fullSecs) = time {
      val t = full.begin(); t.overwrite(Dim, src.read(Dim)); t.commit()
    }
    val fullWritten = dirBytes(full.catalog()(Dim).head, linkedDontCount = true)

    // 3. compaction: both transitions fold to the net v1→v3 delta
    val compDir = Files.createTempDirectory("cdc-tail-comp").toString + "/log"
    val (_, compSecs) = time {
      ChangeFeed.compactLog(spark, logDir, compDir, logSch, keys, logged.max)
    }
    val netRows = spark.read.schema(logSch)
      .parquet(ChangeFeed.logGlob(compDir)).count()

    def f2(d: Double): String = String.format(Locale.ROOT, "%.2f", Double.box(d))
    println(s"""{"metric":"cdc_tail","buckets":$nBuckets,""" +
      s""""dim_rows":$dimRows,"dim_bytes":$dimBytes,""" +
      s""""log_rows":$logRows,"log_bytes":$logBytes,""" +
      s""""materialize_secs":${f2(matSecs)},""" +
      s""""replica_catchup_secs":${f2(repSecs)},""" +
      s""""replica_written_bytes":$repWritten,""" +
      s""""full_refresh_secs":${f2(fullSecs)},""" +
      s""""full_written_bytes":$fullWritten,""" +
      s""""compact_secs":${f2(compSecs)},"net_rows":$netRows}""")
    spark.stop()
  }
}
