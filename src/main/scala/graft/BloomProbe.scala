package graft

import java.util.Locale
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for Bloom-filter file skipping: at sf1, lineitem
  * (~6M rows) hash-scattered into 64 files on l_partkey — the layout
  * every file's [l_orderkey min, max] spans, so min/max stats keep all
  * 64 files for a key lookup. The probe measures (a) the one-off index
  * build cost, (b) files opened and wall time for a batch of point
  * lookups through the stats-only index vs the bloom index. The claim
  * that survives the 1000× scale-up is the FILES ratio: a point probe
  * opens O(keys present) files instead of O(all files), and the probe
  * wall time follows it once I/O dominates. Correctness rides the same
  * path as q_bloom_skip/BloomSkippingSpec (no false negatives by
  * construction); equality is asserted here before the timings.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/testdata/sf1 runMain graft.BloomProbe
  */
object BloomProbe {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.DataSkipping

    val out = java.nio.file.Files.createTempDirectory("bloomprobe")
      .toString + "/lineitem"
    val li = Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
    li.repartition(64, col("l_partkey")).write.parquet(out)
    val rows = spark.read.parquet(out).count()
    DataSkipping.writeSidecar(spark, out)
    val schema = spark.read.parquet(out).schema

    // deterministic probe keys: 24 present orderkeys spread across the
    // range + 8 absent-in-range (orderkeys are sparse: not every long in
    // [min,max] is an order)
    val keyRows = spark.read.parquet(out)
      .select("l_orderkey").distinct()
      .orderBy("l_orderkey").collect().map(_.getLong(0))
    val present = (0 until 24).map(i => keyRows(i * (keyRows.length - 1) / 23))
    // absent keys must be IN-RANGE (beyond max, stats would prune too)
    val presentSet = keyRows.toSet
    val gaps = Iterator.iterate(keyRows.head + 1L)(_ + 7L)
      .filterNot(presentSet).take(8).toSeq

    val statsIdxFrame = DataSkipping.readWithIndex(spark, schema, Seq(out))
    val (buildRes, buildSecs) = time {
      DataSkipping.writeBloomSidecar(spark, out, Seq("l_orderkey"), mBits = 1L << 20)
    }
    val _ = buildRes
    val bloomIdxFrame = DataSkipping.readWithIndex(spark, schema, Seq(out))

    def probe(frame: (org.apache.spark.sql.DataFrame, DataSkipping.StatsFileIndex),
              keys: Seq[Long]): (Long, Long, Double) = {
      val (df, idx) = frame
      var files = 0L
      var got = 0L
      val (_, secs) = time {
        keys.foreach { k =>
          got += df.filter(col("l_orderkey") === k).count()
          files += idx.lastSelected
        }
      }
      (files, got, secs)
    }

    // equality first (also warms both file sets, de-biasing the timings)
    val allKeys = present ++ gaps
    val expect = allKeys.map(k =>
      spark.read.parquet(out).filter(col("l_orderkey") === k).count()).sum
    val (statsFiles, statsGot, statsSecs) = probe(statsIdxFrame, allKeys)
    val (bloomFiles, bloomGot, bloomSecs) = probe(bloomIdxFrame, allKeys)
    require(statsGot == expect && bloomGot == expect,
      s"row mismatch: plain=$expect stats=$statsGot bloom=$bloomGot")

    val sidecarBytes = java.nio.file.Files.size(
      java.nio.file.Paths.get(out, "_graft_bloom.tsv"))
    println(String.format(Locale.ROOT,
      """{"metric":"bloom_skip","rows":%d,"files":64,"probes":%d,"stats_files_opened":%d,"bloom_files_opened":%d,"stats_secs":%.2f,"bloom_secs":%.2f,"index_build_secs":%.2f,"sidecar_bytes":%d}""",
      Long.box(rows), Int.box(allKeys.length), Long.box(statsFiles),
      Long.box(bloomFiles), Double.box(statsSecs), Double.box(bloomSecs),
      Double.box(buildSecs), Long.box(sidecarBytes)))
    spark.stop()
  }
}
