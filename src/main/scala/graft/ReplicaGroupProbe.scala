package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import graft.etl.{ChangeFeed, Warehouse}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cost split for MULTI-TABLE group replication (the q_replica_group
  * scenario at probe scale): the bench headline for that query mostly
  * measures scenario SCAFFOLDING — source commits and change-log
  * builds — so this probe times each phase separately and compares the
  * replication step against the naive full-refresh of the same replica
  * (overwrite both tables from the source images), in seconds and in
  * physically-written bytes (hard-linked carry-over files don't count).
  *
  * Equality check (replica image == consistent v3 recompute on both
  * tables, full symmetric difference) runs before, and is excluded
  * from, the timings.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/testdata/sf1 runMain graft.ReplicaGroupProbe
  */
object ReplicaGroupProbe {
  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

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

    // base tables, full-size
    val c0 = Tables(spark, sfDir, "customer")
      .select("c_custkey", "c_name", "c_acctbal")
    val o0 = Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .filter(col("o_orderkey") % 5 === 0)

    def mkWh(tag: String, withMeta: Boolean) = new Warehouse(spark,
      Files.createTempDirectory(tag).toString,
      Map("cust" -> c0.schema, "ord" -> o0.schema) ++
        (if (withMeta) Map("cdc_meta" -> StructType(Seq(
          StructField("tbl", StringType), StructField("ver", LongType))))
         else Map.empty),
      partitionSpec = Map.empty,
      bucketSpec = Map("cust" -> ("c_custkey", 64), "ord" -> ("o_orderkey", 64)))

    def runScenario(label: String,
                    images: Seq[(org.apache.spark.sql.DataFrame,
                                 org.apache.spark.sql.DataFrame)]): String = {
      val (cF, oF) = images.last
      val (src, commitSecs) = time {
        val w = mkWh("rgp-src", withMeta = false)
        (Seq((c0, o0)) ++ images).foreach { case (c, o) =>
          val t = w.begin(); t.overwrite("cust", c); t.overwrite("ord", o); t.commit()
        }
        w
      }
      val cLog = Files.createTempDirectory("rgp-cl").toString
      val oLog = Files.createTempDirectory("rgp-ol").toString
      val (_, logSecs) = time {
        ChangeFeed.materializeLog(src, "cust", Seq("c_custkey"), cLog)
        ChangeFeed.materializeLog(src, "ord", Seq("o_orderkey"), oLog)
      }

      def seedReplica(tag: String) = {
        val w = mkWh(tag, withMeta = true)
        val t = w.begin(); t.overwrite("cust", c0); t.overwrite("ord", o0); t.commit()
        w
      }
      val group = Seq(ChangeFeed.GroupTable("cust", Seq("c_custkey"), cLog),
        ChangeFeed.GroupTable("ord", Seq("o_orderkey"), oLog))

      // correctness first (excluded from timing): replicate a throwaway
      // replica and symmetric-diff both tables against the final images
      locally {
        val w = seedReplica("rgp-check")
        ChangeFeed.replicateGroup(w, group, "cdc_meta")
        Seq(("cust", cF), ("ord", oF)).foreach { case (tbl, img) =>
          val got = w.read(tbl)
          require(got.exceptAll(img).isEmpty && img.exceptAll(got).isEmpty,
            s"[$label] replica $tbl != consistent final image")
        }
      }

      val replica = seedReplica("rgp-dst")
      val (applied, repSecs) = time(ChangeFeed.replicateGroup(replica, group, "cdc_meta"))
      val repBytes = dirBytes(replica.root, linkedDontCount = true)

      val naive = seedReplica("rgp-naive")
      val (_, naiveSecs) = time {
        val t = naive.begin()
        t.overwrite("cust", src.read("cust"))
        t.overwrite("ord", src.read("ord"))
        t.commit()
      }
      val naiveBytes = dirBytes(naive.root, linkedDontCount = true)
      val logBytes = dirBytes(cLog, linkedDontCount = false) +
        dirBytes(oLog, linkedDontCount = false)
      f"""{"scenario":"$label","applied_versions":${applied.values.map(_.size).sum},"commit_secs":$commitSecs%.2f,"log_build_secs":$logSecs%.2f,"replicate_secs":$repSecs%.2f,"naive_refresh_secs":$naiveSecs%.2f,"replicate_new_bytes":$repBytes,"naive_new_bytes":$naiveBytes,"log_bytes":$logBytes}"""
    }

    // scenario A: the q_replica_group shape — HEAVY churn (a tenth of
    // customers leave with their orders, a seventh re-balance, new
    // arrivals) — the regime where folding cannot beat a refresh
    val heavy = {
      val c2 = c0.filter(col("c_custkey") % 10 =!= 3)
        .withColumn("c_acctbal",
          when(col("c_custkey") % 7 === 0, col("c_acctbal") + 100.0)
            .otherwise(col("c_acctbal")))
      val o2 = o0.join(c2.select("c_custkey"),
        col("o_custkey") === col("c_custkey"), "left_semi")
      val c3 = c2.unionAll(c0.filter(col("c_custkey") % 13 === 0)
        .withColumn("c_custkey", col("c_custkey") + 30000000L))
      val o3 = o2.withColumn("o_totalprice",
          when(col("o_orderkey") % 9 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
        .unionAll(o0
          .filter(col("o_custkey") % 13 === 0 && col("o_orderkey") % 3 === 0)
          .select((col("o_orderkey") + 60000000L).as("o_orderkey"),
            (col("o_custkey") + 30000000L).as("o_custkey"),
            col("o_totalprice")))
      Seq((c2, o2), (c3, o3))
    }
    // scenario B: DELTA churn — ~100 keys per table per commit (the
    // nightly-feed regime the change-log path exists for)
    val nC = c0.count(); val nO = o0.count()
    val delta = {
      val c2 = c0.withColumn("c_acctbal",
        when(col("c_custkey") % (nC / 100) === 7, col("c_acctbal") + 1.0)
          .otherwise(col("c_acctbal")))
      val o2 = o0.withColumn("o_totalprice",
        when(col("o_orderkey") % (nO / 20) === 9, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
      val c3 = c2.withColumn("c_acctbal",
        when(col("c_custkey") % (nC / 100) === 13, col("c_acctbal") + 2.0)
          .otherwise(col("c_acctbal")))
      Seq((c2, o2), (c3, o2))
    }
    val cells = Seq(runScenario("heavy_churn", heavy),
      runScenario("delta_churn", delta))
    println(s"""{"probe":"replica_group_split","sf":"$sfDir","rows_cust":$nC,"rows_ord":$nO,"cells":[
${cells.mkString(",\n")}]}""")
    spark.stop()
  }
}
