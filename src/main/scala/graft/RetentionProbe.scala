package graft

import java.nio.file.Files
import graft.etl.{ChangeFeed, Warehouse}
import graft.streaming.StreamingOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cost split for the q_stream_retention scenario (r12 verdict item 3:
  * at 7.2 s it became the bench's heaviest entry with its scaffolding-
  * vs-logic split ASSERTED, not measured). Reproduces the gated
  * scenario phase by phase — source commits + change-log builds,
  * ledgered-peer setup and catch-up, the two streamed drains — in two
  * cells: `retained` (changeFeedReplicaRetained, retention + vacuum in
  * the consume loop) and `plain` (changeFeedReplica on an identical
  * scenario, no retention), so the drain-time delta isolates the
  * retention/vacuum logic from micro-batch + commit scaffolding.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.RetentionProbe
  */
object RetentionProbe {
  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  // the q_stream_retention source transitions (MiscQueries.cdfV2/V3)
  private def v2Of(c: DataFrame): DataFrame =
    c.filter(col("c_custkey") % 10 =!= 3)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 7 === 0, col("c_acctbal") + 100.0)
          .otherwise(col("c_acctbal")))
      .unionAll(c.filter(col("c_custkey") % 13 === 0)
        .withColumn("c_custkey", col("c_custkey") + 10000000L))

  private def v3Of(v2: DataFrame): DataFrame =
    v2.filter(col("c_custkey") % 11 =!= 5)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 9 === 0, col("c_acctbal") - 50.0)
          .otherwise(col("c_acctbal")))
      .unionAll(v2.filter(col("c_custkey") % 17 === 0)
        .withColumn("c_custkey", col("c_custkey") + 20000000L))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val c = Tables(spark, sfDir, "customer")
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    val v2 = v2Of(c)
    val v3 = v3Of(v2)
    val metaSchema = StructType(Seq(
      StructField("tbl", StringType), StructField("ver", LongType)))

    def mkWh(tag: String, withMeta: Boolean) = new Warehouse(spark,
      Files.createTempDirectory(tag).toString,
      Map("cust" -> c.schema) ++
        (if (withMeta) Map("meta" -> metaSchema) else Map.empty),
      partitionSpec = Map.empty,
      bucketSpec = Map("cust" -> ("c_custkey", 8)))

    def cell(tag: String, retained: Boolean): String = {
      val (src, tCommit) = time {
        val w = mkWh(s"rp-$tag-src", withMeta = false)
        Seq(c, v2, v3).foreach { img =>
          val t = w.begin(); t.overwrite("cust", img); t.commit()
        }
        w
      }
      val logDir = Files.createTempDirectory(s"rp-$tag-log").toString
      val (_, tLog) = time(
        ChangeFeed.materializeLog(src, "cust", Seq("c_custkey"), logDir))
      val versions = src.versions()
      require(versions.length == 3,
        s"retention probe scaffold expects the 3 commits it just made, " +
          s"got ${versions.length}: $versions")
      val ver2 = versions(1)
      val group = Seq(ChangeFeed.GroupTable("cust", Seq("c_custkey"), logDir))
      val (peer, tPeer) = time {
        val w = mkWh(s"rp-$tag-peer", withMeta = true)
        val t = w.begin(); t.overwrite("cust", c); t.commit()
        ChangeFeed.replicateGroup(w, group, "meta", throughVersion = Some(ver2))
        ChangeFeed.ReplicaFrontier(w, "meta", "cust")
      }
      val rep = mkWh(s"rp-$tag-rep", withMeta = false)
      locally { val t = rep.begin(); t.overwrite("cust", c); t.commit() }
      val ckpt = Files.createTempDirectory(s"rp-$tag-ckpt").toString
      def drain(): Unit =
        if (retained)
          StreamingOps.changeFeedReplicaRetained(spark, rep, "cust",
            Seq("c_custkey"), logDir, ckpt, Seq(peer))
        else
          StreamingOps.changeFeedReplica(spark, rep, "cust",
            Seq("c_custkey"), logDir, ckpt)
      val (_, tDrain1) = time(drain())
      // full circle: restore v1, log it, catch the peer up, drain again
      val (_, tRestore) = time {
        val t = src.begin(); t.overwrite("cust", c); t.commit()
        ChangeFeed.materializeLog(src, "cust", Seq("c_custkey"), logDir)
      }
      val (_, tCatchup) = time(ChangeFeed.replicateGroup(peer.replica, group, "meta"))
      val (_, tDrain2) = time(drain())
      val nRows = rep.read("cust").count()
      val scaffolding = tCommit + tLog + tPeer + tRestore + tCatchup
      f"""{"cell":"$tag","commit_secs":$tCommit%.2f,"log_secs":$tLog%.2f,"peer_secs":$tPeer%.2f,"drain1_secs":$tDrain1%.2f,"restore_secs":$tRestore%.2f,"catchup_secs":$tCatchup%.2f,"drain2_secs":$tDrain2%.2f,"scaffolding_secs":$scaffolding%.2f,"drain_total_secs":${tDrain1 + tDrain2}%.2f,"replica_rows":$nRows}"""
    }

    // warm-up (JIT + codegen for the whole chain), then measured cells
    cell("warmup", retained = true)
    val cells = Seq(cell("retained", retained = true),
      cell("plain", retained = false))
    println(s"""{"probe":"stream_retention_cost","sf":"$sfDir","cells":[
${cells.mkString(",\n")}]}""")
    spark.stop()
  }
}
