package graft.etl

import java.nio.file.{Files, Path, Paths}
import java.sql.Timestamp
import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** SCD2 in the Warehouse's two-table layout: the three-day scenario from
  * Scd2Spec replayed through `mergeWarehouse`, plus the layout's three
  * scale properties — closed versions are append-only (files never
  * rewritten), the current-slice merge is bucket-pruned with zero
  * current-side Exchange, and a no-change load writes nothing.
  */
class Scd2WarehouseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val t1 = Timestamp.valueOf("2024-01-01 00:00:00")
  private val t2 = Timestamp.valueOf("2024-01-02 00:00:00")
  private val t3 = Timestamp.valueOf("2024-01-03 00:00:00")

  private val curSchema = StructType(Seq(
    StructField("k", StringType), StructField("a", StringType),
    StructField("b", IntegerType), StructField("valid_from", TimestampType)))
  private val closedSchema = StructType(curSchema.fields :+
    StructField("valid_to", TimestampType))

  private def mkWh(root: String) = new Warehouse(spark, root,
    Map("scd2_current" -> curSchema, "scd2_closed" -> closedSchema),
    partitionSpec = Map.empty,
    bucketSpec = Map("scd2_current" -> ("k", 4)))

  private def snap(rows: Seq[(String, Option[String], Option[Int])]): DataFrame =
    rows.toDF("k", "a", "b")

  private val day1 = Seq(
    ("k1", Some("x"), Some(1)), ("k2", Some("y"), Some(2)),
    ("k3", Some("z"), Some(3)), ("k4", None: Option[String], Some(4)))
  private val day2 = Seq(
    ("k1", Some("x"), Some(1)), ("k2", Some("y"), Some(20)),
    ("k4", Some("w"), Some(4)), ("k5", Some("new"), None: Option[Int]))
  private val day3 = Seq(
    ("k1", Some("x"), Some(1)), ("k2", Some("y"), Some(20)),
    ("k3", Some("z2"), Some(3)), ("k4", Some("w"), Some(4)),
    ("k5", Some("new"), None: Option[Int]))

  private def merge(wh: Warehouse, rows: Seq[(String, Option[String], Option[Int])],
                    at: Timestamp): Unit =
    Scd2.mergeWarehouse(wh, "scd2_current", "scd2_closed", snap(rows),
      Seq("k"), Seq("a", "b"), at)

  private def histRows(wh: Warehouse) =
    Scd2.readHistory(wh, "scd2_current", "scd2_closed").collect()
      .map(r => (r.getString(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5))).toSet

  private def parquetFiles(dir: String): Map[String, Long] =
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
      .map(p => p.getFileName.toString -> Files.getLastModifiedTime(p).toMillis)
      .toMap

  test("three-day replay matches the DataFrame merge's history exactly") {
    val wh = mkWh(Files.createTempDirectory("wh-scd2").toString)
    merge(wh, day1, t1); merge(wh, day2, t2); merge(wh, day3, t3)
    val expected = Set(
      ("k1", Some("x"), Some(1), t1, None, true),
      ("k2", Some("y"), Some(2), t1, Some(t2), false),
      ("k2", Some("y"), Some(20), t2, None, true),
      ("k3", Some("z"), Some(3), t1, Some(t2), false),
      ("k3", Some("z2"), Some(3), t3, None, true),
      ("k4", None, Some(4), t1, Some(t2), false),
      ("k4", Some("w"), Some(4), t2, None, true),
      ("k5", Some("new"), None, t2, None, true))
    assert(histRows(wh) == expected, s"got ${histRows(wh)}")
  }

  test("closed versions are append-only; a no-change load writes nothing") {
    val wh = mkWh(Files.createTempDirectory("wh-scd2-app").toString)
    merge(wh, day1, t1); merge(wh, day2, t2)
    val closedDirs2 = wh.catalog()("scd2_closed")
    val files2 = closedDirs2.map(d => d -> parquetFiles(d)).toMap
    val catalog2 = wh.catalog()

    // day 3 only appends a new closed dir; every existing file untouched
    merge(wh, day3, t3)
    val closedDirs3 = wh.catalog()("scd2_closed")
    assert(closedDirs3.startsWith(closedDirs2), "closed dirs must be append-only")
    closedDirs2.foreach { d =>
      assert(parquetFiles(d) == files2(d), s"closed dir $d was modified")
    }

    // replaying day 3 (identical snapshot) must not touch the catalog
    val catalog3 = wh.catalog()
    merge(wh, day3, t3)
    assert(wh.catalog() == catalog3, "a no-change load must write nothing")
    assert(catalog3 != catalog2)
  }

  test("changesBetweenWarehouse: net-effect CDC with interval filters pushed into both scans") {
    val wh = mkWh(Files.createTempDirectory("wh-scd2-cdc").toString)
    merge(wh, day1, t1); merge(wh, day2, t2); merge(wh, day3, t3)

    // net effect t1 -> t3: k2/k3/k4 updated (k3's t2 delete + t3 revival
    // collapses to an update), k5 inserted, k1 silent
    val feed = Scd2.changesBetweenWarehouse(wh, "scd2_current", "scd2_closed",
      Seq("k"), t1, t3)
    val got = feed.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("k2", "update"), ("k3", "update"),
      ("k4", "update"), ("k5", "insert")), s"got $got")

    // and the window predicates reach the parquet scans (visible in the
    // scans' DataFilters — the PushedFilters rendering truncates): the
    // closed table is read under valid_from AND valid_to bounds, never
    // in full
    val plan = feed.queryExecution.executedPlan.toString
    assert(plan.contains("valid_from") && plan.contains("<= 2024-01-01 00:00:00"),
      s"valid_from bound not pushed:\n${plan.take(2000)}")
    assert(plan.contains("isnull(valid_to"),
      "valid_to interval disjunction not pushed to the closed-table scan")
  }

  test("current-slice merge: bucket-pruned scan, zero current-side Exchange") {
    val wh = mkWh(Files.createTempDirectory("wh-scd2-plan").toString)
    merge(wh, (1 to 40).map(i => (f"k$i%03d", Some(s"v$i"), Some(i))), t1)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // change one key: detection must prune to its bucket only, and the
      // merge join must not exchange the current side
      val s2 = snap((1 to 40).map(i =>
        (f"k$i%03d", Some(if (i == 7) "CHANGED" else s"v$i"), Some(i))))
      val txn = wh.begin()
      val cur = txn.read("scd2_current")
      val touched = Scd1.changedKeyBuckets(cur, s2, Seq("k"), Seq("a", "b"), 4,
        deletesVisible = true)
      assert(touched.length == 1, s"one changed key must touch one bucket: ${touched.toSeq}")

      val d = cur.withColumn("__dexists", lit(1)).alias("d")
      val s = s2.withColumn("__sexists", lit(1)).alias("s")
      val joined = s.join(d, col("s.k") === col("d.k"), "full")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"),
        s"current side should be a bucketed scan:\n$plan")
      assert("Exchange".r.findAllIn(plan).size == 1,
        s"expected exactly ONE exchange (snapshot side only):\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
