package graft.etl

import java.nio.file.Files
import graft.TestSpark
import graft.operators.MaterializedAgg
import graft.operators.MaterializedAgg.{Count => MCount, Measure}
import graft.plans.MvRewrite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The one-stop serving read: MV routing active, skip-scan reads,
  * result-cache admission — and the documented identity contract
  * (cache key fixed at analysis time, so routing never affects it).
  */
class ServingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(StructField("g", StringType),
    StructField("v", LongType)))

  private def freshWh() = new Warehouse(spark,
    Files.createTempDirectory("serving").toString,
    Map("t" -> schema, "u" -> schema),
    partitionSpec = Map.empty, bucketSpec = Map.empty)

  private def load(wh: Warehouse, rows: Seq[(String, Long)]): Unit = {
    val t = wh.begin(); t.append("t", rows.toDF("g", "v")); t.commit()
  }

  test("routing fires inside the serving read, and the cached identity survives deregistration") {
    val wh = freshWh()
    load(wh, (1 to 90).map(i => (s"g${i % 3}", i.toLong)))
    // POISONED view (counts shifted by +1000): if the serving read
    // routes, the shift is visible in its output — a detector for the
    // rewrite actually firing through this entry point, not a
    // correctness statement (MvRewriteSpec owns that)
    val t = wh.begin()
    t.overwrite("u", MaterializedAgg.aggregate(wh.read("t"), Seq("g"),
        Seq(Measure("n", lit(1), MCount)))
      .select(col("g"), (col("n") + 1000L).cast(LongType).as("v")))
    t.commit()
    MvRewrite.registerWarehouse(wh, "t", "u", Seq("g"),
      Seq(MvRewrite.MeasureSig("v", "count", None)))
    try {
      val r1 = Serving.read(wh)(read =>
        read("t").groupBy("g").agg(count(lit(1)).as("v")))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(r1 == Map("g0" -> 1030L, "g1" -> 1030L, "g2" -> 1030L),
        s"poisoned counts prove the view was scanned: $r1")
      assert(spark.experimental.extraOptimizations.isEmpty,
        "optimizer state must be restored")
    } finally MvRewrite.clear()
    // view deregistered: the SAME question still hits the entry the
    // routed evaluation admitted — the key is the analyzed plan over
    // base paths, fixed before the optimizer ever saw the query
    val r2frame = Serving.read(wh)(read =>
      read("t").groupBy("g").agg(count(lit(1)).as("v")))
    assert(r2frame.queryExecution.executedPlan.toString.contains("_cache"),
      "second serving read must come from the cache")
    val r2 = r2frame.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(r2("g0") == 1030L, "cached routed result served")
  }

  test("uncovered query runs against base through skip-scan reads; commit invalidates") {
    val wh = freshWh()
    load(wh, Seq(("a", 1L), ("a", 2L), ("b", 5L)))
    def sums = Serving.read(wh)(read =>
      read("t").filter(col("v") <= 2L).groupBy("g").agg(sum(col("v")).as("s")))
    assert(sums.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 3L)))
    // a commit moves the scanned paths: the old entry can't be asked
    // for again, the new image evaluates fresh
    load(wh, Seq(("b", 2L)))
    assert(sums.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 3L), ("b", 2L)))
  }

  test("nested use under an already-active rule leaves the session's list unchanged") {
    val wh = freshWh()
    load(wh, Seq(("a", 1L)))
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ MvRewrite
    try {
      Serving.read(wh)(read => read("t")).collect()
      assert(spark.experimental.extraOptimizations.count(_ == MvRewrite) == 1,
        "no double registration")
    } finally spark.experimental.extraOptimizations = prev
  }
}
