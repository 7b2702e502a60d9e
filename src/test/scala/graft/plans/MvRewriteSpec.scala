package graft.plans

import java.nio.file.Files
import graft.TestSpark
import graft.operators.MaterializedAgg
import graft.operators.MaterializedAgg.{Count => MCount, Max => MMax, Measure, Sum => MSum}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** Transparent MV routing: a covered aggregate over the base table
  * rewrites to a scan of the stored view (the base parquet never
  * appears in the physical plan); non-covered shapes are untouched.
  */
class MvRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withRule[A](body: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ MvRewrite
    try body
    finally {
      spark.experimental.extraOptimizations = prev
      MvRewrite.clear()
    }
  }

  test("covered aggregate scans the view, not the base; results identical") {
    val root = Files.createTempDirectory("mvrw").toString
    val basePath = s"$root/base"
    val mvPath = s"$root/mv"
    (1 to 500).map(i => (s"g${i % 7}", (i % 23).toDouble))
      .toDF("g", "v").write.parquet(basePath)

    val base = spark.read.parquet(basePath)
    val measures = Seq(
      Measure("n", lit(1), MCount),
      Measure("s", col("v").cast(DecimalType(18, 2)), MSum),
      Measure("hi", col("v"), MMax))
    MaterializedAgg.aggregate(base, Seq("g"), measures).write.parquet(mvPath)
    val mv = spark.read.parquet(mvPath)

    MvRewrite.register(base, mv, Seq("g"), Seq(
      MvRewrite.MeasureSig("n", "count", None),
      MvRewrite.MeasureSig("hi", "max", Some("v"))))

    withRule {
      // the user's query — written against the BASE table
      val covered = base.groupBy("g")
        .agg(count(lit(1)).as("cnt"), max(col("v")).as("mx"))
      val plan = covered.queryExecution.executedPlan.toString
      assert(!plan.contains("/base"), s"base table still scanned:\n${plan.take(1200)}")
      assert(plan.contains("/mv"), "view not scanned")
      val expect = spark.read.parquet(basePath).groupBy("g")
        .agg(count(lit(1)).as("cnt"), max(col("v")).as("mx"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val got = covered.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expect)
    }
  }

  test("warehouse registration: routing follows appends + refreshes across commits") {
    import java.nio.file.Files
    import org.apache.spark.sql.types._
    val schemas = Map(
      "facts" -> StructType(Seq(StructField("g", StringType),
        StructField("v", DoubleType))),
      "facts_mv" -> StructType(Seq(StructField("g", StringType),
        StructField("n", LongType))))
    val wh = new graft.etl.Warehouse(spark,
      Files.createTempDirectory("mvrw-wh").toString, schemas,
      partitionSpec = Map.empty, bucketSpec = Map.empty)
    val measures = Seq(MaterializedAgg.Measure("n", lit(1), MCount))

    def day(ids: Range) = ids.map(i => (s"g${i % 3}", i.toDouble)).toDF("g", "v")
    val t0 = wh.begin()
    t0.append("facts", day(1 to 60))
    t0.overwrite("facts_mv",
      MaterializedAgg.aggregate(day(1 to 60), Seq("g"), measures))
    t0.commit()

    MvRewrite.registerWarehouse(wh, "facts", "facts_mv", Seq("g"),
      Seq(MvRewrite.MeasureSig("n", "count", None)))
    withRule {
      def q = wh.read("facts").groupBy("g").agg(count(lit(1)).as("n"))
      val plan1 = q.queryExecution.executedPlan.toString
      assert(plan1.contains("facts_mv") && !plan1.contains("/facts/"),
        s"should scan only the view:\n${plan1.take(1200)}")
      assert(q.collect().map(_.getLong(1)).sum == 60)

      // append + refresh IN ONE COMMIT; the same query re-derives paths
      // and routes to the refreshed view
      val t1 = wh.begin()
      t1.append("facts", day(61 to 100))
      t1.overwrite("facts_mv", MaterializedAgg.refresh(
        t1.read("facts_mv"), day(61 to 100), Seq("g"), measures))
      t1.commit()
      assert(q.collect().map(_.getLong(1)).sum == 100)
      val plan2 = q.queryExecution.executedPlan.toString
      assert(plan2.contains("facts_mv") && !plan2.contains("/facts/"),
        s"post-refresh query should scan only the view:\n${plan2.take(1200)}")
    }
  }

  test("non-covered shapes are untouched: filter below, wrong keys, distinct") {
    val root = Files.createTempDirectory("mvrw2").toString
    val basePath = s"$root/base"
    (1 to 100).map(i => (s"g${i % 5}", i.toDouble)).toDF("g", "v")
      .write.parquet(basePath)
    val base = spark.read.parquet(basePath)
    val mvDf = base.groupBy("g").agg(count(lit(1)).as("n"))
    MvRewrite.register(base, mvDf, Seq("g"),
      Seq(MvRewrite.MeasureSig("n", "count", None)))

    withRule {
      // a filtered aggregate must NOT reroute (the view doesn't cover it)
      val filtered = base.filter(col("v") > 50).groupBy("g")
        .agg(count(lit(1)).as("n"))
      assert(filtered.collect().map(_.getLong(1)).sum == 50)
      // grouping by something else must not reroute either
      val otherKeys = base.groupBy("v").agg(count(lit(1)).as("n"))
      assert(otherKeys.count() == 100)
      // count(DISTINCT) is not the stored measure
      val dist = base.groupBy("g").agg(countDistinct(col("v")).as("n"))
      assert(dist.collect().map(_.getLong(1)).sum == 100)
    }
  }
}
