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

  test("avg + count(col) readout: derived measures route with exact results") {
    val root = Files.createTempDirectory("mvrw-avg").toString
    val basePath = s"$root/base"
    // v nullable: every 11th row null, so count(v) != count(*) and the
    // avg denominator must be the non-null count to match
    (1 to 400).map(i => (s"g${i % 5}",
        if (i % 11 == 0) None else Some(BigDecimal(i).setScale(2)), i.toLong))
      .toDF("g", "v", "w").write.parquet(basePath)
    val base = spark.read.parquet(basePath)
    val measures = Seq(
      Measure("n", lit(1), MCount),
      Measure("n_v", col("v"), MCount),
      Measure("n_w", col("w"), MCount),
      Measure("s_v", col("v"), MSum),
      Measure("s_w", col("w"), MSum))
    val mvPath = s"$root/mv"
    MaterializedAgg.aggregate(base, Seq("g"), measures).write.parquet(mvPath)
    val mv = spark.read.parquet(mvPath)
    MvRewrite.register(base, mv, Seq("g"), Seq(
      MvRewrite.MeasureSig("n", "count", None),
      MvRewrite.MeasureSig("n_v", "count", Some("v")),
      MvRewrite.MeasureSig("n_w", "count", Some("w")),
      MvRewrite.MeasureSig("s_v", "sum", Some("v")),
      MvRewrite.MeasureSig("s_w", "sum", Some("w"))))

    withRule {
      // decimal avg (exact) + long avg (integral sum widens to double)
      val q = base.groupBy("g").agg(
        avg(col("v")).as("avg_v"), avg(col("w")).as("avg_w"),
        count(col("v")).as("n_v"))
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("/base") && plan.contains("/mv"),
        s"derived-measure query should scan only the view:\n${plan.take(1200)}")
      val expect = spark.read.parquet(basePath).groupBy("g").agg(
          avg(col("v")).as("avg_v"), avg(col("w")).as("avg_w"),
          count(col("v")).as("n_v"))
        .collect().map(r => (r.getString(0), r.getDecimal(1), r.getDouble(2), r.getLong(3))).toSet
      val got = q.collect()
        .map(r => (r.getString(0), r.getDecimal(1), r.getDouble(2), r.getLong(3))).toSet
      assert(got == expect)

      // avg over a column with no count(col) measure must NOT reroute
      val noCnt = base.groupBy("g").agg(avg(col("w") + 1).as("a"))
      assert(noCnt.collect().length == 5)
    }
  }

  test("hll-estimate routing: sketch measure answers approx-distinct exactly") {
    val root = Files.createTempDirectory("mvrw-hll").toString
    val basePath = s"$root/base"
    (1 to 600).map(i => (s"g${i % 4}", (i % 37).toLong))
      .toDF("g", "u").write.parquet(basePath)
    val base = spark.read.parquet(basePath)
    val measures = Seq(
      Measure("n", lit(1), MCount),
      Measure("sk_u", col("u"), MaterializedAgg.ApproxDistinct))
    val mvPath = s"$root/mv"
    MaterializedAgg.aggregate(base, Seq("g"), measures).write.parquet(mvPath)
    MvRewrite.register(base, spark.read.parquet(mvPath), Seq("g"), Seq(
      MvRewrite.MeasureSig("n", "count", None),
      MvRewrite.MeasureSig("sk_u", "hll", Some("u"))))

    withRule {
      val q = base.groupBy("g")
        .agg(hll_sketch_estimate(hll_sketch_agg(col("u"))).as("du"))
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("/base") && plan.contains("/mv"),
        s"hll query should scan only the view:\n${plan.take(1200)}")
      // merge-invariance makes the routed estimate EXACTLY the direct one
      val expect = spark.read.parquet(basePath).groupBy("g")
        .agg(hll_sketch_estimate(hll_sketch_agg(col("u"))).as("du"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSet == expect)
    }
  }

  test("key-only filter routes; roll-up to coarser keys and global re-aggregate") {
    val root = Files.createTempDirectory("mvrw-ru").toString
    val basePath = s"$root/base"
    (1 to 900).map(i => (s"g${i % 6}", s"h${i % 3}",
        BigDecimal(i % 50).setScale(2), i.toLong))
      .toDF("g", "h", "v", "w").write.parquet(basePath)
    val base = spark.read.parquet(basePath)
    val measures = Seq(
      Measure("n", lit(1), MCount),
      Measure("n_v", col("v"), MCount),
      Measure("s_v", col("v"), MSum),
      Measure("hi_w", col("w"), MMax))
    val mvPath = s"$root/mv"
    MaterializedAgg.aggregate(base, Seq("g", "h"), measures).write.parquet(mvPath)
    MvRewrite.register(base, spark.read.parquet(mvPath), Seq("g", "h"), Seq(
      MvRewrite.MeasureSig("n", "count", None),
      MvRewrite.MeasureSig("n_v", "count", Some("v")),
      MvRewrite.MeasureSig("s_v", "sum", Some("v")),
      MvRewrite.MeasureSig("hi_w", "max", Some("w"))))

    def direct = spark.read.parquet(basePath)
    withRule {
      // exact grain + key-only filter → filtered view projection
      val qf = base.filter(col("g") === "g2").groupBy("g", "h")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      val planF = qf.queryExecution.executedPlan.toString
      assert(!planF.contains("/base") && planF.contains("/mv"),
        s"key-filtered exact-grain query should scan only the view:\n${planF.take(1200)}")
      val expF = direct.filter(col("g") === "g2").groupBy("g", "h")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDecimal(3))).toSet
      assert(qf.collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getDecimal(3))).toSet == expF)

      // roll-up: coarser grain re-aggregates the view (sum/count/max/avg)
      val qr = base.groupBy("g").agg(
        count(lit(1)).as("n"), sum(col("v")).as("s"),
        max(col("w")).as("hi"), avg(col("v")).as("a"))
      val planR = qr.queryExecution.executedPlan.toString
      assert(!planR.contains("/base") && planR.contains("/mv"),
        s"roll-up query should scan only the view:\n${planR.take(1200)}")
      val expR = direct.groupBy("g").agg(
          count(lit(1)).as("n"), sum(col("v")).as("s"),
          max(col("w")).as("hi"), avg(col("v")).as("a"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2),
          r.getLong(3), r.getDecimal(4))).toSet
      assert(qr.collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2),
        r.getLong(3), r.getDecimal(4))).toSet == expR)

      // global aggregate (empty grouping) + filter on a key
      val qg = base.filter(col("h") =!= "h0").agg(
        count(lit(1)).as("n"), sum(col("v")).as("s"))
      val planG = qg.queryExecution.executedPlan.toString
      assert(!planG.contains("/base") && planG.contains("/mv"),
        s"global roll-up should scan only the view:\n${planG.take(1200)}")
      val g0 = qg.collect().head
      val e0 = direct.filter(col("h") =!= "h0")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s")).collect().head
      assert(g0.getLong(0) == e0.getLong(0) && g0.getDecimal(1) == e0.getDecimal(1))
    }
  }

  test("roll-up over an empty base: global count reads 0, sum null") {
    val root = Files.createTempDirectory("mvrw-empty").toString
    val basePath = s"$root/base"
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("g", StringType),
      StructField("v", LongType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .write.parquet(basePath)
    val base = spark.read.parquet(basePath)
    val mvPath = s"$root/mv"
    val measures = Seq(Measure("n", lit(1), MCount),
      Measure("s_v", col("v"), MSum))
    MaterializedAgg.aggregate(base, Seq("g"), measures).write.parquet(mvPath)
    MvRewrite.register(base, spark.read.parquet(mvPath), Seq("g"), Seq(
      MvRewrite.MeasureSig("n", "count", None),
      MvRewrite.MeasureSig("s_v", "sum", Some("v"))))
    withRule {
      val q = base.agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("/base") && plan.contains("/mv"))
      val r = q.collect().head
      assert(r.getLong(0) == 0L && r.isNullAt(1))
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
