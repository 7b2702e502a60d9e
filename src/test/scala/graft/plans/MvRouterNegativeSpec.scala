package graft.plans

import java.nio.file.Files
import graft.TestSpark
import graft.etl.Warehouse
import graft.operators.MaterializedAgg
import graft.operators.MaterializedAgg.{Count => MCount, Measure, Sum => MSum}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Router DISQUALIFICATION sweep (round-9, VERDICT item 6): a matrix of
  * query shapes that must NOT route to any registered view, each run
  * against a registry holding multiple single-table AND join views at
  * once (cross-matching included — no definition may fire). The
  * round-8 ambiguous-column mis-bind (73abeda) was a wrong-RESULTS bug
  * found only by review; this spec pins every known disqualifier as a
  * result-level property:
  *
  *   for every disqualifying shape q:
  *     (1) the optimized plan still scans the base dirs (no rewrite), and
  *     (2) the answer equals the rule-off answer (fallback is sound).
  *
  * Two positive controls bracket the sweep — if routing were silently
  * broken (rule not installed, registry empty), every negative
  * assertion would pass vacuously; the controls fail loudly instead.
  */
class MvRouterNegativeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fSchema = StructType(Seq(
    StructField("g", StringType), StructField("h", StringType),
    StructField("v", DoubleType), StructField("t", LongType)))
  private val fMvSchema = StructType(Seq(
    StructField("g", StringType), StructField("n", LongType),
    StructField("s", DoubleType)))
  private val oSchema = StructType(Seq(
    StructField("ok", LongType), StructField("pri", StringType),
    StructField("tag", StringType)))
  private val lSchema = StructType(Seq(
    StructField("lok", LongType), StructField("qty", LongType),
    StructField("tag", StringType)))
  private val jMvSchema = StructType(Seq(
    StructField("pri", StringType), StructField("n", LongType),
    StructField("s", LongType)))

  private def scanned(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toUri.getPath)
        case _ => Nil
      }
    }.flatten.toSet

  private def withRule[A](body: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ MvRewrite
    try body finally {
      spark.experimental.extraOptimizations = prev
      MvRewrite.clear()
    }
  }

  /** Build the warehouse, register BOTH view families, return
    * (warehouse, all base dirs).
    */
  private def setup(): (Warehouse, Set[String]) = {
    val wh = new Warehouse(spark,
      Files.createTempDirectory("mv-neg").toString,
      Map("f" -> fSchema, "f_mv" -> fMvSchema, "o" -> oSchema,
        "l" -> lSchema, "j_mv" -> jMvSchema),
      partitionSpec = Map.empty, bucketSpec = Map.empty)
    val f = (1 to 200).map(i =>
      (s"g${i % 5}", s"h${i % 3}", (i % 23).toDouble, (i % 7).toLong))
      .toDF("g", "h", "v", "t")
    val orders = (1L to 30L).map(i =>
      (i, s"p${i % 3}", if (i % 2 == 0) "x" else "y")).toDF("ok", "pri", "tag")
    val lines = (1L to 90L).map(i => (i % 30 + 1, i, "z")).toDF("lok", "qty", "tag")
    val fMs = Seq(Measure("n", lit(1), MCount), Measure("s", col("v"), MSum))
    val jMs = Seq(Measure("n", lit(1), MCount), Measure("s", col("qty"), MSum))
    val t = wh.begin()
    t.append("f", f)
    t.overwrite("f_mv", MaterializedAgg.aggregate(f, Seq("g"), fMs))
    t.append("o", orders); t.append("l", lines)
    t.overwrite("j_mv", MaterializedAgg.aggregate(
      orders.join(lines.select("lok", "qty"), col("ok") === col("lok")),
      Seq("pri"), jMs))
    t.commit()
    MvRewrite.registerWarehouse(wh, "f", "f_mv", Seq("g"), Seq(
      MvRewrite.MeasureSig("n", "count", None),
      MvRewrite.MeasureSig("s", "sum", Some("v"))))
    MvRewrite.registerWarehouseJoin(wh, "o", "l", Seq(("ok", "lok")), "j_mv",
      Seq("pri"), Seq(
        MvRewrite.MeasureSig("n", "count", None),
        MvRewrite.MeasureSig("s", "sum", Some("qty"))))
    val baseDirs = (wh.catalog()("f") ++ wh.catalog()("o") ++
      wh.catalog()("l")).toSet
    (wh, baseDirs)
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case null => "<null>"
      case d: Double => java.lang.Double.toString(d)
      case other => other.toString
    }).toSet

  test("no disqualifying shape routes; every fallback answer is exact") {
    val (wh, baseDirs) = setup()
    def f = wh.read("f")
    def join = wh.read("o").join(wh.read("l").select("lok", "qty"),
      col("ok") === col("lok"))

    // (label, query builder). Each shape hits a distinct disqualifier
    // in the router; builders are re-invoked per phase so plans are
    // fresh on both the rule-off and rule-on runs.
    val matrix: Seq[(String, () => DataFrame)] = Seq(
      "group by expression, not attribute" -> (() =>
        f.groupBy(upper(col("g")).as("gu")).agg(count(lit(1)).as("n"))),
      "grouping key aliased below the aggregate" -> (() =>
        f.select(col("g").as("gg"), col("v"))
          .groupBy("gg").agg(count(lit(1)).as("n"))),
      "query keys not a subset of view keys" -> (() =>
        f.groupBy("t").agg(count(lit(1)).as("n"))),
      "filter on a non-key column" -> (() =>
        f.filter(col("v") > 3.0).groupBy("g").agg(count(lit(1)).as("n"))),
      "user IsNotNull on a NON-key column" -> (() =>
        f.filter(col("v").isNotNull).groupBy("g").agg(count(lit(1)).as("n"))),
      "distinct aggregate" -> (() =>
        f.groupBy("g").agg(countDistinct(col("v")).as("n"))),
      "filtered aggregate (FILTER clause)" -> (() =>
        f.groupBy("g").agg(expr("count(*) FILTER (WHERE v > 3.0)").as("n"))),
      "composite expression over aggregates" -> (() =>
        f.groupBy("g").agg((sum(col("v")) + count(lit(1))).as("sn"))),
      "unregistered measure (max)" -> (() =>
        f.groupBy("g").agg(max(col("v")).as("mx"))),
      "window function between scan and aggregate" -> (() =>
        f.withColumn("r", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("g").orderBy("t")))
          .filter(col("r") === 1).groupBy("g").agg(count(lit(1)).as("n"))),
      "join: outer instead of inner" -> (() =>
        wh.read("o").join(wh.read("l").select("lok", "qty"),
            col("ok") === col("lok"), "left")
          .groupBy("pri").agg(count(lit(1)).as("n"))),
      "join: non-equi conjunct in the condition" -> (() =>
        wh.read("o").join(wh.read("l").select("lok", "qty"),
            col("ok") === col("lok") && col("qty") > col("ok"))
          .groupBy("pri").agg(count(lit(1)).as("n"))),
      "join: user IsNotNull on a non-key measure column" -> (() =>
        join.filter(col("qty").isNotNull)
          .groupBy("pri").agg(count(lit(1)).as("n"))),
      "join: aggregate over a name living on BOTH sides" -> (() => {
        val l = wh.read("l")
        wh.read("o").join(l, col("ok") === col("lok"))
          .groupBy(l("tag")).agg(count(lit(1)).as("n"))
      }),
      "join: filter on the registration-ambiguous name (pruned plan)" -> (() => {
        val l = wh.read("l").select("lok", "qty", "tag")
        wh.read("o").select("ok", "pri").join(l, col("ok") === col("lok"))
          .filter(col("tag") === "z")
          .groupBy("pri").agg(count(lit(1)).as("n"))
      }))

    // phase 1 — rule OFF: ground-truth answers
    val expected = matrix.map { case (label, q) => label -> rows(q()) }.toMap

    // phase 2 — rule ON: nothing routes, answers unchanged
    withRule {
      // positive controls: the registry IS live and CAN route
      val c1 = f.groupBy("g").agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      assert(baseDirs.intersect(scanned(c1)).isEmpty,
        s"control (single-table) must route; scanned ${scanned(c1)}")
      val c2 = join.groupBy("pri").agg(sum(col("qty")).as("s"))
      assert(baseDirs.intersect(scanned(c2)).isEmpty,
        s"control (join) must route; scanned ${scanned(c2)}")

      matrix.foreach { case (label, q) =>
        val df = q()
        assert(baseDirs.intersect(scanned(df)).nonEmpty,
          s"[$label] must NOT route — base tables absent from the plan")
        assert(rows(df) == expected(label),
          s"[$label] fallback answer changed under the rule")
      }

      // nondeterministic filter: plan-only assertion (the answer is not
      // comparable across runs by construction)
      val nd = f.filter(rand(7) > 0.5).groupBy("g").agg(count(lit(1)).as("n"))
      assert(baseDirs.intersect(scanned(nd)).nonEmpty,
        "nondeterministic filter must NOT route")

      // scalar-subquery filter: PlanExpression disqualifies even when
      // every reference is a grouping key
      wh.read("f").createOrReplaceTempView("mvneg_f")
      val sq = spark.sql(
        """SELECT g, count(*) AS n FROM mvneg_f
          |WHERE g IN (SELECT g FROM mvneg_f WHERE v > 20.0)
          |GROUP BY g""".stripMargin)
      assert(baseDirs.intersect(scanned(sq)).nonEmpty,
        "subquery filter must NOT route")
    }
  }
}
