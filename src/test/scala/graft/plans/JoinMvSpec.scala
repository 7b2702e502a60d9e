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

/** Aggregate-over-join MV routing: a covered aggregate over the
  * registered inner equi-join scans the stored view instead of either
  * base table; wrong keys / non-key filters / non-equi conjuncts fall
  * back to the base plan (correct, just not routed).
  */
class JoinMvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val oSchema = StructType(Seq(StructField("ok", LongType),
    StructField("pri", StringType)))
  private val lSchema = StructType(Seq(StructField("lok", LongType),
    StructField("qty", LongType)))
  private val mvSchema = StructType(Seq(StructField("pri", StringType),
    StructField("n", LongType), StructField("s", LongType)))

  private val keys = Seq("pri")
  private val ms = Seq(Measure("n", lit(1), MCount), Measure("s", col("qty"), MSum))
  private val sigs = Seq(MvRewrite.MeasureSig("n", "count", None),
    MvRewrite.MeasureSig("s", "sum", Some("qty")))

  private def scanned(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toUri.getPath)
        case _ => Nil
      }
    }.flatten.toSet

  private def setup(): Warehouse = {
    val wh = new Warehouse(spark, Files.createTempDirectory("joinmv").toString,
      Map("o" -> oSchema, "l" -> lSchema, "mv" -> mvSchema),
      partitionSpec = Map.empty, bucketSpec = Map.empty)
    val orders = (1L to 30L).map(i => (i, s"p${i % 3}")).toDF("ok", "pri")
    val lines = (1L to 90L).map(i => (i % 30 + 1, i)).toDF("lok", "qty")
    val t = wh.begin()
    t.append("o", orders); t.append("l", lines)
    t.overwrite("mv", MaterializedAgg.aggregate(
      orders.join(lines, col("ok") === col("lok")), keys, ms))
    t.commit()
    wh
  }

  private def baseDirs(wh: Warehouse): Set[String] =
    (wh.catalog()("o") ++ wh.catalog()("l")).toSet

  private def withRule[A](body: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ MvRewrite
    try body finally {
      spark.experimental.extraOptimizations = prev
      MvRewrite.clear()
    }
  }

  private def direct(wh: Warehouse): DataFrame =
    wh.read("o").join(wh.read("l"), col("ok") === col("lok"))

  test("covered aggregate over the join routes to the view, both grains, either side order") {
    val wh = setup()
    MvRewrite.registerWarehouseJoin(wh, "o", "l", Seq(("ok", "lok")), "mv", keys, sigs)
    withRule {
      val q = direct(wh).groupBy("pri").agg(count(lit(1)).as("n"), sum(col("qty")).as("s"))
      assert(baseDirs(wh).intersect(scanned(q)).isEmpty,
        s"routed plan must not scan base tables: ${scanned(q)}")
      val want = Map("p0" -> (30L, 1365L), "p1" -> (30L, 1395L), "p2" -> (30L, 1335L))
      val got = q.collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
      assert(got == want, "routed answer must equal the hand-computed aggregate")
      val check = direct(wh).groupBy("pri")
        .agg(count(lit(1)).as("n"), sum(col("qty")).as("s"))
      assert(got == check.collect().map(r =>
        (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap)

      // swapped build order still routes (mirror match)
      val q2 = wh.read("l").join(wh.read("o"), col("lok") === col("ok"))
        .groupBy("pri").agg(sum(col("qty")).as("s"))
      assert(baseDirs(wh).intersect(scanned(q2)).isEmpty, "mirror order must route")
      assert(q2.collect().map(r => (r.getString(0), r.getLong(1))).toMap ==
        got.map { case (k, v) => k -> v._2 })

      // coarser grain: global roll-up of the view
      val q3 = direct(wh).agg(count(lit(1)).as("n"))
      assert(baseDirs(wh).intersect(scanned(q3)).isEmpty)
      assert(q3.collect().head.getLong(0) == 90L)

      // key filter routes too
      val q4 = direct(wh).filter(col("pri") === "p1").agg(sum(col("qty")).as("s"))
      assert(baseDirs(wh).intersect(scanned(q4)).isEmpty)
      assert(q4.collect().head.getLong(0) == 1395L)
    }
  }

  test("wrong join keys, non-key filters, non-equi conjuncts fall back to base") {
    val wh = setup()
    MvRewrite.registerWarehouseJoin(wh, "o", "l", Seq(("ok", "lok")), "mv", keys, sigs)
    withRule {
      // join on a different condition: not the registered shape
      val w1 = wh.read("o").join(wh.read("l"), col("ok") === col("qty"))
        .groupBy("pri").agg(count(lit(1)).as("n"))
      assert(baseDirs(wh).intersect(scanned(w1)).nonEmpty, "must not route")

      // filter on a non-key measure column disqualifies
      val w2 = direct(wh).filter(col("qty") > 45L)
        .groupBy("pri").agg(count(lit(1)).as("n"))
      assert(baseDirs(wh).intersect(scanned(w2)).nonEmpty, "must not route")
      assert(w2.collect().map(_.getLong(1)).sum == 45L)

      // an extra non-equi conjunct disqualifies
      val w3 = wh.read("o").join(wh.read("l"),
          col("ok") === col("lok") && col("qty") > col("ok"))
        .groupBy("pri").agg(count(lit(1)).as("n"))
      assert(baseDirs(wh).intersect(scanned(w3)).nonEmpty, "must not route")
    }
  }

  test("a name on BOTH join sides disqualifies name-keyed routing (never mis-binds)") {
    // both tables carry a 'tag' column; the registered view is keyed on
    // the LEFT side's values. A query grouping by the RIGHT side's tag
    // resolves to the same NAME — name-keyed mapping would bind it to
    // the view's left-derived key and return wrong groups. The
    // ambiguity must disqualify the rewrite entirely.
    val oS = StructType(Seq(StructField("ok", LongType),
      StructField("pri", StringType), StructField("tag", StringType)))
    val lS = StructType(Seq(StructField("lok", LongType),
      StructField("qty", LongType), StructField("tag", StringType)))
    val mvS = StructType(Seq(StructField("tag", StringType),
      StructField("n", LongType), StructField("s", LongType)))
    val wh = new Warehouse(spark, Files.createTempDirectory("joinmv-amb").toString,
      Map("o" -> oS, "l" -> lS, "mv" -> mvS),
      partitionSpec = Map.empty, bucketSpec = Map.empty)
    val orders = (1L to 30L).map(i => (i, s"p${i % 3}",
      if (i % 2 == 0) "x" else "y")).toDF("ok", "pri", "tag")
    val lines = (1L to 90L).map(i => (i % 30 + 1, i, "z")).toDF("lok", "qty", "tag")
    val t = wh.begin()
    t.append("o", orders); t.append("l", lines)
    t.overwrite("mv", MaterializedAgg.aggregate(
      orders.join(lines.select("lok", "qty"), col("ok") === col("lok")),
      Seq("tag"), ms))
    t.commit()
    MvRewrite.registerWarehouseJoin(wh, "o", "l", Seq(("ok", "lok")), "mv",
      Seq("tag"), sigs)
    withRule {
      val l = wh.read("l")
      val q = wh.read("o").join(l, col("ok") === col("lok"))
        .groupBy(l("tag")).agg(count(lit(1)).as("n"), sum(col("qty")).as("s"))
      assert(baseDirs2(wh).intersect(scanned(q)).nonEmpty,
        "ambiguous shared name must not route")
      val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == Map("z" -> 90L),
        s"grouping by the right side's tag must see the right side's values: $got")
    }
  }

  private def baseDirs2(wh: Warehouse): Set[String] =
    (wh.catalog()("o") ++ wh.catalog()("l")).toSet
}
