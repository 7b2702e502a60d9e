package graft
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._
import graft.plans.MvRewrite
import graft.operators.MaterializedAgg
import graft.operators.MaterializedAgg.{Count => MCount, Measure, Sum => MSum}
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val oSchema = StructType(Seq(StructField("ok", LongType), StructField("pri", StringType)))
    val lSchema = StructType(Seq(StructField("lok", LongType), StructField("qty", LongType)))
    val mvSchema = StructType(Seq(StructField("pri", StringType), StructField("n", LongType), StructField("s", LongType)))
    val wh = new graft.etl.Warehouse(spark, java.nio.file.Files.createTempDirectory("jmv").toString,
      Map("o" -> oSchema, "l" -> lSchema, "mv" -> mvSchema), partitionSpec = Map.empty, bucketSpec = Map.empty)
    val orders = (1L to 30L).map(i => (i, s"p${i % 3}")).toDF("ok", "pri")
    val lines = (1L to 90L).map(i => (i % 30 + 1, i)).toDF("lok", "qty")
    val t = wh.begin(); t.append("o", orders); t.append("l", lines)
    t.overwrite("mv", MaterializedAgg.aggregate(orders.join(lines, col("ok") === col("lok")),
      Seq("pri"), Seq(Measure("n", lit(1), MCount), Measure("s", col("qty"), MSum))))
    t.commit()
    MvRewrite.registerWarehouseJoin(wh, "o", "l", Seq(("ok", "lok")), "mv", Seq("pri"),
      Seq(MvRewrite.MeasureSig("n", "count", None), MvRewrite.MeasureSig("s", "sum", Some("qty"))))
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ MvRewrite
    val q3 = wh.read("o").join(wh.read("l"), col("ok") === col("lok")).filter(col("pri") === "p1").agg(sum(col("qty")).as("s"))
    println("XXPLAN-start")
    println(q3.queryExecution.optimizedPlan.treeString)
    println("XXPLAN-end")
    spark.experimental.extraOptimizations = prev
    MvRewrite.clear()
    spark.stop()
  }
}
