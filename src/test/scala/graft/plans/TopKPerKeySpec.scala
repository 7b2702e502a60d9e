package graft.plans

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKPerKeySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = (1 to 10000).map(i =>
    (s"k${i % 13}", (i * 2654435761L) % 10007, i.toLong))
    .toDF("k", "score", "id")

  test("matches the window row_number formulation exactly") {
    val custom = TopK.perKey(df, Seq("k"), Seq("score" -> false, "id" -> true), 5)
      .select("k", "score", "id")
      .collect().map(_.toSeq).toSet
    val w = Window.partitionBy("k").orderBy(col("score").desc, col("id").asc)
    val reference = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
      .collect().map(_.toSeq).toSet
    assert(custom == reference)
    assert(custom.size == 13 * 5)
  }

  test("plan: partial top-k below the exchange, final above") {
    val plan = TopK.perKey(df, Seq("k"), Seq("score" -> false, "id" -> true), 3)
      .queryExecution.executedPlan.toString
    // two TopKPerKey exec nodes with the hash Exchange between them
    assert("TopKPerKey \\[".r.findAllIn(plan).length == 2, plan)
    val finalIdx = plan.indexOf("TopKPerKey [")
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    val partialIdx = plan.lastIndexOf("TopKPerKey [")
    assert(finalIdx < exchangeIdx && exchangeIdx < partialIdx, plan)
  }

  test("ascending order and k larger than group size") {
    val small = Seq(("a", 3L), ("a", 1L), ("b", 2L)).toDF("k", "v")
    val out = TopK.perKey(small, Seq("k"), Seq("v" -> true), 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("a", 3L), ("a", 1L), ("b", 2L)))
    val top1 = TopK.perKey(small, Seq("k"), Seq("v" -> true), 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(top1 == Set(("a", 1L), ("b", 2L)))
  }
}
