package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QDotProductSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native qdot matches a hand computation, interpreted and codegen") {
    val df = Seq(
      (Array(1L, 2L, 3L), Array(4L, 5L, 6L)),   // 4+10+18 = 32
      (Array(-2L, 7L), Array(3L, -1L)),          // -6-7 = -13
      (Array.empty[Long], Array.empty[Long]))    // 0
      .toDF("a", "b")
    val got = df.select(QDotProduct.qdot($"a", $"b")).collect().map(_.getLong(0))
    assert(got.toSeq == Seq(32L, -13L, 0L))
  }

  test("null array yields null; null elements contribute zero") {
    val df = Seq(
      (Some(Array(1L, 2L)), None: Option[Array[Long]]),
      (Some(Array(1L, 2L)), Some(Array(10L, 20L))))
      .toDF("a", "b")
    val rows = df.select(QDotProduct.qdot($"a", $"b").as("d")).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getLong(0) == 50L)
    QDotProduct.register(spark)
    assert(spark.sql("SELECT graft_qdot(array(1L, NULL, 3L), array(2L, 5L, 4L)) d")
      .head.getLong(0) == 14L) // null element skipped
  }

  test("SQL registration via SparkSessionExtensions-style inject") {
    QDotProduct.register(spark)
    assert(spark.sql("SELECT graft_qdot(array(2L, 3L), array(5L, 7L)) d")
      .head.getLong(0) == 31L)
  }

  test("mismatched types produce an analysis error, not a runtime crash") {
    QDotProduct.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_qdot(array('a'), array(1L))").collect()
    }
    assert(e.getMessage.contains("graft_qdot") || e.getMessage.toLowerCase.contains("type"))
  }
}
