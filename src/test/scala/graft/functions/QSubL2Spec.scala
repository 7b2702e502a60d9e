package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QSubL2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native subl2 matches the slice-composed higher-order formulation") {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 50).map { _ =>
      (Array.fill(16)(rnd.nextInt(2000001).toLong - 1000000L),
        Array.fill(16)(rnd.nextInt(2000001).toLong - 1000000L))
    }
    val df = rows.toDF("a", "b")
    for (m <- Seq(1, 2, 4, 8, 16)) {
      // reference: slice + zip_with + aggregate (interpreted)
      val sub = (size($"a") / lit(m)).cast("int")
      val diffs = zip_with($"a", $"b", (x, y) => (x - y) * (x - y))
      val ref = transform(sequence(lit(0), lit(m - 1)),
        s => aggregate(slice(diffs, s * sub + 1, sub), lit(0L), (acc, x) => acc + x))
      val got = df.select(QSubL2.subl2($"a", $"b", m).as("g"), ref.as("r"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"m=$m diverged")
      }
    }
  }

  test("null array yields null; null elements contribute as zero values") {
    val df = Seq(
      (Some(Array(3L, 4L)), None: Option[Array[Long]]),
      (Some(Array(3L, 4L)), Some(Array(1L, 1L))))
      .toDF("a", "b")
    val out = df.select(QSubL2.subl2($"a", $"b", 2).as("d")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getSeq[Long](0) == Seq(4L, 9L))
    // null element = zero value: subspace 1 is (NULL−5)² = 25
    QSubL2SpecHelper.register(spark)
    assert(spark.sql("SELECT graft_subl2(array(3L, NULL), array(1L, 5L), 2) d")
      .head.getSeq[Long](0) == Seq(4L, 25L))
  }

  test("sum over all subspaces equals the m=1 full L2²") {
    val rnd = new scala.util.Random(29)
    val df = (0 until 20).map { _ =>
      (Array.fill(64)(rnd.nextInt(2000001).toLong - 1000000L),
        Array.fill(64)(rnd.nextInt(2000001).toLong - 1000000L))
    }.toDF("a", "b")
    val got = df.select(
        aggregate(QSubL2.subl2($"a", $"b", 8), lit(0L), (acc, x) => acc + x).as("s"),
        element_at(QSubL2.subl2($"a", $"b", 1), 1).as("f"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }
}

object QSubL2SpecHelper {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_subl2",
      exprs => QSubL2(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Number].intValue()),
      "built-in")
}
