package graft.operators

import java.sql.Date
import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("bucketized point-in-interval equals the naive theta join, any bucket width") {
    val points = (0 until 40)
      .map(i => (i.toLong, d(f"2021-${1 + i % 12}%02d-${1 + (i * 7) % 28}%02d")))
      .toDF("pid", "pdate")
    val intervals = (0 until 30).map { i =>
      val s = java.time.LocalDate.of(2021, 1 + i % 12, 1 + i % 20)
      (i.toLong, Date.valueOf(s), Date.valueOf(s.plusDays(i % 45)))
    }.toDF("iid", "istart", "iend")

    val naive = points.join(intervals,
        $"pdate".between($"istart", $"iend"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (width <- Seq(1, 7, 30, 365)) {
      val fast = RangeJoin.pointInInterval(points, intervals,
          "pdate", "istart", "iend", bucketDays = width)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fast == naive, s"bucketDays=$width diverged")
    }
    assert(naive.nonEmpty)
  }

  test("plan is a hash join — no nested loop, no cartesian product") {
    val points = Seq((1L, d("2021-03-01"))).toDF("pid", "pdate")
    val intervals = Seq((1L, d("2021-02-01"), d("2021-04-01"))).toDF("iid", "istart", "iend")
    val plan = RangeJoin.pointInInterval(points, intervals, "pdate", "istart", "iend")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), "nested loop in plan")
    assert(!plan.contains("CartesianProduct"), "cartesian in plan")
  }

  test("interval overlap equals naive theta join, each pair exactly once") {
    val a = (0 until 25).map { i =>
      val s = java.time.LocalDate.of(2021, 1 + i % 12, 1 + i % 25)
      (i.toLong, Date.valueOf(s), Date.valueOf(s.plusDays(3 + i % 40)))
    }.toDF("aid", "astart", "aend")
    val b = (0 until 30).map { i =>
      val s = java.time.LocalDate.of(2021, 1 + (i * 5) % 12, 1 + (i * 3) % 27)
      (i.toLong, Date.valueOf(s), Date.valueOf(s.plusDays(i % 50)))
    }.toDF("bid", "bstart", "bend")
    val naive = a.join(b, $"astart" <= $"bend" && $"bstart" <= $"aend")
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    for (width <- Seq(1, 7, 60)) {
      val fast = RangeJoin.intervalOverlap(a, b, "astart", "aend", "bstart", "bend",
          bucketDays = width)
        .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(fast.sorted.toSeq == naive.sorted.toSeq,
        s"bucketDays=$width diverged or duplicated pairs")
    }
    assert(naive.nonEmpty)
  }

  test("degenerate inputs: empty/inverted intervals and out-of-range points") {
    val points = Seq((1L, d("2021-01-01"))).toDF("pid", "pdate")
    val intervals = Seq(
      (1L, d("2021-06-01"), d("2021-05-01")), // inverted -> dropped
      (2L, d("2020-01-01"), d("2020-12-31"))) // does not cover the point
      .toDF("iid", "istart", "iend")
    assert(RangeJoin.pointInInterval(points, intervals, "pdate", "istart", "iend")
      .count() == 0)
  }
}
