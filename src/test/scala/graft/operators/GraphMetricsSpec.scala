package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Triangle enumeration on the oriented edge list: each triangle once,
  * per-node credit three ways, robust to duplicate/reversed input pairs.
  */
class GraphMetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // K4 on {1,2,3,4} (4 triangles) + a pendant 5 + disconnected edge 6-7;
  // pairs deliberately carry duplicates and reversed orientation
  private def pairs = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (3L, 2L),            // reversed duplicate
    (1L, 2L),            // exact duplicate
    (4L, 5L), (6L, 7L))
    .toDF("doc_a", "doc_b")

  test("triangles: K4 yields its four, each exactly once, sorted") {
    val t = GraphMetrics.triangles(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(t == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("per-node participation: K4 members get 3 each; pendant and island get none") {
    val n = GraphMetrics.trianglesPerNode(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("degrees ignore duplicates and orientation") {
    val d = GraphMetrics.degrees(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 4L, 5L -> 1L,
      6L -> 1L, 7L -> 1L))
  }
}
