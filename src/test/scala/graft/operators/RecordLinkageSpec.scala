package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Entity resolution: transitive fuzzy grouping and the golden-record
  * pick, on chains engineered so the endpoints EXCEED the pairwise
  * distance budget (only transitivity can group them).
  */
class RecordLinkageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chain links transitively; canonical = longest name, ties lowest id") {
    val s1 = "aaaabbbbccccdddd"              // 16 chars
    val s2 = s1.patch(1, "", 1)              // d(s1,s2)=1
    val s3 = s2.patch(4, "", 1).patch(8, "", 1) // d(s2,s3)=2, d(s1,s3)=3 > maxDist
    val recs = Seq(
      (1L, s1), (2L, s2), (3L, s3),
      (40L, "zzzzyyyyxxxxwwww"),             // isolated entity
      (50L, "qqqqrrrrsssstttt"), (51L, "qqqqrrrrsssstttt")) // exact twins
      .toDF("id", "name")
    val out = RecordLinkage.resolve(recs, "id", "name", maxDist = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4)))).toMap

    // transitive chain: all three in entity 1; s1 is longest -> canonical
    assert(out(1L) == ((1L, 1L, true, 3L)))
    assert(out(2L) == ((1L, 1L, false, 3L)))
    assert(out(3L) == ((1L, 1L, false, 3L)))
    // isolated record is its own canonical singleton
    assert(out(40L) == ((40L, 40L, true, 1L)))
    // exact twins: equal length, tie to the lowest id
    assert(out(50L) == ((50L, 50L, true, 2L)))
    assert(out(51L) == ((50L, 50L, false, 2L)))
  }

  test("duplicatePairs orients a<b and respects the distance budget") {
    val recs = Seq((1L, "aaaabbbbccccdddd"), (2L, "aaaabbbbccccddd"),
      (3L, "aaaabbbbccc")).toDF("id", "name")
    val pairs = RecordLinkage.duplicatePairs(recs, "id", "name", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs.forall { case (a, b, _) => a < b })
    assert(pairs.map(p => (p._1, p._2)) == Set((1L, 2L))) // d(1,3)=5, d(2,3)=4
  }
}
