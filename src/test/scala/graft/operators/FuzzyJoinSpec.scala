package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("trigram blocking finds edits <= maxDist, rejects the rest") {
    val left = Seq(
      (1L, "warehouse-north-17"),   // 1 deletion from right 10
      (2L, "warehose-north-17"),    // same base, 1 deletion
      (3L, "completely different"), // no match
      (4L, "ab")                    // short-string fallback path
    ).toDF("l_id", "l_name")
    val right = Seq(
      (10L, "warehouse-north-17"),
      (11L, "warehouse-south-17"),  // north→south = 2 substitutions: in at maxDist 2
      (12L, "ab")
    ).toDF("r_id", "r_name")
    val out = FuzzyJoin.trigramBlocked(left, right,
        "l_id", "l_name", "r_id", "r_name", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out((1L, 10L, 0L)) && out((2L, 10L, 1L)) && out((4L, 12L, 0L)), s"$out")
    assert(!out.exists(_._1 == 3L), s"no match for the unrelated name: $out")
    assert(out.forall(_._3 <= 2L), s"$out")
    assert(out((1L, 11L, 2L)), s"boundary dist == maxDist kept: $out")
    // the deletion variant is 3 edits from the south name: filtered out
    assert(!out.exists(p => p._1 == 2L && p._2 == 11L), s"$out")
  }

  test("pigeonhole recall: every single-char deletion of a long name is found") {
    val base = "supplier-depot-nine-42"
    val left = (0 until base.length)
      .map(i => (i.toLong, base.substring(0, i) + base.substring(i + 1)))
      .toDF("l_id", "l_name")
    val right = Seq((100L, base)).toDF("r_id", "r_name")
    val out = FuzzyJoin.trigramBlocked(left, right,
        "l_id", "l_name", "r_id", "r_name", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out.size == base.length && out.values.forall(_ == 1L), s"$out")
  }
}
