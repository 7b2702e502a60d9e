package graft.etl

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Type-3 carry semantics: a changed column's prev takes the OUTGOING
  * current value, an unchanged column's prev carries over, inserts get
  * null prevs, and null→value / value→null both count as changes.
  */
class Scd3Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("per-column carry: change overwrites prev, no-change carries it") {
    val dim = Seq(
      // k=1: seg will change (prev_seg must become "A", old prev lost);
      //      bal unchanged (prev_bal 5.0 carries over)
      (1L, "A", Some(10.0), Some("Z"), Some(5.0)),
      // k=2: bal null->20.0 is a change (prev = outgoing null); seg
      // unchanged, its "B0" prev carries over
      (2L, "B", None, Some("B0"), None),
      // k=3: deleted (absent from snapshot)
      (3L, "C", Some(30.0), None, None))
      .toDF("k", "seg", "bal", "prev_seg", "prev_bal")
    val snap = Seq(
      (1L, "A2", 10.0), (2L, "B", 20.0), (4L, "D", 40.0))
      .toDF("k", "seg", "bal")
    val got = Scd3.merge(dim, snap, Seq("k"), Seq("seg", "bal"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)), r.getString(3),
          Option(r.get(4)), r.getString(5)))).toMap
    assert(got(1L) == (("A2", Some(10.0), "A", Some(5.0), "update")))
    assert(got(2L) == (("B", Some(20.0), "B0", None, "update")))
    assert(got(4L) == (("D", Some(40.0), null, None, "insert")))
    assert(!got.contains(3L)) // snapshot semantics: deletes drop
  }
}
