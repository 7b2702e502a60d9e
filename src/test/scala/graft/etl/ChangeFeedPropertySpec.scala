package graft.etl

import graft.TestSpark
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** The change feed's algebraic contract, property-pinned on random
  * keyed images (nullable values included):
  *
  *  1. ROUND TRIP — `applyChanges(old, diff(old, new)) == new`: the
  *     feed carries exactly the information needed to move a copy from
  *     the old image to the new one.
  *  2. SELF-DIFF IS EMPTY — `diff(x, x)` emits nothing.
  *  3. STRUCT/ROW CONSISTENCY — the row form's cardinality is the
  *     struct form's with updates counted twice (pre+post).
  */
class ChangeFeedPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: List[(Long, Option[String], Option[Int])]) =
    rows.toDF("k", "a", "b")

  private val rowGen = Gen.choose(0L, 19L).flatMap(k =>
    Gen.zip(Gen.const(k), Gen.option(Gen.alphaStr.map(_.take(3))),
      Gen.option(Gen.choose(0, 3))))
  private val tableGen = Gen.listOfN(14, rowGen).map(_.distinctBy(_._1))

  test("property: apply(old, diff(old,new)) == new; diff(x,x) empty; " +
      "row form = struct form with updates doubled") {
    val prop = Prop.forAll(tableGen, tableGen) { (oldRows, newRows) =>
      val oldDf = df(oldRows)
      val newDf = df(newRows)
      val changes = ChangeFeed.diff(oldDf, newDf, Seq("k"))
      val rebuilt = ChangeFeed.applyChanges(oldDf, changes, Seq("k"))
        .collect().map(_.toSeq).toSet
      val roundTrip = rebuilt == newDf.collect().map(_.toSeq).toSet

      val selfEmpty = ChangeFeed.diff(oldDf, oldDf, Seq("k")).isEmpty

      val structRows = ChangeFeed.diffStruct(oldDf, newDf, Seq("k")).collect()
      val updates = structRows.count(_.getAs[String]("change_type") == "update")
      val consistent = changes.count() == structRows.length + updates

      roundTrip && selfEmpty && consistent
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
