package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val trades = Seq(
    ("A", 10L, "t1"), ("A", 20L, "t2"), ("A", 30L, "t3"),
    ("B", 15L, "t4"), ("C", 5L, "t5"))
    .toDF("sym", "t", "trade_id")
  private lazy val quotes = Seq(
    ("A", 5L, 100.0), ("A", 20L, 110.0), ("A", 25L, 120.0),
    ("B", 10L, 50.0))
    .toDF("sym", "t", "px")

  test("non-strict: latest quote at-or-before each trade") {
    val out = AsOfJoin.asof(trades, quotes, Seq("sym"), "t", "t", Seq("px"))
      .collect().map(r => r.getAs[String]("trade_id") ->
        Option(r.getAs[java.lang.Double]("asof_px")).map(_.toDouble)).toMap
    assert(out == Map(
      "t1" -> Some(100.0), // A@10 -> quote@5
      "t2" -> Some(110.0), // A@20 -> quote@20 (equality matches)
      "t3" -> Some(120.0), // A@30 -> quote@25
      "t4" -> Some(50.0),  // B@15 -> quote@10
      "t5" -> None))       // C has no quotes -> null
  }

  test("property: agrees with a naive in-memory model on random data") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val rowGen = for {
      k <- Gen.oneOf("a", "b", "c")
      t <- Gen.choose(0L, 20L)
      v <- Gen.choose(0, 99)
    } yield (k, t, v)
    val prop = Prop.forAll(Gen.listOfN(15, rowGen), Gen.listOfN(10, rowGen)) {
      (lRows, rRowsRaw) =>
        // dedup right on (k,t) so the expected match is unique
        val rRows = rRowsRaw.groupBy(r => (r._1, r._2))
          .map { case ((k, t), g) => (k, t, g.map(_._3).max) }.toSeq
        val lDf = lRows.zipWithIndex.map { case ((k, t, v), i) => (k, t, i.toLong) }
          .toDF("k", "t", "lid")
        val rDf = rRows.toDF("k", "t", "v")
        val got = AsOfJoin.asof(lDf, rDf, Seq("k"), "t", "t", Seq("v"))
          .collect().map(r => r.getAs[Long]("lid") ->
            Option(r.getAs[java.lang.Integer]("asof_v")).map(_.toInt)).toMap
        val expected = lRows.zipWithIndex.map { case ((k, t, _), i) =>
          val cand = rRows.filter(r => r._1 == k && r._2 <= t)
          i.toLong -> (if (cand.isEmpty) None
            else Some(cand.maxBy(_._2)._3))
        }.toMap
        got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("strict: equal timestamps do not match") {
    val out = AsOfJoin.asof(trades, quotes, Seq("sym"), "t", "t", Seq("px"),
        strict = true)
      .collect().map(r => r.getAs[String]("trade_id") ->
        Option(r.getAs[java.lang.Double]("asof_px")).map(_.toDouble)).toMap
    assert(out("t2").contains(100.0)) // A@20 -> quote@5, NOT quote@20
    assert(out("t3").contains(120.0))
  }
}
