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

  test("strict: equal timestamps do not match") {
    val out = AsOfJoin.asof(trades, quotes, Seq("sym"), "t", "t", Seq("px"),
        strict = true)
      .collect().map(r => r.getAs[String]("trade_id") ->
        Option(r.getAs[java.lang.Double]("asof_px")).map(_.toDouble)).toMap
    assert(out("t2").contains(100.0)) // A@20 -> quote@5, NOT quote@20
    assert(out("t3").contains(120.0))
  }
}
