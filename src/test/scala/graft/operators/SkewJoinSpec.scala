package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join returns exactly the plain join's rows on skewed data") {
    // 90% of fact rows hit one hot key
    val fact = (1 to 5000).map(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong))
      .toDF("k", "v")
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k3", "B")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted
    val salted = SkewJoin.saltedJoin(fact, dim, Seq("k"), salt = 8,
        saltSource = Seq("v")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted
    assert(salted.sameElements(plain))
    assert(plain.length == 4500 + (1 to 5000).count(i => i % 10 == 0 && Seq(1, 3).contains(i % 7)))
  }

  test("salt spreads the hot key across partitions") {
    val fact = (1 to 1000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val salts = fact.select(
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash($"v"),
        org.apache.spark.sql.functions.lit(8)))
      .distinct().count()
    assert(salts == 8)
  }
}
