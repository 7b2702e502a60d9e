package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QBloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("no false negatives; false positives bounded; nulls filtered") {
    val keys = (0L until 2000L).map(i => s"key-$i").toDF("k")
    val bloom = QBloom.build(keys, col("k"))
    // every inserted key passes
    assert(keys.filter(bloom.mightContain(col("k"))).count() == 2000L)
    // disjoint probe set: false-positive rate stays near the design point
    val probes = (0L until 10000L).map(i => s"other-$i").toDF("k")
    val fp = probes.filter(bloom.mightContain(col("k"))).count()
    assert(fp < 500L, s"false-positive rate ${fp / 10000.0} far above design ~1.5%")
    // null keys neither pass nor throw
    val withNull = Seq[Option[String]](Some("key-1"), None).toDF("k")
    assert(withNull.filter(bloom.mightContain(col("k"))).count() == 1L)
  }

  test("distributed word-array build == relational position-collect build") {
    // the pre-round-5 build collected bit POSITIONS as rows (worst case
    // ~16.7M at the 2^24 cap); the treeAggregate build must produce the
    // exact same words from a fixed-size driver result
    val mBits = 1L << 17
    val k = 5
    val keys = (0L until 3000L).map(i => s"key-$i").toDF("k")
    val h = md5(col("k").cast("string").cast("binary"))
    val h1 = conv(substring(h, 1, 15), 16, 10).cast("long")
    val h2 = conv(substring(h, 17, 15), 16, 10).cast("long")
    val posCols = (0 until k).map(i =>
      pmod(pmod(h1, lit(mBits)) + lit(i.toLong) * pmod(h2, lit(mBits)), lit(mBits)))
    val positions = keys.select(explode(array(posCols: _*)).as("pos"))
      .distinct().collect().map(_.getLong(0))
    val expected = new Array[Long]((mBits / 64).toInt)
    positions.foreach(p => expected((p >> 6).toInt) |= 1L << (p & 63).toInt)

    val built = QBloom.build(keys, col("k"), mBits, k)
    assert(java.util.Arrays.equals(built.words, expected),
      "distributed build diverges from the positional reference build")
  }

  test("pruned semi join equals the plain semi join") {
    val big = (0L until 5000L).map(i => (i, i % 7)).toDF("id", "v")
    val small = (0L until 5000L by 13).map(i => i).toDF("sid")
    val plain = big.join(small.select(col("sid").as("id")), Seq("id"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    val pruned = graft.operators.BloomJoin.semi(big, small, "id", "sid")
      .collect().map(_.getLong(0)).toSet
    assert(pruned == plain)
  }
}
