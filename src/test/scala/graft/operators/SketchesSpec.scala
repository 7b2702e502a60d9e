package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("count-min estimates are upper bounds, exact at generous width") {
    // skewed corpus: key i appears i times
    val rows = (1 to 40).flatMap(i => Seq.fill(i)(i.toLong)).toDF("k0")
    val truth = (1 to 40).map(i => i.toString -> i.toLong).toMap

    // narrow sketch: collisions guaranteed (40 keys into 8 counters),
    // estimates must still never under-count
    val narrow = Sketches.countMinEstimates(rows, "k0", width = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(narrow.keySet == truth.keySet)
    truth.foreach { case (k, n) =>
      assert(narrow(k) >= n, s"under-count for $k: ${narrow(k)} < $n")
    }
    assert(narrow.values.sum > truth.values.sum, "collisions should inflate somewhere")

    // generous width: 4 independent rows make a lucky-free bucket for
    // every key overwhelmingly likely -> exact counts
    val wide = Sketches.countMinEstimates(rows, "k0", width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wide == truth)
  }

  test("native CMS buckets are bit-identical to the composed hex-string form") {
    import org.apache.spark.sql.functions._
    val keys = (0 until 500).map(i => s"key-$i-payload").toDF("k")
    val composed = keys
      .withColumn("__h", md5(col("k").cast("binary")))
      .select(col("k"), Sketches.bucketsComposed(256, 4).as("b"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val native = keys
      .select(col("k"), graft.functions.QCms.bucketsCol(col("k"), 256, 4).as("b"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(native == composed)
  }
}
