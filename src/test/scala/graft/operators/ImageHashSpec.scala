package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** aHash semantics pins the oracle can't cover: a planted byte-identical
  * twin surfaces as a Hamming-0 pair, and the banded blocking is
  * COMPLETE at maxHamming ≤ 3 (pigeonhole over the four 16-bit bands) —
  * asserted against an all-pairs brute force over the collected hashes.
  */
class ImageHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mediaRows: Seq[(Long, String, Array[Byte])] = {
    val organic = (0 until 60).map { i =>
      val id = i.toLong
      if (i % 2 == 0) (id, "bmp", Multimodal.encodeBmp(id))
      else (id, "png", Multimodal.encodePng(id))
    }
    // planted twins: 1000 duplicates image 4 byte-for-byte; 1001 is the
    // same image with one pixel channel nudged (BMP has no checksum)
    val twin = (1000L, "bmp", Multimodal.encodeBmp(4))
    val nudged = {
      val b = Multimodal.encodeBmp(4).clone()
      b(60) = ((b(60) & 0xff) ^ 1).toByte
      (1001L, "bmp", b)
    }
    organic :+ twin :+ nudged
  }

  test("planted identical twin pairs at Hamming 0; blocking matches brute force at <= 3") {
    val df = mediaRows.toDF("doc_id", "fmt", "payload")
    val hashes = Multimodal.imageAHash(df)
    val rows = hashes.collect().map(r =>
      r.getLong(0) -> Seq(r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap

    def hamming(a: Seq[Long], b: Seq[Long]): Int =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum

    val got = Multimodal.imageHashPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ids = rows.keys.toSeq.sorted
    val want = (for {
      (a, i) <- ids.zipWithIndex; b <- ids.drop(i + 1)
      d = hamming(rows(a), rows(b)) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(got == want)
    assert(got.contains((4L, 1000L, 0L)))
  }

  test("degenerate corpus: over-cap band buckets emit linear anchor pairs") {
    // 30 byte-identical images — every band bucket holds all 30 ids.
    // Uncapped blocking would enumerate C(30,2)=435 pairs; the cap
    // diverts to anchor form: 29 pairs, all through the lowest id,
    // every one at Hamming 0 (so clustering still reaches everyone).
    val df = (1 to 30).map(i => (i.toLong, "bmp", Multimodal.encodeBmp(4)))
      .toDF("doc_id", "fmt", "payload")
    val pairs = Multimodal.imageHashPairs(
        Multimodal.imageAHash(df), maxHamming = 3, maxBucket = 8,
        candidateBudgetPerDoc = None)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == (2 to 30).map(i => (1L, i.toLong, 0L)).toSet)
  }

  test("band emission: empty grid rows (h < 8) leave their band zero") {
    // h = id % 9 + 3 = 3 for id 9 (png): grid rows 6..7 never populate
    val df = Seq((9L, "png", Multimodal.encodePng(9L)))
      .toDF("doc_id", "fmt", "payload")
    val r = Multimodal.imageAHash(df).collect().head
    assert(r.getLong(3) == 3L)  // height
    assert(r.getLong(7) == 0L)  // b3 = bits 48..63 = grid rows 6..7
  }
}
