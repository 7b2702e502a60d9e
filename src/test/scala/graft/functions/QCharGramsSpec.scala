package graft.functions

import graft.TestSpark
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class QCharGramsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val P = 1000000007L

  /** Straight-line reference: every n-gram's fold hash over code points. */
  private def refHashes(s: String, n: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    (0 to cps.length - n).map { i =>
      (0 until n).foldLeft(0L)((h, k) => (h * 131L + cps(i + k)) % P)
    }
  }

  test("minhash = per-family minimum over every gram occurrence") {
    val s = "abcabcxyz"
    val hs = refHashes(s, 3)
    val want = (0 until 8).map { j =>
      hs.map(h => ((37L + 101L * j) * h + (17L + 89L * j)) % P).min
    }
    val got = QCharGrams.minhash(UTF8String.fromString(s), 3)
    assert((0 until 8).map(got.getLong) == want)
  }

  test("distinctHashes is sorted, deduplicated, and complete") {
    val s = "abcabcabc" // heavy gram repetition
    val want = refHashes(s, 3).distinct.sorted
    val got = QCharGrams.distinctHashes(UTF8String.fromString(s), 3)
    assert((0 until got.numElements()).map(got.getLong) == want)
  }

  test("code points, not UTF-16 units: astral chars count once") {
    // U+1F600 is one code point but two UTF-16 chars; a code-unit
    // implementation would shift every downstream gram
    val s = "a😀bcd"
    val got = QCharGrams.distinctHashes(UTF8String.fromString(s), 5)
    assert(got.numElements() == 1) // 5 code points -> exactly one gram
    val cps = s.codePoints().toArray
    val want = (0 until 5).foldLeft(0L)((h, k) => (h * 131L + cps(k)) % P)
    assert(got.getLong(0) == want)
  }

  test("shorter than n: minhash yields MaxValue sentinels, hashes empty") {
    val mh = QCharGrams.minhash(UTF8String.fromString("ab"), 5)
    assert((0 until 8).forall(j => mh.getLong(j) == Long.MaxValue))
    assert(QCharGrams.distinctHashes(UTF8String.fromString("ab"), 5).numElements() == 0)
  }

  test("sorted intersect count matches set intersection") {
    val cases = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 5L, 10L), 2L),
      (Seq.empty[Long], Seq(1L, 2L), 0L),
      (Seq(7L), Seq(7L), 1L),
      (Seq(1L, 2L, 3L), Seq(4L, 5L), 0L))
    for ((a, b, want) <- cases) {
      val df = Seq((a, b)).toDF("a", "b")
      val got = df.select(QSortedIntersect.col(col("a"), col("b"))).head.getLong(0)
      assert(got == want, s"$a ∩ $b")
    }
  }

  test("expressions run identically interpreted and codegen'd") {
    val df = Seq(("the quick brown fox jumps", 1L)).toDF("text", "id")
    val viaExpr = df.select(QCharGrams.minhashCol(lower(col("text")), 5).as("mh"))
      .head.getSeq[Long](0)
    val direct = QCharGrams.minhash(UTF8String.fromString("the quick brown fox jumps"), 5)
    assert(viaExpr == (0 until 8).map(direct.getLong))
  }

  test("charGramNearDups finds an exact copy and a near copy, not strangers") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"), // copy
      (3L, "the quick brown fox jumps over the lazy dog again and AGAIN!"), // near
      (4L, "completely unrelated text about spark catalyst expressions ok"))
      .toDF("doc_id", "text")
    val pairs = Dedup.charGramNearDups(docs, threshold = 0.6, n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
    // the exact copy must verify at jaccard 1.0
    val j12 = Dedup.charGramNearDups(docs, 0.6, 5)
      .filter(col("doc_a") === 1 && col("doc_b") === 2)
      .head.getDouble(2)
    assert(j12 == 1.0)
  }
}
