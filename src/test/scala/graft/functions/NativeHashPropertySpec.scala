package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests: the native one-pass expressions against INDEPENDENT
  * straight-line reimplementations (java.lang.String split /
  * MessageDigest arithmetic) over adversarial random strings — ASCII,
  * runs of mixed whitespace, multi-byte and astral-plane code points.
  * The DataFrame-level bit-identity specs pin the native paths to the
  * composed pipelines; these pin the byte/code-point mechanics
  * themselves at unit-test speed (200 samples each).
  */
class NativeHashPropertySpec extends AnyFunSuite {

  private val P = 1000000007L

  // words of letters/digits/multibyte/astral chars; separators are
  // random whitespace runs, sometimes EMPTY (gluing adjacent words)
  private val wordGen: Gen[String] = for {
    n <- Gen.choose(1, 8)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar.map(_.toString),
      1 -> Gen.oneOf("é", "ß", "щ", "中"),
      1 -> Gen.oneOf("😀", "𝕏"))) // astral: 2 UTF-16 units, 1 code point
  } yield cs.mkString

  private val wsGen: Gen[String] = for {
    n <- Gen.choose(0, 3)
    cs <- Gen.listOfN(n, Gen.oneOf(" ", "\t", "\n", "\r"))
  } yield cs.mkString

  private val textGen: Gen[String] = for {
    lead <- Gen.oneOf("", " ", "\t ")
    nw <- Gen.choose(0, 12)
    ws <- Gen.listOfN(nw, wordGen)
    seps <- Gen.listOfN(nw, wsGen)
    tail <- Gen.oneOf("", "  ")
  } yield lead + ws.zip(seps).map { case (w, s) => w + s }.mkString + tail

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString

  private def refTokens(s: String): Array[String] =
    s.split("\\s+").filter(_.nonEmpty)

  test("QWordGrams.distinctHashes == split/sliding/md5 reference") {
    check(Prop.forAll(textGen, Gen.choose(1, 4)) { (s: String, n: Int) =>
      val want = refTokens(s).sliding(n).filter(_.length == n)
        .map(g => java.lang.Long.parseUnsignedLong(
          md5Hex(g.mkString(" ").getBytes("UTF-8")).take(16), 16))
        .toSeq.distinct.sorted
      val got = QWordGrams.distinctHashes(UTF8String.fromString(s), n)
      (0 until got.numElements()).map(got.getLong) == want
    })
  }

  test("QWordGrams.signature == md5-chunk-minima reference") {
    check(Prop.forAll(textGen) { (s: String) =>
      val grams = refTokens(s).sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSeq
      val want =
        if (grams.isEmpty) (0 until 8).map(_ => "ffffffff")
        else (0 until 8).map { j =>
          grams.map { g =>
            val h = md5Hex(g.getBytes("UTF-8")).take(16)
            val src = if (j < 4) md5Hex(h.getBytes("UTF-8"))
                      else md5Hex(("x:" + h).getBytes("UTF-8"))
            src.substring(8 * (j % 4), 8 * (j % 4) + 8)
          }.min
        }
      val got = QWordGrams.signature(UTF8String.fromString(s), 3)
      (0 until 8).map(got.getUTF8String(_).toString) == want
    })
  }

  test("QCharGrams.minhash/distinctHashes == code-point fold reference") {
    check(Prop.forAll(textGen, Gen.choose(2, 6)) { (s: String, n: Int) =>
      val cps = s.codePoints().toArray
      val hs = (0 to cps.length - n).map { i =>
        (0 until n).foldLeft(0L)((h, k) => (h * 131L + cps(i + k)) % P)
      }
      val gotH = QCharGrams.distinctHashes(UTF8String.fromString(s), n)
      val hashesOk =
        (0 until gotH.numElements()).map(gotH.getLong) == hs.distinct.sorted
      val gotM = QCharGrams.minhash(UTF8String.fromString(s), n)
      val wantM = (0 until 8).map { j =>
        if (hs.isEmpty) Long.MaxValue
        else hs.map(h => ((37L + 101L * j) * h + (17L + 89L * j)) % P).min
      }
      hashesOk && (0 until 8).map(gotM.getLong) == wantM
    })
  }

  test("QCdcAnchors == positions-where-fold-mod-zero reference") {
    check(Prop.forAll(textGen, Gen.choose(2, 8), Gen.oneOf(4, 16)) {
      (s: String, w: Int, m: Int) =>
        val cps = s.codePoints().toArray
        val want = (0 to cps.length - w).filter { i =>
          (0 until w).foldLeft(0L)((h, k) => (h * 131L + cps(i + k)) % P) % m == 0
        }.map(_ + 1L)
        val arr = QCharGrams.anchorPositions(UTF8String.fromString(s), w, m)
        (0 until arr.numElements()).map(arr.getLong) == want
    })
  }

  test("QSimHash.signature == distinct-word bit-vote reference") {
    check(Prop.forAll(textGen) { (s: String) =>
      val acc = new Array[Int](64)
      refTokens(s).distinct.foreach { wrd =>
        val hex = md5Hex(wrd.getBytes("UTF-8")).take(16)
        for (p <- 0 until 16; b <- 0 until 4) {
          val v = Integer.parseInt(hex.charAt(p).toString, 16)
          acc(4 * p + b) += (if (((v >> b) & 1) == 1) 1 else -1)
        }
      }
      val want = acc.map(a => if (a >= 0) '1' else '0').mkString
      QSimHash.signature(UTF8String.fromString(s)).toString == want
    })
  }

  test("QSortedIntersect.count == set intersection on random sorted arrays") {
    val arrGen = Gen.listOf(Gen.choose(0L, 40L)).map(_.distinct.sorted)
    check(Prop.forAll(arrGen, arrGen) { (a: List[Long], b: List[Long]) =>
      QSortedIntersect.count(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(a.toArray),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(b.toArray)) ==
        a.toSet.intersect(b.toSet).size.toLong
    })
  }

  test("QCms.buckets == hex-chunk reference") {
    check(Prop.forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { (k: String) =>
      val hex = md5Hex(k.getBytes("UTF-8"))
      val want = (0 until 4).map(j =>
        java.lang.Long.parseLong(hex.substring(8 * j, 8 * j + 8), 16) % 256)
      val got = QCms.buckets(UTF8String.fromString(k), 256, 4)
      (0 until 4).map(got.getLong) == want
    })
  }
}
