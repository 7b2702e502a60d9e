package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word-n-gram MinHash as native expressions, BIT-IDENTICAL to the
  * composed md5 pipeline they replace — the existing DuckDB oracles
  * (substr(md5(shingle),1,16) gram hashes, 8-hex-chunk families of
  * md5(h)/md5('x:'||h)) keep passing unchanged.
  *
  * The composed form exploded one row per gram occurrence, carried them
  * through a partial-combining aggregation for the signature, and
  * re-hashed candidate docs for the verify. Here the whole signature is
  * ONE scalar pass per document over the UTF-8 bytes: tokenize (maximal
  * runs of non-[ \t\n\x0B\f\r] — exactly Java regex `\s+` split with
  * empties dropped, whitespace being ASCII-unambiguous in UTF-8), md5
  * each n-gram's `w1 w2 … wn` byte image, derive the 8 family chunks,
  * keep the minima. No explode, no exchange; the md5 count per doc is
  * the same as the composed form's — what disappears is row traffic.
  *
  * [[QWordGramHashes]] emits the per-doc DISTINCT gram-hash SET (the
  * first 16 md5 hex chars parsed as a wrapped 64-bit long — injective,
  * so set sizes and intersections match the oracle's string sets) sorted
  * ascending for the [[QSortedIntersect]] merge verify, computed only
  * for candidate docs.
  */
object QWordGrams {
  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val hexChars = "0123456789abcdef".getBytes

  private def isWs(b: Byte): Boolean =
    b == 32 || (b >= 9 && b <= 13)

  /** Token [start, end) offsets in `bytes`. */
  private def tokenBounds(bytes: Array[Byte]): Array[Int] = {
    val bounds = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < bytes.length) {
      while (i < bytes.length && isWs(bytes(i))) i += 1
      if (i < bytes.length) {
        val s = i
        while (i < bytes.length && !isWs(bytes(i))) i += 1
        bounds.add(s); bounds.add(i)
      }
    }
    val out = new Array[Int](bounds.size())
    var j = 0
    while (j < out.length) { out(j) = bounds.get(j); j += 1 }
    out
  }

  /** md5 of the gram starting at token `t` (n tokens, single-space
    * joined) — byte-identical to md5 of the concatenated shingle STRING
    * the composed pipeline built.
    */
  private def gramMd5(md: java.security.MessageDigest, bytes: Array[Byte],
                      bounds: Array[Int], t: Int, n: Int): Array[Byte] = {
    md.reset()
    var k = 0
    while (k < n) {
      if (k > 0) md.update(32.toByte)
      md.update(bytes, bounds(2 * (t + k)), bounds(2 * (t + k) + 1) - bounds(2 * (t + k)))
      k += 1
    }
    md.digest()
  }

  /** First 16 hex chars of the digest as ASCII bytes (= the oracle's
    * `substr(md5(shingle), 1, 16)` string).
    */
  private def hexPrefix16(d: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    out
  }

  /** 8-hex-char chunk `c` (0-3) of the digest as an unsigned 32-bit
    * value — lexicographic order of fixed-width lowercase hex equals
    * numeric order, so integer minima reproduce the oracle's string
    * `min()`.
    */
  private def chunk(d: Array[Byte], c: Int): Long = {
    var v = 0L
    var i = 4 * c
    while (i < 4 * c + 4) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  /** 8 signature family minima as 8-char hex strings (m0..m7). Public:
    * generated code calls it. Docs with fewer than n tokens (callers
    * filter them out, as the composed pipeline did) get "ffffffff"s.
    */
  def signature(s: UTF8String, n: Int): ArrayData = {
    val md = mdPool.get()
    val bytes = s.getBytes
    val bounds = tokenBounds(bytes)
    val nTok = bounds.length / 2
    val mins = Array.fill(8)(0xffffffffL)
    var t = 0
    val lastT = nTok - n
    val xPrefix = Array[Byte]('x', ':')
    while (t <= lastT) {
      val h = hexPrefix16(gramMd5(md, bytes, bounds, t, n))
      md.reset(); md.update(h); val d1 = md.digest()
      md.reset(); md.update(xPrefix); md.update(h); val d2 = md.digest()
      var j = 0
      while (j < 4) {
        val v1 = chunk(d1, j)
        if (v1 < mins(j)) mins(j) = v1
        val v2 = chunk(d2, j)
        if (v2 < mins(j + 4)) mins(j + 4) = v2
        j += 1
      }
      t += 1
    }
    val out = new Array[AnyRef](8)
    var j = 0
    while (j < 8) {
      out(j) = UTF8String.fromString(f"${mins(j)}%08x")
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Sorted distinct wrapped-u64 gram hashes (first 16 md5 hex chars).
    * Public: generated code calls it.
    */
  def distinctHashes(s: UTF8String, n: Int): ArrayData = {
    val md = mdPool.get()
    val bytes = s.getBytes
    val bounds = tokenBounds(bytes)
    val nTok = bounds.length / 2
    val lastT = nTok - n
    if (lastT < 0) return new GenericArrayData(Array.empty[Long])
    val all = new Array[Long](lastT + 1)
    var t = 0
    while (t <= lastT) {
      val d = gramMd5(md, bytes, bounds, t, n)
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      all(t) = v
      t += 1
    }
    java.util.Arrays.sort(all)
    var w = 0
    var r = 1
    while (r < all.length) {
      if (all(r) != all(w)) { w += 1; all(w) = all(r) }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(all, w + 1))
  }

  /** Column-API forms. */
  def sigCol(text: Column, n: Int): Column =
    Bridge.column(QWordGramSignature(Bridge.expression(text), n))
  def hashesCol(text: Column, n: Int): Column =
    Bridge.column(QWordGramHashes(Bridge.expression(text), n))
  def polySigCol(text: Column, n: Int): Column =
    Bridge.column(QWordGramPolySignature(Bridge.expression(text), n))
  def polyHashesCol(text: Column, n: Int): Column =
    Bridge.column(QWordGramPolyHashes(Bridge.expression(text), n))

  // ---------------------------------------------------------------- poly
  // The POLYNOMIAL word-gram family (the dedup_ngram playbook applied to
  // word grams): gram hash = fold((h·131 + cp) mod 1e9+7) over the CODE
  // POINTS of the single-space-joined gram string — exactly what the
  // relational DuckDB oracle computes with list_reduce over
  // ord(substr(...)) — and family j = ((37+101j)·h + (17+89j)) mod 1e9+7,
  // the QCharGrams scheme. Replaces ~one md5 per gram occurrence with
  // ~n integer mults per gram: the largest remaining CPU constant of the
  // md5 signature path. The md5 form above stays as the bit-identity
  // yardstick against the composed pipeline (QWordGramsSpec).

  /** Code points of `s`, surrogate pairs collapsed — the unit DuckDB's
    * `ord`/`substr` count.
    */
  private def codePoints(s: UTF8String): Array[Int] = {
    val str = s.toString
    val out = new Array[Int](str.codePointCount(0, str.length))
    var i = 0
    var j = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      out(j) = cp
      j += 1
      i += Character.charCount(cp)
    }
    out
  }

  private def isWsCp(cp: Int): Boolean = cp == 32 || (cp >= 9 && cp <= 13)

  /** Token [start, end) offsets in code points. */
  private def tokenBoundsCp(cps: Array[Int]): Array[Int] = {
    val bounds = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < cps.length) {
      while (i < cps.length && isWsCp(cps(i))) i += 1
      if (i < cps.length) {
        val s = i
        while (i < cps.length && !isWsCp(cps(i))) i += 1
        bounds.add(s); bounds.add(i)
      }
    }
    val out = new Array[Int](bounds.size())
    var j = 0
    while (j < out.length) { out(j) = bounds.get(j); j += 1 }
    out
  }

  private val P = 1000000007L
  private val B = 131L

  /** Polynomial hash of the gram starting at token `t` (n tokens,
    * single-space joined) — identical to hashing the joined string's
    * code points.
    */
  private def gramPoly(cps: Array[Int], bounds: Array[Int], t: Int, n: Int): Long = {
    var h = 0L
    var k = 0
    while (k < n) {
      if (k > 0) h = (h * B + 32L) % P
      var i = bounds(2 * (t + k))
      val end = bounds(2 * (t + k) + 1)
      while (i < end) { h = (h * B + cps(i)) % P; i += 1 }
      k += 1
    }
    h
  }

  /** 8 polynomial family minima (Long.MaxValue when fewer than n tokens
    * — callers filter those docs out). Public: generated code calls it.
    */
  def polySignature(s: UTF8String, n: Int): ArrayData = {
    val cps = codePoints(s)
    val bounds = tokenBoundsCp(cps)
    val mins = Array.fill(8)(Long.MaxValue)
    val lastT = bounds.length / 2 - n
    var t = 0
    while (t <= lastT) {
      val h = gramPoly(cps, bounds, t, n)
      var j = 0
      while (j < 8) {
        val g = ((37L + 101L * j) * h + (17L + 89L * j)) % P
        if (g < mins(j)) mins(j) = g
        j += 1
      }
      t += 1
    }
    new GenericArrayData(mins)
  }

  /** Sorted DISTINCT polynomial gram hashes — the per-doc gram SET for
    * the merge-intersect Jaccard verify. Public: generated code calls it.
    */
  def polyDistinctHashes(s: UTF8String, n: Int): ArrayData = {
    val cps = codePoints(s)
    val bounds = tokenBoundsCp(cps)
    val lastT = bounds.length / 2 - n
    if (lastT < 0) return new GenericArrayData(Array.empty[Long])
    val all = new Array[Long](lastT + 1)
    var t = 0
    while (t <= lastT) { all(t) = gramPoly(cps, bounds, t, n); t += 1 }
    java.util.Arrays.sort(all)
    var w = 0
    var r = 1
    while (r < all.length) {
      if (all(r) != all(w)) { w += 1; all(w) = all(r) }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(all, w + 1))
  }
}

/** `array<string>` of the 8 word-gram MinHash family minima — see
  * [[QWordGrams]].
  */
case class QWordGramSignature(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "gram size must be positive")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_wordgram_minhash"
  override def nullSafeEval(input: Any): Any =
    QWordGrams.signature(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.QWordGrams.signature($s, $n);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `array<bigint>` of the 8 POLYNOMIAL word-gram family minima — see
  * the poly section of [[QWordGrams]].
  */
case class QWordGramPolySignature(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "gram size must be positive")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_wordgram_poly_minhash"
  override def nullSafeEval(input: Any): Any =
    QWordGrams.polySignature(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.QWordGrams.polySignature($s, $n);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Sorted distinct POLYNOMIAL word-gram hashes — see the poly section
  * of [[QWordGrams]].
  */
case class QWordGramPolyHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "gram size must be positive")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_wordgram_poly_hashes"
  override def nullSafeEval(input: Any): Any =
    QWordGrams.polyDistinctHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.QWordGrams.polyDistinctHashes($s, $n);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Sorted distinct wrapped-u64 word-gram hashes — see [[QWordGrams]]. */
case class QWordGramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "gram size must be positive")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_wordgram_hashes"
  override def nullSafeEval(input: Any): Any =
    QWordGrams.distinctHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.QWordGrams.distinctHashes($s, $n);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
