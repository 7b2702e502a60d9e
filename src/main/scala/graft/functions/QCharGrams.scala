package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-n-gram hashing for near-dup detection, as native Catalyst
  * expressions.
  *
  * The composed pipeline (explode one row per gram position → `substr` →
  * `distinct` → `md5` → two more md5s for the signature families) was the
  * engine's largest bench tail: a corpus-sized explode, a corpus-sized
  * distinct SHUFFLE of short strings, and ~1M md5 evaluations, all to
  * produce 8 minima per document. These expressions compute the same
  * information in ONE scalar pass per document — the signature stage of
  * the char-gram LSH becomes a map with no explode, no shuffle, no
  * crypto hash; the only exchange left in the pipeline is the
  * band-bucket join itself. At 100 TB that removes the dominant
  * corpus-sized shuffle from the near-dup plan.
  *
  * Hash (identical in the DuckDB oracle, which computes it relationally
  * per gram): over UNICODE CODE POINTS of the (caller-lowercased) text,
  *
  *   h(gram)  = fold(cp: h = (h · 131 + cp) mod 1000000007)
  *   g_j(h)   = ((37 + 101·j) · h + (17 + 89·j)) mod 1000000007
  *
  * All intermediates stay far below 2^63 (h < 2^30, multipliers < 2^10),
  * so BIGINT arithmetic is exact — and therefore bit-portable — in every
  * engine. Code points (not UTF-16 units, not bytes) are the unit both
  * Spark's `substring` and DuckDB's `substr`/`ord` agree on. A 30-bit
  * hash collides ~120× per million distinct grams (birthday bound);
  * collisions merge two grams IDENTICALLY in engine and oracle, so
  * results stay deterministic and hash-checkable — the trade for integer
  * portability, same as the md5-prefix truncation it replaces.
  */
object QCharGrams {
  val P = 1000000007L
  val B = 131L
  val Families = 8

  /** Code points of `s` (surrogate pairs collapsed — the unit DuckDB's
    * `ord`/`substr` count).
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

  /** 8-family minima over every n-gram occurrence (min ignores
    * duplicates, so no dedup is needed). Fewer than one gram (shorter
    * text than `n` — callers filter those rows out) yields all-
    * `Long.MaxValue`, deterministically. Public: generated code calls it.
    */
  def minhash(s: UTF8String, n: Int): ArrayData = {
    val cps = codePoints(s)
    val mins = Array.fill(Families)(Long.MaxValue)
    var i = 0
    val last = cps.length - n
    while (i <= last) {
      var h = 0L
      var k = 0
      while (k < n) { h = (h * B + cps(i + k)) % P; k += 1 }
      var j = 0
      while (j < Families) {
        val g = ((37L + 101L * j) * h + (17L + 89L * j)) % P
        if (g < mins(j)) mins(j) = g
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** DISTINCT n-gram hashes of `s`, sorted ascending — the per-document
    * gram SET the Jaccard verify stage consumes. Computed only for
    * candidate docs (a vanishing fraction of the corpus), never
    * corpus-wide. Public: generated code calls it.
    */
  def distinctHashes(s: UTF8String, n: Int): ArrayData = {
    val cps = codePoints(s)
    val last = cps.length - n
    if (last < 0) return new GenericArrayData(Array.empty[Long])
    val all = new Array[Long](last + 1)
    var i = 0
    while (i <= last) {
      var h = 0L
      var k = 0
      while (k < n) { h = (h * B + cps(i + k)) % P; k += 1 }
      all(i) = h
      i += 1
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

  /** Content-defined anchor positions (1-based, in CODE POINTS): every
    * `i` where the polynomial hash of the `w` code points starting at
    * `i` is ≡ 0 (mod `modulus`) — the content-defined-chunking trick:
    * anchors move WITH the content, so two documents sharing a region
    * anchor it at the same in-region offsets regardless of where the
    * region sits in each document. Expected anchor density 1/modulus;
    * a shared region is missed only if it contains no anchor
    * (probability (1−1/m)^positions — the standard CDC trade).
    * Public: generated code calls it.
    */
  def anchorPositions(s: UTF8String, w: Int, modulus: Int): ArrayData = {
    val cps = codePoints(s)
    val last = cps.length - w
    if (last < 0) return new GenericArrayData(Array.empty[Long])
    val buf = new java.util.ArrayList[Long]()
    var i = 0
    while (i <= last) {
      var h = 0L
      var k = 0
      while (k < w) { h = (h * B + cps(i + k)) % P; k += 1 }
      if (h % modulus == 0) buf.add(i + 1L)
      i += 1
    }
    val out = new Array[Long](buf.size())
    var j = 0
    while (j < out.length) { out(j) = buf.get(j); j += 1 }
    new GenericArrayData(out)
  }

  /** Column-API forms. */
  def minhashCol(text: Column, n: Int): Column =
    Bridge.column(QCharGramMinHash(Bridge.expression(text), n))
  def hashesCol(text: Column, n: Int): Column =
    Bridge.column(QCharGramHashes(Bridge.expression(text), n))
  def anchorsCol(text: Column, w: Int, modulus: Int): Column =
    Bridge.column(QCdcAnchors(Bridge.expression(text), w, modulus))
}

private[functions] trait CharGramExpr extends UnaryExpression {
  def n: Int
  require(n > 0, "gram size must be positive")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
}

/** `array<bigint>` of the 8 MinHash family minima over the string's
  * char n-grams — see [[QCharGrams]].
  */
case class QCharGramMinHash(child: Expression, n: Int) extends CharGramExpr {
  override def prettyName: String = "graft_chargram_minhash"
  override def nullSafeEval(input: Any): Any =
    QCharGrams.minhash(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.QCharGrams.minhash($s, $n);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Sorted DISTINCT char-n-gram hashes of the string — see
  * [[QCharGrams]].
  */
case class QCharGramHashes(child: Expression, n: Int) extends CharGramExpr {
  override def prettyName: String = "graft_chargram_hashes"
  override def nullSafeEval(input: Any): Any =
    QCharGrams.distinctHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.QCharGrams.distinctHashes($s, $n);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** 1-based code-point positions of content-defined anchors — see
  * [[QCharGrams.anchorPositions]].
  */
case class QCdcAnchors(child: Expression, w: Int, modulus: Int)
    extends UnaryExpression {
  require(w > 0 && modulus > 0, "window and modulus must be positive")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cdc_anchors"
  override def nullSafeEval(input: Any): Any =
    QCharGrams.anchorPositions(input.asInstanceOf[UTF8String], w, modulus)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.QCharGrams.anchorPositions($s, $w, $modulus);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** |a ∩ b| of two SORTED-ascending distinct `array<bigint>` columns
  * (the shape [[QCharGramHashes]] emits) by linear merge — the per-pair
  * set intersection a Jaccard verify needs, without exploding either
  * set into rows. Replaces a three-stage shuffle (explode → (id, h)
  * equi-join → per-pair count aggregate) with one scalar expression on
  * the joined pair row: O(|a|+|b|) per pair, zero exchanges.
  * PRECONDITION (unchecked — a check would re-scan both arrays): both
  * inputs sorted ascending with no duplicates; unsorted input
  * undercounts silently.
  */
object QSortedIntersect {
  /** Public: generated code calls it. */
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  def col(a: Column, b: Column): Column =
    Bridge.column(QSortedIntersectCount(
      Bridge.expression(a), Bridge.expression(b)))
}

case class QSortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint>, got ${l.simpleString}, ${r.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_count"
  override def nullSafeEval(a: Any, b: Any): Any =
    QSortedIntersect.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.QSortedIntersect.count($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
