package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash signature as ONE native scalar pass — bit-identical
  * to the composed form in `Dedup.simhashSignature` (and its DuckDB
  * oracle), which it replaces in the hot path: tokenize on ASCII
  * whitespace, md5 per DISTINCT word, ±1-accumulate the 64 bits of the
  * first 16 md5 hex chars (nibble p, bit b ordered by (p, b)), emit the
  * '1'/'0' sign string. The composed plan paid a corpus-wide
  * (doc, word-hash) DISTINCT shuffle plus a 64-column aggregation
  * exchange; here the whole signature is a map over the document bytes
  * — per-doc word dedup happens in a local hash set, and nothing
  * corpus-sized is exchanged before the band-bucket join.
  */
object QSimHash {
  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def isWs(b: Byte): Boolean = b == 32 || (b >= 9 && b <= 13)

  /** Public: generated code calls it. Input must be pre-lowercased
    * (callers pass `lower(text)`), matching the composed pipeline.
    */
  def signature(s: UTF8String): UTF8String = {
    val md = mdPool.get()
    val bytes = s.getBytes
    val acc = new Array[Int](64)
    // per-doc word dedup on the FULL 128-bit digest (the composed form
    // dedups on the full md5 hex string); ByteBuffer equals/hashCode
    // are content-based, and digest() returns a fresh array per call
    val seen = new java.util.HashSet[java.nio.ByteBuffer]()
    var i = 0
    while (i < bytes.length) {
      while (i < bytes.length && isWs(bytes(i))) i += 1
      if (i < bytes.length) {
        val start = i
        while (i < bytes.length && !isWs(bytes(i))) i += 1
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        if (seen.add(java.nio.ByteBuffer.wrap(d))) {
          // first 16 hex chars = nibbles of the first 8 digest bytes;
          // nibble p (0-based), bit b: +1 if set else -1
          var p = 0
          while (p < 16) {
            val byte = d(p / 2) & 0xff
            val nib = if (p % 2 == 0) byte >> 4 else byte & 0xf
            var b = 0
            while (b < 4) {
              acc(4 * p + b) += (if (((nib >> b) & 1) == 1) 1 else -1)
              b += 1
            }
            p += 1
          }
        }
      }
    }
    val out = new Array[Byte](64)
    var j = 0
    while (j < 64) { out(j) = if (acc(j) >= 0) '1' else '0'; j += 1 }
    UTF8String.fromBytes(out)
  }

  def sigCol(text: Column): Column =
    Bridge.column(QSimHashSignature(Bridge.expression(text)))
}

/** 64-char '1'/'0' SimHash of the pre-lowercased text — see
  * [[QSimHash]].
  */
case class QSimHashSignature(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_simhash"
  override def nullSafeEval(input: Any): Any =
    QSimHash.signature(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.QSimHash.signature($s);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
