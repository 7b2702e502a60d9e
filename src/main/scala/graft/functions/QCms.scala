package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-min-sketch bucket row as ONE native pass: all `depth` bucket
  * indices from a single md5 of the key — bit-identical to the composed
  * `conv(substring(md5(k), 1+8d, 8), 16, 10) % width` chain (each
  * 8-hex-char chunk is the unsigned 32-bit value of digest bytes
  * [4d, 4d+4)), so the DuckDB oracle is unchanged. The composed form
  * evaluated the md5 into a hex string and then ran `depth` substring +
  * base-16 conv parses per row; here it's one digest and four masks.
  */
object QCms {
  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Public: generated code calls it. */
  def buckets(s: UTF8String, width: Int, depth: Int): ArrayData = {
    val d = mdPool.get().digest(s.getBytes)
    val out = new Array[Long](depth)
    var j = 0
    while (j < depth) {
      var v = 0L
      var i = 4 * j
      while (i < 4 * j + 4) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      out(j) = v % width
      j += 1
    }
    new GenericArrayData(out)
  }

  def bucketsCol(key: Column, width: Int, depth: Int): Column =
    Bridge.column(QCmsBuckets(Bridge.expression(key), width, depth))
}

/** `array<bigint>` of the key's `depth` CMS bucket indices — see
  * [[QCms]].
  */
case class QCmsBuckets(child: Expression, width: Int, depth: Int)
    extends UnaryExpression {
  require(width > 0 && depth >= 1 && depth <= 4,
    "width must be positive, depth 1..4 (one md5 yields four 32-bit rows)")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string key, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_cms_buckets"
  override def nullSafeEval(input: Any): Any =
    QCms.buckets(input.asInstanceOf[UTF8String], width, depth)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.QCms.buckets($s, $width, $depth);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
