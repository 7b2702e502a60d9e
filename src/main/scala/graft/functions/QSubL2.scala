package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the `m` per-subspace exact L2² distances
  * between two `array<bigint>` vectors — the product-quantization
  * building block (encode scores and ADC tables both consume it).
  *
  * Subspace s covers elements [s·(n/m), (s+1)·(n/m)) with
  * n = min(len(a), len(b)) — integer division, trailing remainder
  * elements ignored, matching a slice-composed formulation. One tight
  * generated loop replaces, per row, 3·m interpreted slice+dot calls
  * (or a zip_with/aggregate lambda chain) — this sits inside the
  * vectors × codewords quadratic encode join, the hottest loop of the
  * PQ family. Null ELEMENTS contribute as 0 values (the same semantics
  * the qdot-identity composition had); a null ARRAY yields null.
  */
case class QSubL2(left: Expression, right: Expression, m: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (!ok) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else if (m <= 0) TypeCheckResult.TypeCheckFailure(s"$prettyName: m must be positive")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_subl2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val sub = math.min(x.numElements(), y.numElements()) / m
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      var acc = 0L
      var i = s * sub
      val end = i + sub
      while (i < end) {
        val xv = if (x.isNullAt(i)) 0L else x.getLong(i)
        val yv = if (y.isNullAt(i)) 0L else y.getLong(i)
        val d = xv - yv
        acc += d * d
        i += 1
      }
      out(s) = acc
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val sub = ctx.freshName("sub")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val end = ctx.freshName("end")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $sub = java.lang.Math.min($a.numElements(), $b.numElements()) / $m;
         |long[] $out = new long[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  long $acc = 0L;
         |  int $end = ($s + 1) * $sub;
         |  for (int $i = $s * $sub; $i < $end; $i++) {
         |    long $d = ($a.isNullAt($i) ? 0L : $a.getLong($i))
         |      - ($b.isNullAt($i) ? 0L : $b.getLong($i));
         |    $acc += $d * $d;
         |  }
         |  $out[$s] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QSubL2 {
  /** Column-API form: m per-subspace L2² distances. */
  def subl2(a: Column, b: Column, m: Int): Column =
    Bridge.column(QSubL2(Bridge.expression(a), Bridge.expression(b), m))
}
