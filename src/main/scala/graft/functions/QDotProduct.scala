package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: exact BIGINT dot product of two
  * `array<bigint>` vectors.
  *
  * Written as a custom `Expression` with `doGenCode` (preference order
  * (b) of the engine guidelines: native expression > UDF) because the
  * composable alternatives are all worse in the hot path:
  * `aggregate`/`zip_with` higher-order functions execute interpreted, and
  * an unrolled `element_at` sum materializes one projection column per
  * component. The generated code is a single tight loop over the two
  * `ArrayData` buffers inside whole-stage codegen.
  *
  * Nulls: null input array → null result (standard binary-expression
  * semantics); null ELEMENTS are treated as 0 contribution.
  */
case class QDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_qdot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QDotProduct {
  /** Column-API form. */
  def qdot(a: Column, b: Column): Column =
    Bridge.column(QDotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Register `graft_qdot` for SQL use on an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_qdot", exprs => QDotProduct(exprs(0), exprs(1)), "built-in")
}

/** Session extension wiring: `SparkSession.builder()
  * .withExtensions(new GraftExtensions)` (or config
  * `spark.sql.extensions=graft.functions.GraftExtensions`) makes the
  * engine's native functions and planner strategies available to plain
  * SQL sessions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_qdot"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[QDotProduct].getName, "graft_qdot"),
        (exprs: Seq[Expression]) => QDotProduct(exprs(0), exprs(1))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_hyperplane_bands"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[QHyperplaneBands].getName, "graft_hyperplane_bands"),
        (exprs: Seq[Expression]) => QHyperplaneBands(exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue(),
          exprs(2).eval().asInstanceOf[Number].intValue())))
    def intArg(e: Expression): Int = e.eval().asInstanceOf[Number].intValue()
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_chargram_minhash"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[QCharGramMinHash].getName, "graft_chargram_minhash"),
        (exprs: Seq[Expression]) => QCharGramMinHash(exprs(0), intArg(exprs(1)))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_chargram_hashes"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[QCharGramHashes].getName, "graft_chargram_hashes"),
        (exprs: Seq[Expression]) => QCharGramHashes(exprs(0), intArg(exprs(1)))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_wordgram_minhash"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[QWordGramSignature].getName, "graft_wordgram_minhash"),
        (exprs: Seq[Expression]) => QWordGramSignature(exprs(0), intArg(exprs(1)))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_wordgram_hashes"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[QWordGramHashes].getName, "graft_wordgram_hashes"),
        (exprs: Seq[Expression]) => QWordGramHashes(exprs(0), intArg(exprs(1)))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_simhash"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[QSimHashSignature].getName, "graft_simhash"),
        (exprs: Seq[Expression]) => QSimHashSignature(exprs(0))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cms_buckets"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[QCmsBuckets].getName, "graft_cms_buckets"),
        (exprs: Seq[Expression]) => QCmsBuckets(exprs(0), intArg(exprs(1)),
          intArg(exprs(2)))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cdc_anchors"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[QCdcAnchors].getName, "graft_cdc_anchors"),
        (exprs: Seq[Expression]) => QCdcAnchors(exprs(0), intArg(exprs(1)),
          intArg(exprs(2)))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_subl2"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[QSubL2].getName, "graft_subl2"),
        (exprs: Seq[Expression]) => QSubL2(exprs(0), exprs(1), intArg(exprs(2)))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_sorted_intersect"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[QSortedIntersectCount].getName, "graft_sorted_intersect"),
        (exprs: Seq[Expression]) => QSortedIntersectCount(exprs(0), exprs(1))))
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    // transparent MV routing: aggregates over a registered base table
    // rewrite to a scan of the stored view (MaterializedAgg + MvRewrite)
    e.injectOptimizerRule(_ => graft.plans.MvRewrite)
  }
}
