package graft.functions.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: exact dot product of two `array<long>`
  * columns (`sum(a[i] * b[i])`).
  *
  * Why a custom expression (SURVEY §7.3 preference order (b)): the
  * composable formulation `aggregate(zip_with(a, b, _*_), 0L, _+_)`
  * is a CodegenFallback chain — per row it allocates the zipped array
  * and evaluates the lambda interpreter per element, which measured
  * ~100x slower on the 64-dim embedding corpus. This version compiles
  * to a tight primitive loop inside whole-stage codegen (`doGenCode`),
  * which is what a 100 TB similarity scan needs.
  *
  * Null semantics: null array -> null; null *elements* contribute 0
  * (quantized vectors never carry null elements).
  */
case class LongArrayDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_qdot expects (array<bigint>, array<bigint>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_qdot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
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
         |int $n = $a.numElements() < $b.numElements()
         |    ? $a.numElements() : $b.numElements();
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
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Session-scoped registration so `expr("graft_qdot(a, b)")` resolves.
  * Idempotent; also injectable cluster-wide via [[GraftExtensions]].
  */
object GraftFunctions {
  val qdotInfo = new ExpressionInfo(classOf[LongArrayDot].getName, "graft_qdot")

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_qdot"), qdotInfo,
      (children: Seq[Expression]) => LongArrayDot(children.head, children(1)))
}

/** `SparkSessionExtensions` hook for spark.sql.extensions=
  * graft.functions.expressions.GraftExtensions (cluster deployments
  * get the function without touching session internals).
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_qdot"),
      GraftFunctions.qdotInfo,
      (children: Seq[Expression]) => LongArrayDot(children.head, children(1))))
    // band joins (|a-b| <= tol with no equi key) plan as banded
    // equi-joins instead of nested loops
    ext.injectOptimizerRule(_ => graft.plans.BandJoinRule)
  }
}
