package graft.functions.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Hilbert-curve index of a 2-D grid cell: `xy2d` on a
  * 2^order × 2^order grid (the classic Warren/Wikipedia recurrence,
  * reflect in n-1).
  *
  * Why custom: the recurrence carries (x, y, d) state across `order`
  * conditional rotate/flip steps. Expressed as nested CASE column
  * arithmetic the tree re-substitutes x and y at every level —
  * ~4^order nodes, which at order=8 produced a 174 MB codegen'd task
  * binary. As a native expression it is one 10-line loop, O(order)
  * per row, fully inside whole-stage codegen.
  */
case class HilbertIndex(first: Expression, second: Expression,
                        third: Expression) extends TernaryExpression {

  override def prettyName: String = "graft_hilbert_index"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, LongType, IntegerType) if third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_hilbert_index expects (bigint x, bigint y, constant int order)")
    }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(x: Any, y: Any, o: Any): Any =
    HilbertIndex.compute(x.asInstanceOf[Long], y.asInstanceOf[Long],
      o.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, o) => {
      val cls = HilbertIndex.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.compute($x, $y, $o);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): HilbertIndex =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object HilbertIndex {
  /** xy2d: walk bit levels high→low; at each level pick the quadrant
    * (contributing s²·quadrant to d) then rotate/flip the frame so the
    * next level sees a canonical orientation. Caller contract:
    * 0 <= x, y < 2^order.
    */
  def compute(x0: Long, y0: Long, order: Int): Long = {
    val n = 1L << order
    var x = x0
    var y = y0
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  val info = new ExpressionInfo(classOf[HilbertIndex].getName,
    "graft_hilbert_index")

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_hilbert_index"), info,
      (children: Seq[Expression]) =>
        HilbertIndex(children.head, children(1), children(2)))
}
