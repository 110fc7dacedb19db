package graft.functions.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Native set-intersection size for two SORTED string arrays: a
  * merge scan of UTF8String compares, O(|a|+|b|), no allocation.
  *
  * Why custom: `size(array_intersect(a, b))` builds a hash set and an
  * output array per row in interpreted code — measured 2x slower on
  * ~100-element shingle arrays, and it's the per-candidate hot loop of
  * Jaccard verification. Inputs must be sorted ascending
  * (`array_sort`), which Spark's UTF8String binary ordering matches.
  *
  * Duplicate elements are counted like set semantics as long as inputs
  * are duplicate-free (graft always feeds `array_distinct` output).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
  extends BinaryExpression {

  override def prettyName: String = "graft_sorted_intersect_size"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_sorted_intersect_size expects two array<string> inputs")
  }

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectSize.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = SortedIntersectSize.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.compute($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var cnt = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (c == 0) { cnt += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    cnt
  }

  val info = new ExpressionInfo(classOf[SortedIntersectSize].getName,
    "graft_sorted_intersect_size")

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_sorted_intersect_size"), info,
      (children: Seq[Expression]) =>
        SortedIntersectSize(children.head, children(1)))
}
