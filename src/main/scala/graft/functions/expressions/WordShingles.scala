package graft.functions.expressions

import java.util.Arrays

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingling: text -> SORTED array of DISTINCT
  * space-joined word n-grams, in one pass.
  *
  * Replaces the composable chain
  * `array_sort(array_distinct(transform(sequence(...), i ->
  * concat_ws(" ", element_at(w,i), ...))))` whose interpreted lambdas
  * dominated dedup runtime (6.3s of an 8.5s Jaccard run at sf0.1 was
  * building shingle arrays). Output order/content matches the SQL
  * chain exactly (UTF8 binary sort, set semantics), so DuckDB oracles
  * are unaffected.
  */
case class WordShingles(left: Expression, right: Expression)
  extends BinaryExpression {

  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, IntegerType) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_shingles expects (string, literal int n)")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(text: Any, nAny: Any): Any =
    WordShingles.compute(text.asInstanceOf[UTF8String],
      nAny.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) => {
      val cls = WordShingles.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.compute($t, $n);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShingles =
    copy(left = newLeft, right = newRight)
}

object WordShingles {
  private val space = UTF8String.fromString(" ")

  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val words = text.split(space, -1)
    val count = words.length - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val set = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i < count) {
      // concat_ws(" ", words[i..i+n-1]) equivalent
      var s = words(i)
      var k = 1
      while (k < n) { s = UTF8String.concat(s, space, words(i + k)); k += 1 }
      set.add(s)
      i += 1
    }
    val out = new Array[Any](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  val info = new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles")

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_shingles"), info,
      (children: Seq[Expression]) => WordShingles(children.head, children(1)))
}
