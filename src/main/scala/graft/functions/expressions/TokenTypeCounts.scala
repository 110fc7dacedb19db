package graft.functions.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row word-token TYPE counts in one O(chars) pass: `[(term, c),
  * …]` in first-occurrence order, under the engine's tokenizer
  * contract `split(text, ' ')` with limit = -1 (consecutive
  * separators yield empty tokens, trailing empties KEPT — the
  * [[GopherRepetition]] boundary discipline).
  *
  * This is the word analog of [[CharTrigramCounts]] with a stronger
  * payoff: when the key frame's grain is (row-key, term), the per-row
  * counts ARE the grouped frame — `explode(graft_token_counts(text))`
  * replaces `explode(tokens) → groupBy(doc_id, term).count()`
  * EXACTLY (doc_id is unique per row), deleting a corpus-sized
  * exchange rather than merely shrinking one. tf-idf's tf frame is
  * the canonical consumer.
  *
  * Deterministic (first-occurrence order, LinkedHashMap); consumers
  * aggregate or checkpoint, so order never reaches a result.
  */
case class TokenTypeCounts(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_token_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_token_counts expects string")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)

  override protected def nullSafeEval(text: Any): Any =
    TokenTypeCounts.compute(text.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val cls = TokenTypeCounts.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$cls.compute($t.toString());"
    })

  override protected def withNewChildInternal(newChild: Expression): TokenTypeCounts =
    copy(child = newChild)
}

object TokenTypeCounts {

  def compute(s: String): GenericArrayData = {
    val counts = new java.util.LinkedHashMap[String, Array[Long]]()
    var from = 0
    var done = false
    while (!done) {
      val sp = s.indexOf(' ', from)
      val end = if (sp >= 0) sp else s.length
      val slot = counts.computeIfAbsent(s.substring(from, end),
        _ => new Array[Long](1))
      slot(0) += 1L
      if (sp >= 0) from = sp + 1 else done = true
    }
    val out = new Array[Any](counts.size())
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(i) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue()(0)))
      i += 1
    }
    new GenericArrayData(out)
  }

  val info = new ExpressionInfo(classOf[TokenTypeCounts].getName,
    "graft_token_counts")

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_token_counts"), info,
      (children: Seq[Expression]) => TokenTypeCounts(children.head))
}
