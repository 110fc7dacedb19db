package graft.functions.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row code-point-trigram TYPE counts in one O(chars) pass:
  * `[(tri, c), …]` in first-occurrence order — the row-local partial
  * aggregate the charlm/langid TRAIN sides explode instead of raw
  * occurrences. Two wins over `transform(sequence(1, n−2), i →
  * substring(text, i, 3))`:
  *
  *  1. `substring(text, i, 3)` re-locates the code-point offset by
  *     scanning from the string head on EVERY call, so building the
  *     occurrence array is O(n²) per row; this walks three cursors one
  *     code point apart — O(n).
  *  2. The explode then emits one row per trigram TYPE per doc, not
  *     per occurrence — the map-side combine Spark would do after the
  *     Generate, done before it, shrinking the exploded frame by the
  *     per-document repetition factor. Downstream `sum(c)` equals the
  *     old `count(*)` exactly (Σ per-doc counts = total occurrences).
  *
  * Deterministic: first-occurrence order (LinkedHashMap), so retries
  * produce byte-identical arrays; consumers aggregate, so order never
  * reaches a result anyway. Trigram identity is code-point slicing,
  * matching Spark `substring` / DuckDB `substr` (the [[CharlmScore]]
  * discipline).
  */
case class CharTrigramCounts(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_char_trigram_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_char_trigram_counts expects string")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tri", StringType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)

  override protected def nullSafeEval(text: Any): Any =
    CharTrigramCounts.compute(text.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val cls = CharTrigramCounts.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$cls.compute($t.toString());"
    })

  override protected def withNewChildInternal(newChild: Expression): CharTrigramCounts =
    copy(child = newChild)
}

object CharTrigramCounts {

  def compute(s: String): GenericArrayData = {
    val counts = new java.util.LinkedHashMap[String, Array[Long]]()
    val nUtf16 = s.length
    var a = 0; var b = 0; var c = 0 // starts of the trigram's 3 cps
    var cp = 0
    var j = 0
    while (j < nUtf16) {
      val step = Character.charCount(s.codePointAt(j))
      j += step
      cp += 1
      if (cp == 2) b = j - step
      if (cp == 3) c = j - step
      if (cp >= 3) {
        val slot = counts.computeIfAbsent(s.substring(a, j),
          _ => new Array[Long](1))
        slot(0) += 1L
        a = b; b = c; c = j
      }
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

  val info = new ExpressionInfo(classOf[CharTrigramCounts].getName,
    "graft_char_trigram_counts")

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_char_trigram_counts"), info,
      (children: Seq[Expression]) => CharTrigramCounts(children.head))
}
