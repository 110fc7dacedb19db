package graft.functions.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Gopher repetition stats (Rae et al. 2021, Table A1) in ONE pass per
  * row: `t2` = max over word 2-grams of count × gram character length
  * (coverage of the heaviest 2-gram), `d5` = total characters inside
  * duplicated word 5-grams (Σ count × length over grams with count
  * > 1). Both are per-DOCUMENT statistics — nothing about them needs
  * another row — so computing them row-locally replaces the explode →
  * (doc, n, gram) shuffle → per-doc reduce → spine join the catalog
  * carried through r16: at 100 TB that shape shuffles ~|corpus words|
  * rows twice where this is a scan-speed projection with zero
  * exchanges (the pii_redact/char_entropy class).
  *
  * Exactness contract (the DuckDB oracle is unchanged):
  *  - tokens are `split(text, ' ')` with Spark's limit = -1 semantics
  *    (consecutive separators yield empty tokens; trailing empties are
  *    KEPT — Java's bare `String.split` drops them, so the tokenizer
  *    here scans boundaries manually);
  *  - a k-gram is the k tokens joined by a single space, which — since
  *    every inter-token separator is exactly one space — is precisely
  *    the substring of `text` between the first token's start and the
  *    last token's end, so gram identity is substring equality;
  *  - gram length is counted in CODE POINTS (Spark `length`/DuckDB
  *    `length` both count characters, not UTF-16 units): per-token
  *    code-point counts are prefix-summed once, a gram's length is
  *    Σ token lengths + (k−1).
  * Ties in the max are irrelevant: max over `count × length` is a max
  * over longs, deterministic regardless of gram order.
  *
  * Work per row is O(chars) time and O(distinct grams) space — bounded
  * by the document, never the corpus, so executor memory is safe at
  * any scale.
  */
case class GopherRepetition(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_gopher_rep"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("graft_gopher_rep expects string")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("t2", LongType, nullable = false),
    StructField("d5", LongType, nullable = false)))

  override protected def nullSafeEval(text: Any): Any =
    GopherRepetition.compute(text.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val cls = GopherRepetition.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) " +
        s"$cls.compute($t.toString());"
    })

  override protected def withNewChildInternal(newChild: Expression): GopherRepetition =
    copy(child = newChild)
}

object GopherRepetition {

  def compute(s: String): InternalRow = {
    // token boundaries under split(' ', -1): starts(i) inclusive,
    // ends(i) exclusive, in UTF-16 char indices
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var from = 0
    var sp = s.indexOf(' ')
    while (sp >= 0) {
      starts.add(from); ends.add(sp)
      from = sp + 1
      sp = s.indexOf(' ', from)
    }
    starts.add(from); ends.add(s.length) // trailing token (possibly "")
    val nTok = starts.size()
    var t2 = 0L
    var d5 = 0L
    if (nTok >= 2) {
      // code-point length per token, prefix-summed: a k-gram's length
      // is cpPrefix(i+k) − cpPrefix(i) + (k−1)
      val cpPrefix = new Array[Long](nTok + 1)
      var i = 0
      while (i < nTok) {
        cpPrefix(i + 1) = cpPrefix(i) +
          s.codePointCount(starts.get(i), ends.get(i))
        i += 1
      }
      def gramLen(i: Int, k: Int): Long =
        cpPrefix(i + k) - cpPrefix(i) + (k - 1)
      def countGrams(k: Int): java.util.HashMap[String, Array[Long]] = {
        val m = new java.util.HashMap[String, Array[Long]]()
        var i = 0
        val last = nTok - k
        while (i <= last) {
          val g = s.substring(starts.get(i), ends.get(i + k - 1))
          val slot = m.computeIfAbsent(g, _ => new Array[Long](2))
          slot(0) += 1L
          if (slot(0) == 1L) slot(1) = gramLen(i, k)
          i += 1
        }
        m
      }
      val g2 = countGrams(2).values().iterator()
      while (g2.hasNext) {
        val e = g2.next()
        val v = e(0) * e(1)
        if (v > t2) t2 = v
      }
      if (nTok >= 5) {
        val g5 = countGrams(5).values().iterator()
        while (g5.hasNext) {
          val e = g5.next()
          if (e(0) > 1L) d5 += e(0) * e(1)
        }
      }
    }
    new GenericInternalRow(Array[Any](t2, d5))
  }

  val info = new ExpressionInfo(classOf[GopherRepetition].getName,
    "graft_gopher_rep")

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_gopher_rep"), info,
      (children: Seq[Expression]) => GopherRepetition(children.head))
}
