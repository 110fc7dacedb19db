package graft.functions.expressions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Arrays

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native shingle HASHING: text -> sorted array of distinct 60-bit
  * md5 hashes of the word n-grams.
  *
  * The dedup pipelines only ever need shingle IDENTITY (set sizes,
  * intersections, minima) — never the strings — so hashing at the
  * source turns every downstream step into primitive long operations:
  * prefix = leading slice of the sorted array (hash order is a
  * uniform global order, exactly what prefix filtering wants),
  * intersection = long merge scan, join keys = longs. Profiling showed
  * UTF8String shingle arrays dominated the Jaccard verify (19s of a
  * ~25s run at sf0.1).
  *
  * The 60-bit hash is the engine-portable
  * `CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)`; oracles hash
  * identically, so results stay bit-comparable (collisions would need
  * ~2^30 shingles per doc pair to matter).
  */
case class ShingleHashes(left: Expression, right: Expression)
  extends BinaryExpression {

  override def prettyName: String = "graft_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, IntegerType) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_shingle_hashes expects (string, literal int n)")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(text: Any, nAny: Any): Any =
    ShingleHashes.compute(text.asInstanceOf[UTF8String], nAny.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) => {
      val cls = ShingleHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.compute($t, $n);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashes =
    copy(left = newLeft, right = newRight)
}

object ShingleHashes {
  private val hexDigits = "0123456789abcdef".toCharArray

  /** 60-bit portable hash: first 15 hex chars of md5, parsed base 16. */
  def hash60(md: MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    // first 15 hex chars = high 7.5 bytes
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val words = text.toString.split(" ", -1)
    val count = words.length - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Long])
    val md = MessageDigest.getInstance("MD5")
    val hs = new Array[Long](count)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      hs(i) = hash60(md, sb.toString)
      i += 1
    }
    Arrays.sort(hs)
    // in-place dedup of the sorted array
    var w = 0
    var r = 0
    while (r < count) {
      if (w == 0 || hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    new GenericArrayData(Arrays.copyOf(hs, w))
  }

  val info = new ExpressionInfo(classOf[ShingleHashes].getName,
    "graft_shingle_hashes")

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_shingle_hashes"), info,
      (children: Seq[Expression]) => ShingleHashes(children.head, children(1)))
}

/** Merge-scan intersection size for two SORTED long arrays (the
  * hashed-shingle counterpart of [[SortedIntersectSize]]).
  */
case class SortedLongIntersectSize(left: Expression, right: Expression)
  extends BinaryExpression {

  override def prettyName: String = "graft_sorted_long_intersect_size"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_sorted_long_intersect_size expects two array<bigint> inputs")
  }

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedLongIntersectSize.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = SortedLongIntersectSize.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.compute($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersectSize {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var cnt = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { cnt += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    cnt
  }

  val info = new ExpressionInfo(classOf[SortedLongIntersectSize].getName,
    "graft_sorted_long_intersect_size")

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_sorted_long_intersect_size"), info,
      (children: Seq[Expression]) =>
        SortedLongIntersectSize(children.head, children(1)))
}
