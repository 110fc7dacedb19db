package graft.functions.expressions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: for a document's HASHED shingle array
  * (graft_shingle_hashes output), computes all k components
  * `min over shingles of md5(j + "|" + hash)` in a single pass — the
  * salted-md5 scheme graft's DuckDB oracles reproduce verbatim
  * (`min(md5('j|' || CAST(h AS VARCHAR)))`).
  *
  * Why custom: the composable formulation explodes shingles
  * (corpus x ~90 rows), runs k md5 expressions per row and k
  * min-aggregates through a full shuffle. This expression keeps
  * signature computation row-local — the only shuffle left in
  * MinHash+LSH dedup is the tiny band-bucket join. At 100 TB that
  * removes the dominant exchange entirely.
  *
  * Returns array<string> (lowercase hex), so downstream band keys
  * (`md5(concat_ws('|', sig[..]))`) stay engine-portable.
  */
case class MinHashSignature(left: Expression, right: Expression)
  extends BinaryExpression {

  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), IntegerType) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_minhash expects (array<bigint>, literal int k)")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override protected def nullSafeEval(arr: Any, kAny: Any): Any =
    MinHashSignature.compute(arr.asInstanceOf[ArrayData],
      kAny.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, k) => {
      val cls = MinHashSignature.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.compute($arr, $k);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSignature =
    copy(left = newLeft, right = newRight)
}

object MinHashSignature {
  private val hexDigits = "0123456789abcdef".toCharArray

  /** Single-pass k-component signature; null shingles skipped. */
  def compute(shingles: ArrayData, k: Int): GenericArrayData = {
    val mins = new Array[Array[Byte]](k)
    val md = MessageDigest.getInstance("MD5")
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val hStr = String.valueOf(shingles.getLong(i))
          .getBytes(StandardCharsets.US_ASCII)
        var j = 0
        while (j < k) {
          md.reset()
          md.update(String.valueOf(j).getBytes(StandardCharsets.US_ASCII))
          md.update('|'.toByte)
          md.update(hStr)
          val d = md.digest()
          if (mins(j) == null || unsignedLess(d, mins(j))) mins(j) = d
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](k)
    var j = 0
    while (j < k) {
      out(j) = if (mins(j) == null) null else UTF8String.fromString(hex(mins(j)))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Unsigned byte compare == lexicographic compare of the lowercase
    * hex rendering (what the SQL `min(md5(...))` oracle does).
    */
  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  private def hex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    bytes.foreach { b =>
      sb.append(hexDigits((b >> 4) & 0xf)).append(hexDigits(b & 0xf))
    }
    sb.toString
  }

  val info = new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash")

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_minhash"), info,
      (children: Seq[Expression]) =>
        MinHashSignature(children.head, children(1)))
}
