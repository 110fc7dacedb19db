package graft.functions.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking boundaries (the FastCDC/LBFS idea: cut
  * where a rolling hash of the trailing `Window`-gram hits a sparse
  * residue class) — the chunking primitive that makes dedup robust to
  * insertions: a 1-byte edit shifts every FIXED-size chunk after it,
  * but content-defined cuts re-synchronize within one window, so all
  * later chunks hash identically again.
  *
  * The hash is a windowed polynomial over code units,
  * `h(i) = Σ_{j=0..W-1} (c(i−j)+1)·B^j mod M`, boundary after 1-based
  * position `i` iff `i ∈ [W, n)` and `h(i) mod D == 0`. Pure position-
  * local integer arithmetic — no state across rows, codegen'd, O(n)
  * per document — and exactly mirrorable in SQL by list lambdas (the
  * oracle recomputes h from the code-point list). Contract: BMP text
  * (code unit == code point; the corpus is ASCII).
  */
case class CdcBoundaries(child: Expression, window: Int, divisor: Int,
                         base: Int, mod: Int) extends UnaryExpression {

  override def prettyName: String = "graft_cdc_boundaries"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_cdc_boundaries expects a string input")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(s: Any): Any =
    CdcBoundaries.compute(s.asInstanceOf[UTF8String].toString,
      window, divisor, base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = CdcBoundaries.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$cls.compute($c.toString(), $window, $divisor, $base, $mod);"
    })

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

object CdcBoundaries {
  /** 1-based cut positions: a chunk ends AT each returned index. The
    * final position `n` is never returned (the tail chunk always runs
    * to the end). Weights `B^j mod M` multiply the char `j` steps back.
    */
  def compute(s: String, w: Int, d: Int, b: Int, m: Int): GenericArrayData = {
    val n = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    if (n > w) {
      var bw = 1L // B^w mod M
      var j = 0
      while (j < w) { bw = bw * b % m; j += 1 }
      // true rolling update: h_i = B·h_{i-1} + g(c_i) − g(c_{i−w})·B^w,
      // all mod M — O(1) per char; the oracle recomputes the same value
      // as the direct windowed sum
      var h = 0L
      var i = 0
      while (i < n) {
        h = (h * b + (s.charAt(i) + 1L)) % m
        if (i >= w) h = ((h - (s.charAt(i - w) + 1L) * bw % m) % m + m) % m
        val pos = i + 1 // 1-based position of the window's last char
        if (pos >= w && pos < n && h % d == 0) out += pos
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  val info = new ExpressionInfo(classOf[CdcBoundaries].getName,
    "graft_cdc_boundaries")

  /** Registered form takes constant ints:
    * `graft_cdc_boundaries(text, window, divisor, base, mod)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_cdc_boundaries"), info,
      (children: Seq[Expression]) => {
        require(children.size == 5,
          "graft_cdc_boundaries(text, window, divisor, base, mod)")
        def const(i: Int): Int = children(i) match {
          case e if e.foldable => e.eval().asInstanceOf[Int]
          case e => throw new IllegalArgumentException(
            s"argument $i must be a constant int, got $e")
        }
        CdcBoundaries(children.head, const(1), const(2), const(3), const(4))
      })
}
