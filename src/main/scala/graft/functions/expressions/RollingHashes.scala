package graft.functions.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Windowed polynomial rolling hashes: the hash of EVERY W-char span,
  * `h(i) = Σ_{j=0..W-1} (c(i−j)+1)·B^j mod M` for 1-based end
  * positions i in [W, n] — the O(n) primitive behind exact-substring
  * dedup (Lee et al. 2022 use suffix arrays; hashing every span and
  * equi-joining on the hash is the distributable replacement: shared
  * spans collide on the same key, so cross-document repeats reduce to
  * a groupBy). Same rolling recurrence as [[CdcBoundaries]] but
  * emitting the hash VALUES instead of sparse cut positions, and with
  * a ~2^40 modulus so collisions stay negligible at corpus scale
  * (both engines compute identical hashes, so any collision is
  * identical too — the oracle still matches bit-for-bit).
  *
  * Overflow contract (fits in long): M < 2^45 for the `h·B` step and
  * (c+1)·B^w < 2^17·M for the roll-out step. Contract: BMP text.
  */
case class RollingHashes(child: Expression, window: Int, base: Int,
                         mod: Long) extends UnaryExpression {

  override def prettyName: String = "graft_rolling_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_rolling_hashes expects a string input")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(s: Any): Any =
    RollingHashes.compute(s.asInstanceOf[UTF8String].toString,
      window, base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = RollingHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$cls.compute($c.toString(), $window, $base, ${mod}L);"
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHashes =
    copy(child = newChild)
}

object RollingHashes {
  /** Hash of the span ending at each 1-based position i in [w, n], in
    * position order — length max(n − w + 1, 0).
    */
  def compute(s: String, w: Int, b: Int, m: Long): GenericArrayData = {
    val n = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    if (n >= w) {
      var bw = 1L // B^w mod M
      var j = 0
      while (j < w) { bw = bw * b % m; j += 1 }
      var h = 0L
      var i = 0
      while (i < n) {
        h = (h * b + (s.charAt(i) + 1L)) % m
        if (i >= w) h = ((h - (s.charAt(i - w) + 1L) * bw % m) % m + m) % m
        if (i + 1 >= w) out += h
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  val info = new ExpressionInfo(classOf[RollingHashes].getName,
    "graft_rolling_hashes")

  /** Registered form: `graft_rolling_hashes(text, window, base, mod)`
    * with constant window/base/mod.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_rolling_hashes"), info,
      (children: Seq[Expression]) => {
        require(children.size == 4,
          "graft_rolling_hashes(text, window, base, mod)")
        def const(i: Int): Long = children(i) match {
          case e if e.foldable => e.eval() match {
            case x: Int => x.toLong
            case x: Long => x
            case x => throw new IllegalArgumentException(
              s"argument $i must be an integer constant, got $x")
          }
          case e => throw new IllegalArgumentException(
            s"argument $i must be a constant, got $e")
        }
        val (window, base, mod) = (const(1), const(2), const(3))
        // .toInt would silently truncate (2^32+5 → 5); the overflow
        // contract in evalString needs (c+1)·B^w terms < 2^63, which
        // M < 2^45 with B < 2^17 guarantees.
        require(window >= 1 && window <= Int.MaxValue,
          s"window must be in [1, 2^31), got $window")
        require(base >= 2 && base < (1L << 17),
          s"base must be in [2, 2^17), got $base")
        require(mod >= 2 && mod < (1L << 45),
          s"mod must be in [2, 2^45) (overflow contract), got $mod")
        RollingHashes(children.head, window.toInt, base.toInt, mod)
      })
}
