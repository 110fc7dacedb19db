package graft.functions.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unrestricted Damerau–Levenshtein edit distance (Lowrance & Wagner
  * 1975) as a native codegen'd expression — insertions, deletions,
  * substitutions AND adjacent transpositions, where a transposed pair
  * may be edited again later (unlike the cheaper optimal-string-
  * alignment variant: OSA("ca","abc")=3, true DL=2). Spark ships only
  * plain `levenshtein`; record linkage over human-typed identifiers
  * wants the transposition-aware metric (swapped letters are the most
  * common typo class).
  *
  * Cost: O(|a|·|b|) time, O(|a|·|b|) ints — a row-local projection
  * that stays inside whole-stage codegen (the generated code calls the
  * static matcher, the same pattern Spark's own levenshtein uses).
  * Exact integer output: hash-identical across engines by
  * construction. Cap input lengths upstream for adversarial rows; at
  * 1 kB×1 kB the matrix is 4 MB per row in flight.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_damerau_levenshtein"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_damerau_levenshtein expects (string, string)")
    }

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.distance(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => {
      val cls = DamerauLevenshtein.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"$cls.distance($a.toString(), $b.toString())"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {

  /** Lowrance–Wagner DP over an (n+2)×(m+2) matrix with the `da`
    * last-seen-row map per character and `db` last-match column per
    * row; the fourth recurrence term prices a transposition plus the
    * edits between the transposed characters.
    */
  /** Hard per-side length cap: the DP allocates an (n+2)×(m+2) int
    * matrix, so two unbounded inputs (e.g. 1 MB values) would allocate
    * gigabytes per row and OOM an executor — unlike Spark's built-in
    * linear-space levenshtein. 8 KiB per side bounds the matrix at
    * ~256 MB·0.001 = 268 MB ints worst case per ROW in flight, and is
    * far beyond any fuzzy-match key length; longer inputs fail fast
    * with an explicit message instead of dying in the allocator.
    */
  val MaxLen = 8192

  def distance(a: String, b: String): Int = {
    val n = a.length
    val m = b.length
    require(n <= MaxLen && m <= MaxLen,
      s"graft_damerau_levenshtein input exceeds $MaxLen chars " +
        s"(got $n and $m) — the quadratic DP is for match keys, not " +
        "documents; truncate or pre-filter long values")
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    val d = Array.ofDim[Int](n + 2, m + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= n) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val k: Int = {
          val v = da.get(b.charAt(j - 1)); if (v == null) 0 else v.intValue()
        }
        val l = db
        var cost = 1
        if (a.charAt(i - 1) == b.charAt(j - 1)) { cost = 0; db = j }
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val tra = d(k)(l) + (i - 1 - k) + 1 + (j - 1 - l)
        var best = sub
        if (ins < best) best = ins
        if (del < best) best = del
        if (tra < best) best = tra
        d(i + 1)(j + 1) = best
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    d(n + 1)(m + 1)
  }

  val info = new ExpressionInfo(classOf[DamerauLevenshtein].getName,
    "graft_damerau_levenshtein")

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_damerau_levenshtein"), info,
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_damerau_levenshtein(a, b)")
        DamerauLevenshtein(children.head, children(1))
      })
}
