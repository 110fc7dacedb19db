package graft.functions.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document n-gram-profile language scorer against TRAINED
  * profiles carried inside the expression: for each language profile
  * (top-50 corpus trigrams), the score is |distinct doc trigrams ∩
  * profile|, returned as a struct of per-language longs in profile
  * order. One O(chars) pass per row: code-point trigrams are
  * deduplicated into a per-row set, then each ≤50-entry profile is
  * probed against it — the SMALL side iterates, so per-row work is
  * `n inserts + Σ|profile| probes`, never n×|profiles|.
  *
  * This replaced the r16-era score pipeline (a corpus-grain
  * (doc_id, tri) distinct shuffle + profile join + per-doc reduce +
  * spine join, later a 4× array_intersect whose trigram arrays cost
  * O(n²) in substring scans) with a scan-speed projection. The
  * profiles are bounded by DEFINITION — top-50 × #languages — so
  * shipping them as expression constants carries a ≤200-entry payload
  * regardless of data scale (the builder asserts it).
  *
  * Trigram identity is code-point slicing, identical to Spark
  * `substring` / DuckDB `substr` — the same offsets discipline as
  * [[CharlmScore]].
  */
case class LangidScore(child: Expression, profiles: Array[Array[String]])
    extends UnaryExpression {

  override def prettyName: String = "graft_langid_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("graft_langid_score expects string")
  }

  override def dataType: DataType = StructType(
    profiles.indices.map(i =>
      StructField(s"s$i", LongType, nullable = false)))

  def score(s: String): InternalRow = {
    val nUtf16 = s.length
    val seen = new java.util.HashSet[String]()
    // code-point trigrams, deduplicated: walk three cursors one code
    // point apart so each step is O(1)
    if (nUtf16 > 0) {
      var a = 0 // start of the trigram
      var b = 0 // start of the 2nd code point
      var c = 0 // start of the 3rd code point
      var cp = 0
      var j = 0
      while (j < nUtf16) {
        val step = Character.charCount(s.codePointAt(j))
        j += step
        cp += 1
        if (cp == 2) b = j - step
        if (cp == 3) c = j - step
        if (cp >= 3) {
          seen.add(s.substring(a, j))
          val na = b; val nb = c; val nc = j
          a = na; b = nb; c = nc
        }
      }
    }
    val out = new Array[Any](profiles.length)
    var p = 0
    while (p < profiles.length) {
      var hits = 0L
      val prof = profiles(p)
      var i = 0
      while (i < prof.length) {
        if (seen.contains(prof(i))) hits += 1L
        i += 1
      }
      out(p) = hits
      p += 1
    }
    new GenericInternalRow(out)
  }

  override protected def nullSafeEval(text: Any): Any =
    score(text.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langidScore", this,
      classOf[LangidScore].getName)
    nullSafeCodeGen(ctx, ev, t => {
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) " +
        s"$ref.score($t.toString());"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LangidScore =
    copy(child = newChild)
}

object LangidScore {

  /** Definitional bound: top-K trigrams × #languages. The WorkCount
    * `model` probe measures exactly 250 profile rows (5 languages
    * present × top-50) at sf0.01, sf1 AND sf10 — flat by definition;
    * the langid query then registers its 4 configured languages =
    * 200 entries. 4,096 leaves room for ~80 languages at top-50
    * while anything near the cap means the caller is no longer
    * shipping a profile TABLE. (Was 100,000 through r16 — 500× the
    * definitional size, a gate that could never fire on a real
    * mistake.)
    */
  val MaxProfileEntries: Int = 4096

  val info = new ExpressionInfo(classOf[LangidScore].getName,
    "graft_langid_score")

  /** Session-registers `graft_langid_score(text)` with the profiles
    * captured in the builder, one array per language in output-field
    * order (field i is named `s$i`).
    *
    * Concurrency contract: registration is last-write-wins on the
    * session-global FunctionRegistry, so a builder on a SHARED
    * session must hold `LangidScore.synchronized` across
    * register→eager-analysis (the langid builder does) — otherwise a
    * concurrent builder's register can interleave and the analyzed
    * frame crosses profiles (r16 ADVICE; Verify's pool runs builders
    * on one session).
    */
  def register(spark: SparkSession, profiles: Array[Array[String]]): Unit = {
    val total = profiles.map(_.length.toLong).sum
    require(total <= MaxProfileEntries,
      s"langid profiles carry $total entries — no longer a bounded " +
        s"profile table (cap $MaxProfileEntries)")
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_langid_score"), info,
      (children: Seq[Expression]) => LangidScore(children.head, profiles))
  }
}
