package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native SimHash: text -> 60-bit fingerprint over the token multiset,
  * in one pass (tokenize, 60-bit md5 per token, ±1 bit votes, sign).
  * Replaces the Seq[String]-boxing UDF formulation; token hashing
  * matches `CAST(concat('0x', substr(md5(tok),1,15)) AS BIGINT)` so
  * the DuckDB oracle reproduces fingerprints exactly.
  */
case class Simhash60(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_simhash60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("graft_simhash60 expects string")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(text: Any): Any =
    Simhash60.compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => {
      val cls = Simhash60.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"$cls.compute($t)"
    })

  override protected def withNewChildInternal(newChild: Expression): Simhash60 =
    copy(child = newChild)
}

object Simhash60 {
  def compute(text: UTF8String): Long = {
    val votes = new Array[Int](60)
    val md = MessageDigest.getInstance("MD5")
    val tokens = text.toString.split(" ", -1)
    var t = 0
    while (t < tokens.length) {
      val h = ShingleHashes.hash60(md, tokens(t))
      var b = 0
      while (b < 60) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var sim = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) sim |= (1L << b); b += 1 }
    sim
  }

  val info = new ExpressionInfo(classOf[Simhash60].getName, "graft_simhash60")

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_simhash60"), info,
      (children: Seq[Expression]) => Simhash60(children.head))
}
