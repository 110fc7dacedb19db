package graft.functions.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE-ish token count: the number of matches of the GPT-2-style
  * pre-tokenizer ` ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+` counted in ONE byte
  * scan with zero allocation — a match is exactly a maximal run of
  * same-class non-space bytes (space never joins a run), so counting
  * class-run starts equals counting regex matches. Replaces
  * `size(regexp_extract_all(...))`, which allocates the full match
  * array per row just to take its length — on the 100 TB token-billing
  * path that's the difference between a scan-speed projection and a
  * regex-engine bottleneck. Equality with the regex formulation is
  * pinned in NativeExpressionsSpec.
  *
  * ASCII classes only, byte-safe for UTF-8: multi-byte codepoints have
  * the high bit set, so every byte of one lands in the "other" class
  * and a run of them counts once, same as the regex's `[^a-z0-9 ]+`.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_token_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("graft_token_count expects string")
  }

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(text: Any): Any =
    TokenCount.compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => {
      val cls = TokenCount.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"$cls.compute($t)"
    })

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

object TokenCount {
  // classes: 0 = space (never part of a run), 1 = [a-z], 2 = [0-9],
  // 3 = everything else (incl. every byte of a multi-byte codepoint)
  private def cls(b: Byte): Int = {
    if (b == ' ') 0
    else if (b >= 'a' && b <= 'z') 1
    else if (b >= '0' && b <= '9') 2
    else 3
  }

  def compute(text: UTF8String): Int = {
    val bytes = text.getBytes
    var count = 0
    var prev = 0 // class of previous byte; 0 = boundary
    var i = 0
    while (i < bytes.length) {
      val c = cls(bytes(i))
      if (c != 0 && c != prev) count += 1
      prev = c
      i += 1
    }
    count
  }

  val info = new ExpressionInfo(classOf[TokenCount].getName, "graft_token_count")

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_token_count"), info,
      (children: Seq[Expression]) => TokenCount(children.head))
}
