package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `token_stats(text) → array<bigint> [n_tokens, sum_token_chars,
  * n_punct]`: the whitespace-token count, the total CHARACTER length of
  * all tokens, and the `[.,!?;:]` punctuation count in one native pass —
  * the quantities every quality filter derives from the tokenization
  * (`regexp_count(text, '\S+')`,
  * `aggregate(regexp_extract_all(...), 0L, (a, x) -> a + length(x))` and
  * `regexp_count(text, '[.,!?;:]')`; the punctuation count rides the
  * same byte walk for free where the regexp form costs a second full
  * text pass per row).
  *
  * Tokens are maximal non-`\s` byte runs (Java's default `\s` is ASCII,
  * and those bytes never occur inside a multibyte UTF-8 char); character
  * length counts non-continuation bytes, matching `length()` on each
  * token; the punctuation classes are single ASCII bytes, so the byte
  * test equals the regex on any UTF-8 input. Equivalence with the regexp
  * formulations is pinned by WordGramsSpec.
  */
case class TokenStatsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_stats"

  override protected def nullSafeEval(input: Any): Any =
    TokenStatsExpr.compute(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenStatsExpr.compute($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenStatsExpr {
  private def isWs(b: Byte): Boolean =
    b == ' ' || (b >= '\t' && b <= '\r') // Java regex \s (ASCII)

  private def isPunct(b: Byte): Boolean =
    b == '.' || b == ',' || b == '!' || b == '?' || b == ';' || b == ':'

  def compute(bytes: Array[Byte]): ArrayData = {
    var nTokens = 0L
    var sumChars = 0L
    var nPunct = 0L
    val n = bytes.length
    var i = 0
    while (i < n) {
      if (!isWs(bytes(i))) {
        nTokens += 1
        while (i < n && !isWs(bytes(i))) {
          if ((bytes(i) & 0xC0) != 0x80) sumChars += 1 // non-continuation byte = one char
          if (isPunct(bytes(i))) nPunct += 1
          i += 1
        }
      } else i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(Array(nTokens, sumChars, nPunct))
  }
}
