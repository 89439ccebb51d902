package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_grams(text, n)` / `token_chunks(text, n)` — word n-grams (sliding
  * window, full windows only) or fixed-size token chunks (stride n, short
  * tail kept) of the lowercased whitespace tokens, space-joined. One native
  * pass over the UTF-8 bytes.
  *
  * Semantics are EXACTLY the composed-built-ins formulation they replace
  * (`transform(sequence(...), i -> array_join(slice(regexp_extract_all(
  * lower(text), '\\S+'), ...), ' '))`, [[graft.pipeline.Decontam]] /
  * [[graft.pipeline.Passages]]) — same DuckDB oracles apply:
  *  - tokens are maximal runs of non-`\s` chars; Java's default `\s` is
  *    ASCII-only (space, \t, \n, \x0B, \f, \r), and in UTF-8 those bytes
  *    never occur inside a multibyte char, so a byte scan is exact for
  *    arbitrary Unicode;
  *  - lowering goes through `UTF8String.toLowerCase` — the same call the
  *    `lower()` expression makes.
  *
  * Why native: the HOF chain materializes a token array, a sequence array,
  * a sliced array and a joined string PER WINDOW — measured ~18× the cost
  * of the tokenization itself at sf0.1 (q42's gram build dominated the
  * whole bench). This expression allocates exactly the output strings.
  */
case class WordGramsExpr(child: Expression, n: Int, chunked: Boolean)
    extends UnaryExpression {
  require(n > 0, s"window size must be positive: $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = if (chunked) "token_chunks" else "word_grams"

  override protected def nullSafeEval(input: Any): Any =
    WordGramsExpr.compute(input.asInstanceOf[UTF8String], n, chunked)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordGramsExpr.compute($c, $n, $chunked)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordGramsExpr {
  private val Empty = new GenericArrayData(new Array[Any](0))

  private def isWs(b: Byte): Boolean =
    b == ' ' || (b >= '\t' && b <= '\r') // \t \n \x0B \f \r — Java regex \s

  def compute(s: UTF8String, n: Int, chunked: Boolean): ArrayData = {
    val bytes = s.toLowerCase.getBytes
    val len = bytes.length
    // Token spans (start, end) over the byte array.
    var starts = new Array[Int](32)
    var ends = new Array[Int](32)
    var count = 0
    var i = 0
    while (i < len) {
      if (!isWs(bytes(i))) {
        val st = i
        while (i < len && !isWs(bytes(i))) i += 1
        if (count == starts.length) {
          starts = java.util.Arrays.copyOf(starts, count * 2)
          ends = java.util.Arrays.copyOf(ends, count * 2)
        }
        starts(count) = st
        ends(count) = i
        count += 1
      } else i += 1
    }
    val step = if (chunked) n else 1
    val m = if (chunked) (count + n - 1) / n else count - n + 1
    if (m <= 0) return Empty
    val out = new Array[Any](m)
    var k = 0
    while (k < m) {
      val first = k * step
      val last = math.min(first + n, count) - 1
      var glen = last - first // separator spaces
      var j = first
      while (j <= last) { glen += ends(j) - starts(j); j += 1 }
      val g = new Array[Byte](glen)
      var pos = 0
      j = first
      while (j <= last) {
        if (j > first) { g(pos) = ' '; pos += 1 }
        val tl = ends(j) - starts(j)
        System.arraycopy(bytes, starts(j), g, pos, tl)
        pos += tl
        j += 1
      }
      out(k) = UTF8String.fromBytes(g)
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Extracts the literal window size from a registered call's 2nd arg. */
  private[functions] def litInt(e: Expression): Int = e match {
    case l if l.foldable && l.dataType == org.apache.spark.sql.types.IntegerType =>
      l.eval().asInstanceOf[Int]
    case other => throw new IllegalArgumentException(
      s"window size must be an INT literal, got $other")
  }
}
