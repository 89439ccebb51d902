package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `lang_scores(text) → array<int>`: every language-ID score
  * (`3×stopword hits + trigram hits`, [[graft.pipeline.TextStats]]
  * profile order) in ONE pass over the lowered UTF-8 bytes, replacing
  * 8 `regexp_count` scans of the full text per row.
  *
  * Exact `regexp_count` parity, argued pattern by pattern and pinned by
  * the LangScoresSpec equivalence gate:
  *  - stopword patterns are `\b(w1|...|w8)\b`: a match needs non-word
  *    chars (or edges) on BOTH sides, and Java's default `\w` is ASCII
  *    `[a-zA-Z0-9_]` — so matches are exactly the maximal word-char runs
  *    equal to a profile word, which this scan counts via a hash lookup
  *    per run (two boundary-delimited matches can never overlap);
  *  - trigram patterns are boundary-free alternations: the regex engine
  *    counts non-overlapping occurrences left-to-right, advancing past
  *    each match — reproduced with a per-language cursor (`nextOk`). At
  *    any position at most ONE alternative of a profile can match (no
  *    two share a 2-char prefix — asserted at class init), so
  *    alternation order is immaterial;
  *  - multibyte safety: patterns start with ASCII bytes (continuation
  *    bytes 0x80+ never match), and byte-offset advancement equals the
  *    regex engine's char advancement because match byte-length covers
  *    exactly the matched chars.
  */
case class LangScoresExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lang_scores"

  override protected def nullSafeEval(input: Any): Any =
    LangScoresExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangScoresExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangScoresExpr {
  import graft.pipeline.TextStats.{StopwordProfiles, TrigramProfiles}

  val NumLangs: Int = StopwordProfiles.size

  /** word → bitmask of profile indices claiming it as a stopword. */
  private val stopwordMask: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    StopwordProfiles.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        m.merge(w, Integer.valueOf(1 << i), (a, b) => Integer.valueOf(a | b))
      }
    }
    m
  }
  private val maxStopwordLen = StopwordProfiles.flatMap(_._2).map(_.length).max

  /** Per-language trigram patterns as UTF-8 byte arrays. */
  private val trigrams: Array[Array[Array[Byte]]] = {
    val t = TrigramProfiles.map(_._2.map(_.getBytes("UTF-8")).toArray).toArray
    // The cursor scan is order-blind; that is only sound when no two
    // alternatives of one profile can match at the same position.
    t.foreach { pats =>
      for (a <- pats; b <- pats if !(a sameElements b))
        require(a(0) != b(0) || a(1) != b(1),
          "trigram profiles must not share a 2-byte prefix within a language")
    }
    t
  }

  private def isWord(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'

  def compute(s: UTF8String): ArrayData = {
    val bytes = s.toLowerCase.getBytes
    val n = bytes.length
    val scores = new Array[Int](NumLangs)
    // Stopwords: maximal word-char runs, hash-checked when short enough.
    var i = 0
    while (i < n) {
      if (isWord(bytes(i))) {
        val st = i
        while (i < n && isWord(bytes(i))) i += 1
        val len = i - st
        if (len <= maxStopwordLen) {
          val mask = stopwordMask.get(new String(bytes, st, len, java.nio.charset.StandardCharsets.US_ASCII))
          if (mask != null) {
            var l = 0
            while (l < NumLangs) {
              if ((mask.intValue() & (1 << l)) != 0) scores(l) += 3
              l += 1
            }
          }
        }
      } else i += 1
    }
    // Trigrams: per-language greedy non-overlapping cursor.
    val nextOk = new Array[Int](NumLangs)
    i = 0
    while (i < n) {
      var l = 0
      while (l < NumLangs) {
        if (i >= nextOk(l)) {
          val pats = trigrams(l)
          var p = 0
          var matched = 0
          while (matched == 0 && p < pats.length) {
            val pat = pats(p)
            if (i + pat.length <= n) {
              var k = 0
              while (k < pat.length && bytes(i + k) == pat(k)) k += 1
              if (k == pat.length) matched = pat.length
            }
            p += 1
          }
          if (matched > 0) { scores(l) += 1; nextOk(l) = i + matched }
        }
        l += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(scores)
  }
}
