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

  /** Stopword lookup with ZERO allocation per word run — the shared
    * packed-long open-addressed table ([[PackedWordTable]]); mask bit i
    * marks profile i. The previous HashMap<String,_> form allocated a
    * String per word run — ~300 allocations per document on the hot
    * scan path. */
  private val stopwordTable = new PackedWordTable(
    StopwordProfiles.zipWithIndex.flatMap { case ((_, ws), i) =>
      ws.map(w => (w, 1 << i))
    })

  /** Trigram patterns dispatched by FIRST byte: `triByFirst(b)` holds the
    * (language, pattern) list whose pattern starts with byte `b`, null
    * for the ~240 bytes that start no pattern — so the per-position cost
    * of the scan is one array load instead of trying every language's
    * every pattern (the previous shape: ~20 compares per byte). */
  private val triByFirst: Array[Array[(Int, Array[Byte])]] = {
    val t = TrigramProfiles.map(_._2.map(_.getBytes("UTF-8")).toArray).toArray
    // The cursor scan is order-blind; that is only sound when no two
    // alternatives of one profile can match at the same position.
    t.foreach { pats =>
      for (a <- pats; b <- pats if !(a sameElements b))
        require(a(0) != b(0) || a(1) != b(1),
          "trigram profiles must not share a 2-byte prefix within a language")
    }
    val byFirst = new Array[Array[(Int, Array[Byte])]](256)
    val all = for {
      (pats, lang) <- t.zipWithIndex.toSeq
      pat <- pats
    } yield (lang, pat)
    all.groupBy(_._2(0) & 0xff).foreach { case (b, ps) =>
      // Keep language order: ties at one position across languages must
      // credit every language, in the same order the flat loop did.
      byFirst(b) = ps.sortBy(_._1).toArray
    }
    byFirst
  }

  private def isWord(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'

  def compute(s: UTF8String): ArrayData = {
    val bytes = s.toLowerCase.getBytes
    val n = bytes.length
    val scores = new Array[Int](NumLangs)
    // Stopwords: maximal word-char runs, packed-long-probed when short
    // enough.
    var i = 0
    while (i < n) {
      if (isWord(bytes(i))) {
        val st = i
        while (i < n && isWord(bytes(i))) i += 1
        if (i - st <= stopwordTable.maxLen) {
          val mask = stopwordTable.lookup(bytes, st, i)
          if (mask != 0) {
            var l = 0
            while (l < NumLangs) {
              if ((mask & (1 << l)) != 0) scores(l) += 3
              l += 1
            }
          }
        }
      } else i += 1
    }
    // Trigrams: per-language greedy non-overlapping cursor, first-byte
    // dispatched.
    val nextOk = new Array[Int](NumLangs)
    i = 0
    while (i < n) {
      val pats = triByFirst(bytes(i) & 0xff)
      if (pats != null) {
        var p = 0
        while (p < pats.length) {
          val lang = pats(p)._1
          if (i >= nextOk(lang)) {
            val pat = pats(p)._2
            if (i + pat.length <= n) {
              var k = 1
              while (k < pat.length && bytes(i + k) == pat(k)) k += 1
              if (k == pat.length) { scores(lang) += 1; nextOk(lang) = i + pat.length }
            }
          }
          p += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(scores)
  }
}
