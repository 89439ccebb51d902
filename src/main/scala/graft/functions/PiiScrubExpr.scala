package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `pii_scrub(text) → struct<n_emails bigint, n_phones bigint,
  * scrubbed string>`: count and redact the email/phone patterns of
  * [[graft.pipeline.TextStats]] (`<EMAIL>` / `<PHONE>`) in two byte
  * passes — replacing four `java.util.regex` passes per row (two counts
  * + two replaces), which dominated the scrub at corpus scale.
  *
  * EXACTNESS, argued against the regex semantics (and pinned by the
  * PipelineSpec equivalence gate on fixture + adversarial text):
  *  - email `[a-z0-9._]+@[a-z0-9]+\.[a-z]+`: every quantified class is
  *    followed by a character OUTSIDE that class (`@`, `.`, or nothing),
  *    so greedy matching never backtracks productively — a match exists
  *    at a position iff the maximal runs check out. The scan is driven
  *    by `@` positions: maximal `[a-z0-9._]` run ending at the `@`
  *    (clamped at the previous match end, reproducing resume-at-end),
  *    then maximal `[a-z0-9]` run, a literal `.`, and a maximal `[a-z]`
  *    run;
  *  - phone `\+1-555-0[0-9]+`: literal prefix + maximal digit run;
  *  - the phone pass runs over the email-scrubbed intermediate exactly
  *    like the composed `regexp_replace` chain; phone counts on the
  *    intermediate equal counts on the original because the two
  *    pattern alphabets are disjoint (`+`/`-` never occur in an email
  *    match, `<EMAIL>` contains no phone characters);
  *  - all pattern characters are ASCII, and UTF-8 continuation bytes
  *    (≥ 0x80) are outside every class, so the byte walk is exact for
  *    arbitrary Unicode input.
  */
case class PiiScrubExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_emails", LongType, nullable = false),
    StructField("n_phones", LongType, nullable = false),
    StructField("scrubbed", StringType, nullable = false)))
  override def prettyName: String = "pii_scrub"

  override protected def nullSafeEval(input: Any): Any =
    PiiScrubExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiScrubExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PiiScrubExpr {
  private val Email = "<EMAIL>".getBytes("US-ASCII")
  private val Phone = "<PHONE>".getBytes("US-ASCII")
  private val PhonePrefix = "+1-555-0".getBytes("US-ASCII")

  @inline private def isLocal(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || b == '.' || b == '_'
  @inline private def isAlnum(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
  @inline private def isAlpha(b: Byte): Boolean = b >= 'a' && b <= 'z'
  @inline private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'

  /** Replace email matches; returns (count, out bytes). */
  private def scrubEmails(bytes: Array[Byte]): (Long, Array[Byte]) = {
    val n = bytes.length
    val out = new java.io.ByteArrayOutputStream(n)
    var count = 0L
    var copied = 0  // everything before this offset is already emitted
    var lastEnd = 0 // resume-at-end clamp for the local-part run
    var a = 0
    while (a < n) {
      if (bytes(a) == '@') {
        // Maximal local run ending at the '@', not crossing lastEnd.
        var s = a
        while (s > lastEnd && isLocal(bytes(s - 1))) s -= 1
        if (s < a) {
          // Maximal [a-z0-9]+ then '.' then [a-z]+.
          var j = a + 1
          while (j < n && isAlnum(bytes(j))) j += 1
          if (j > a + 1 && j < n && bytes(j) == '.') {
            var k = j + 1
            while (k < n && isAlpha(bytes(k))) k += 1
            if (k > j + 1) {
              out.write(bytes, copied, s - copied)
              out.write(Email, 0, Email.length)
              count += 1
              copied = k
              lastEnd = k
              a = k - 1 // loop increment lands on k
            }
          }
        }
      }
      a += 1
    }
    out.write(bytes, copied, n - copied)
    (count, out.toByteArray)
  }

  /** Replace phone matches; returns (count, out bytes). */
  private def scrubPhones(bytes: Array[Byte]): (Long, Array[Byte]) = {
    val n = bytes.length
    val p = PhonePrefix
    val out = new java.io.ByteArrayOutputStream(n)
    var count = 0L
    var copied = 0
    var i = 0
    while (i + p.length < n + 1) {
      var k = 0
      while (k < p.length && bytes(i + k) == p(k)) k += 1
      if (k == p.length && i + p.length < n && isDigit(bytes(i + p.length))) {
        var j = i + p.length
        while (j < n && isDigit(bytes(j))) j += 1
        out.write(bytes, copied, i - copied)
        out.write(Phone, 0, Phone.length)
        count += 1
        copied = j
        i = j
      } else i += 1
    }
    out.write(bytes, copied, n - copied)
    (count, out.toByteArray)
  }

  def compute(s: UTF8String): InternalRow = {
    val (ne, s1) = scrubEmails(s.getBytes)
    val (np, s2) = scrubPhones(s1)
    new GenericInternalRow(Array[Any](ne, np, UTF8String.fromBytes(s2)))
  }
}
