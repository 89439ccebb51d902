package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `pii_scrub(text) → struct<n_emails bigint, n_phones bigint,
  * n_ips bigint, n_ccns bigint, scrubbed string>`: count and redact the
  * PII patterns of [[graft.pipeline.TextStats]] (`<EMAIL>` / `<PHONE>` /
  * `<IP>` / `<CCN>`) in four byte passes, each over the previous pass's
  * intermediate — replacing the per-row `java.util.regex` chain that
  * dominated the scrub at corpus scale.
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
  *  - IPv4 `[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}`: a dotted
  *    octet can only match where ≤ 3 digits are followed by the literal
  *    `.` — a longer digit run leaves a digit (not `.`) after every
  *    backtrack, so the attempt at that start position fails and the
  *    scan moves one byte right, exactly Java/RE2 find semantics (a
  *    match MAY begin mid-run: `1234.5.6.7` → `1<IP>`; the last octet
  *    is greedy-3 with no trailing constraint: `1.2.3.45678` →
  *    `<IP>78`). Deliberately no 0–255 octet-value check — the
  *    conservative scrub-more choice, and what keeps the three
  *    renderings (byte loop, Java regex, RE2) provably aligned;
  *  - credit cards are NOT a regex: a maximal digit run of 13–19 digits
  *    is redacted iff it passes the Luhn checksum (doubling every
  *    second digit from the right), so `4111111111111111` goes, an
  *    arbitrary 16-digit number stays. Runs are maximal — a valid CCN
  *    embedded in a longer digit run does not match (no mid-run
  *    starts), and separator-grouped renderings (`4111 1111 …`) are
  *    out of scope by design;
  *  - each pass runs over the previous intermediate exactly like the
  *    composed `regexp_replace` chain, and no placeholder can seed a
  *    later pattern (`<EMAIL>`/`<PHONE>`/`<IP>` contain no digits —
  *    nothing a later pass matches);
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
    StructField("n_ips", LongType, nullable = false),
    StructField("n_ccns", LongType, nullable = false),
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

  private val Ip = "<IP>".getBytes("US-ASCII")
  private val Ccn = "<CCN>".getBytes("US-ASCII")

  /** End offset of an IPv4-pattern match starting exactly at `p`, or -1.
    * Octets 1–3: 1–3 digits followed by the literal '.'; a 4th digit
    * means Java/RE2 backtracking can never reach a '.' from this start
    * position (see the class scaladoc). Octet 4: greedy, up to 3. */
  private def matchIpAt(bytes: Array[Byte], p: Int): Int = {
    val n = bytes.length
    var pos = p
    var oct = 0
    while (oct < 3) {
      var r = 0
      while (r <= 3 && pos + r < n && isDigit(bytes(pos + r))) r += 1
      if (r == 0 || r > 3 || pos + r >= n || bytes(pos + r) != '.') return -1
      pos += r + 1
      oct += 1
    }
    var r = 0
    while (r < 3 && pos + r < n && isDigit(bytes(pos + r))) r += 1
    if (r == 0) -1 else pos + r
  }

  /** Replace IPv4 matches; returns (count, out bytes). */
  private def scrubIps(bytes: Array[Byte]): (Long, Array[Byte]) = {
    val n = bytes.length
    val out = new java.io.ByteArrayOutputStream(n)
    var count = 0L
    var copied = 0
    var i = 0
    while (i < n) {
      val end = matchIpAt(bytes, i)
      if (end != -1) {
        out.write(bytes, copied, i - copied)
        out.write(Ip, 0, Ip.length)
        count += 1
        copied = end
        i = end
      } else i += 1
    }
    out.write(bytes, copied, n - copied)
    (count, out.toByteArray)
  }

  /** Luhn checksum over `len` digit bytes at `start`: doubling every
    * second digit from the right, 9-fold on overflow, sum ≡ 0 mod 10. */
  private def luhnOk(bytes: Array[Byte], start: Int, len: Int): Boolean = {
    var sum = 0
    var j = 0
    while (j < len) {
      var d = bytes(start + len - 1 - j) - '0'
      if (j % 2 == 1) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      j += 1
    }
    sum % 10 == 0
  }

  /** Replace Luhn-valid 13–19-digit maximal runs; returns (count, out
    * bytes). */
  private def scrubCcns(bytes: Array[Byte]): (Long, Array[Byte]) = {
    val n = bytes.length
    val out = new java.io.ByteArrayOutputStream(n)
    var count = 0L
    var copied = 0
    var i = 0
    while (i < n) {
      if (isDigit(bytes(i))) {
        var j = i
        while (j < n && isDigit(bytes(j))) j += 1
        val len = j - i
        if (len >= 13 && len <= 19 && luhnOk(bytes, i, len)) {
          out.write(bytes, copied, i - copied)
          out.write(Ccn, 0, Ccn.length)
          count += 1
          copied = j
        }
        i = j
      } else i += 1
    }
    out.write(bytes, copied, n - copied)
    (count, out.toByteArray)
  }

  def compute(s: UTF8String): InternalRow = {
    val (ne, s1) = scrubEmails(s.getBytes)
    val (np, s2) = scrubPhones(s1)
    val (ni, s3) = scrubIps(s2)
    val (nc, s4) = scrubCcns(s3)
    new GenericInternalRow(Array[Any](ne, np, ni, nc, UTF8String.fromBytes(s4)))
  }
}
