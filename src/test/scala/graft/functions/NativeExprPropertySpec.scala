package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Randomized property tests for the driver-callable native-expression
  * kernels — seeded, so failures replay. The PII scrubber is checked
  * against an INDEPENDENT `java.util.regex`-based reference (the chain
  * semantics its scaladoc argues equivalence with); argmax_dot against a
  * naive fold; sorted_intersect_count against Set intersection. These
  * complement the Spark-level equivalence gates with input shapes no
  * hand-written fixture enumerates (random adjacency of pattern
  * fragments, multibyte boundaries, pathological digit runs).
  */
class NativeExprPropertySpec extends AnyFunSuite {

  // -------------------------------------------------------- pii reference

  /** Reference PII chain: regex email/phone/IP stages, then the
    * maximal-run + Luhn CCN stage written over String (independent of
    * the byte-loop's structure). */
  private def refPii(s: String): (Long, Long, Long, Long, String) = {
    import graft.pipeline.TextStats.{EmailPattern, PhonePattern, IpPattern}
    def stage(in: String, pattern: String, repl: String): (Long, String) = {
      val m = java.util.regex.Pattern.compile(pattern).matcher(in)
      var n = 0L
      val sb = new StringBuffer
      while (m.find()) { n += 1; m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(repl)) }
      m.appendTail(sb)
      (n, sb.toString)
    }
    val (ne, t1) = stage(s, EmailPattern, "<EMAIL>")
    val (np, t2) = stage(t1, PhonePattern, "<PHONE>")
    val (ni, t3) = stage(t2, IpPattern, "<IP>")
    // CCN: maximal digit runs, 13–19 digits, Luhn via reversed-string map.
    def luhn(run: String): Boolean = {
      val ds = run.reverse.map(_ - '0')
      val sum = ds.zipWithIndex.map { case (d, i) =>
        if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum
      sum % 10 == 0
    }
    val m = java.util.regex.Pattern.compile("[0-9]+").matcher(t3)
    var nc = 0L
    val sb = new StringBuffer
    while (m.find()) {
      val run = m.group()
      if (run.length >= 13 && run.length <= 19 && luhn(run)) {
        nc += 1
        m.appendReplacement(sb, "<CCN>")
      } else m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(run))
    }
    m.appendTail(sb)
    (ne, np, ni, nc, sb.toString)
  }

  private val PiiFragments = IndexedSeq(
    "a@b.cd", "jane.doe@example.org", "x@y", "@@", "a.b@", ".a@b.c",
    "+1-555-0", "+1-555-0142", "++1-555-01",
    "1.2.3.4", "10.0.12.255", "999.999.999.999", "1234.5.6.7",
    "1.2.3.45678", "...", "..", "4111111111111111", "4111111111111112",
    "0079927398713", "941111111111111112222", " ", "  ", "é", "中文", "☃",
    "abc", "x9", "-", "+", "0", "123", "55555555555555555555"
  )

  private def randomPii(rnd: Random): String =
    Seq.fill(rnd.nextInt(12))(PiiFragments(rnd.nextInt(PiiFragments.length)))
      .mkString("")

  test("pii_scrub ≡ independent regex-chain reference on 500 random strings") {
    val rnd = new Random(20260812L)
    (1 to 500).foreach { i =>
      val s = randomPii(rnd)
      val row = PiiScrubExpr.compute(UTF8String.fromString(s))
      val got = (row.getLong(0), row.getLong(1), row.getLong(2),
        row.getLong(3), row.getUTF8String(4).toString)
      assert(got == refPii(s), s"case $i input: <$s>")
    }
  }

  // -------------------------------------------------------- argmax_dot

  test("argmax_dot ≡ naive sequential argmax on 300 random matrices") {
    val rnd = new Random(42L)
    (1 to 300).foreach { i =>
      val k = 1 + rnd.nextInt(20)
      val dim = 1 + rnd.nextInt(16)
      val v = Array.fill(dim)(rnd.nextGaussian())
      val cents = Array.fill(k)(Array.fill(dim)(rnd.nextGaussian()))
      val off = Array.fill(k)(rnd.nextGaussian())
      val ids = Array.tabulate(k)(m => rnd.nextLong())
      val row = ArgmaxDotExpr.compute(
        new GenericArrayData(v),
        new GenericArrayData(cents.map(c => new GenericArrayData(c): AnyRef)),
        new GenericArrayData(off),
        new GenericArrayData(ids))
      var bestS = (0 until dim).foldLeft(0.0)((a, j) => a + v(j) * cents(0)(j)) - off(0)
      var bestId = ids(0)
      (1 until k).foreach { m =>
        val s = (0 until dim).foldLeft(0.0)((a, j) => a + v(j) * cents(m)(j)) - off(m)
        if (s > bestS) { bestS = s; bestId = ids(m) }
      }
      assert(row.getLong(0) == bestId &&
        java.lang.Double.doubleToLongBits(row.getDouble(1)) ==
          java.lang.Double.doubleToLongBits(bestS), s"case $i")
    }
  }

  test("argmax_dot rejects a centroid/query dimension mismatch loudly") {
    // vec_dot folds over the shorter operand, so a mismatched row would
    // silently truncate the dot — a plausible-but-wrong assignment. The
    // contract error must fire instead (ADVICE r7).
    val v = Array(1.0, 2.0, 3.0)
    val cents = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0)) // row 1 short
    val e = intercept[IllegalArgumentException] {
      ArgmaxDotExpr.compute(
        new GenericArrayData(v),
        new GenericArrayData(cents.map(c => new GenericArrayData(c): AnyRef)),
        new GenericArrayData(Array(0.0, 0.0)),
        new GenericArrayData(Array(0L, 1L)))
    }
    assert(e.getMessage.contains("dimension mismatch") &&
      e.getMessage.contains("row 1"), e.getMessage)
  }

  // --------------------------------------------- sorted_intersect_count

  test("sorted_intersect_count ≡ Set intersection on 300 random sorted arrays") {
    val rnd = new Random(7L)
    (1 to 300).foreach { i =>
      def arr() = Array.fill(rnd.nextInt(40))(rnd.nextInt(30)).distinct.sorted
      val a = arr(); val b = arr()
      val got = SortedIntersectCountExpr.count(
        new GenericArrayData(a), new GenericArrayData(b))
      assert(got == a.toSet.intersect(b.toSet).size, s"case $i: ${a.toSeq} ${b.toSeq}")
    }
  }

  // ------------------------------------------------- incremental parser

  test("IncrementalJson: random chunk boundaries never change the emitted objects") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    val rnd = new Random(99L)
    val nasty = IndexedSeq("{", "}", "{{", "\\", "\"", "plain", "a{b}c",
      "é中☃", "", "{\"fake\":1}", "line\nbreak", "tab\t")
    (1 to 200).foreach { i =>
      val objs = Seq.fill(1 + rnd.nextInt(6)) {
        val v = Seq.fill(1 + rnd.nextInt(3))(nasty(rnd.nextInt(nasty.length))).mkString("")
        s"""{"k":${mapper.writeValueAsString(v)},"n":${rnd.nextInt(100)}}"""
      }
      val full = graft.console.IncrementalJson.PioneerPrefix +
        objs.map("," + _).mkString("") + "]"
      val parser = new graft.console.IncrementalJson.Parser()
      val emitted = Seq.newBuilder[String]
      var rest = full
      while (rest.nonEmpty) {
        val n = 1 + rnd.nextInt(math.min(7, rest.length))
        emitted ++= parser.append(rest.take(n))
        rest = rest.drop(n)
      }
      assert(emitted.result() == objs, s"case $i full: <$full>")
    }
  }
}
