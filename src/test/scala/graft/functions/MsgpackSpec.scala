package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Msgpack decode known-answer vectors, including the reference harness's
  * own: raw bytes of "k" → 107, "v" → 118
  * (`/root/reference/run-integration-tests:161-168`). */
class MsgpackSpec extends AnyFunSuite {
  import MsgpackDeserializer.{decode, render, renderBytes}

  test("reference vectors: ascii byte decodes as positive fixint") {
    assert(decode("k".getBytes) == 107L)
    assert(decode("v".getBytes) == 118L)
    assert(renderBytes("k".getBytes) == "107")
    assert(renderBytes("v".getBytes) == "118")
  }

  test("negative fixint") {
    assert(decode(Array(0xff.toByte)) == -1L)
    assert(decode(Array(0xe0.toByte)) == -32L)
  }

  test("fixstr") {
    // 0xa3 'a' 'b' 'c'
    assert(decode(Array(0xa3.toByte, 'a'.toByte, 'b'.toByte, 'c'.toByte)) == "abc")
    assert(renderBytes(Array(0xa3.toByte, 'a'.toByte, 'b'.toByte, 'c'.toByte)) == "abc")
  }

  test("fixmap renders as JSON") {
    // {"k": 118} = 0x81 0xa1 'k' 0x76
    val bytes = Array(0x81.toByte, 0xa1.toByte, 'k'.toByte, 0x76.toByte)
    assert(decode(bytes) == MsgpackDeserializer.MsgMap(Seq(("k", 118L))))
    assert(renderBytes(bytes) == """{"k": 118}""")
  }

  test("empty containers keep their kind: {} is not []") {
    assert(renderBytes(Array(0x80.toByte)) == "{}")
    assert(renderBytes(Array(0x90.toByte)) == "[]")
  }

  test("fixarray, nil, bool") {
    // [1, true, nil] = 0x93 0x01 0xc3 0xc0
    val bytes = Array(0x93.toByte, 0x01.toByte, 0xc3.toByte, 0xc0.toByte)
    assert(decode(bytes) == Seq(1L, true, null))
    assert(renderBytes(bytes) == "[1, true, null]")
  }

  test("uint8/16 and int8") {
    assert(decode(Array(0xcc.toByte, 0xff.toByte)) == 255L)
    assert(decode(Array(0xcd.toByte, 0x01.toByte, 0x00.toByte)) == 256L)
    assert(decode(Array(0xd0.toByte, 0x80.toByte)) == -128L)
  }

  test("float64") {
    val b = java.nio.ByteBuffer.allocate(9)
    b.put(0xcb.toByte); b.putDouble(1.5)
    assert(decode(b.array()) == 1.5)
  }

  test("str8") {
    val s = "x" * 40
    val bytes = Array(0xd9.toByte, 40.toByte) ++ s.getBytes
    assert(decode(bytes) == s)
  }

  test("unsupported type byte throws") {
    intercept[IllegalArgumentException](decode(Array(0xc1.toByte)))
  }

  // ---- round-trip property: a test-side encoder generates random values
  // across the format subset; decode must invert it exactly.

  private def encode(v: Any, out: java.io.ByteArrayOutputStream): Unit = v match {
    case null => out.write(0xc0)
    case b: Boolean => out.write(if (b) 0xc3 else 0xc2)
    case n: Long if n >= 0 && n <= 0x7f => out.write(n.toInt)
    case n: Long if n >= -32 && n < 0 => out.write((n + 256).toInt)
    case n: Long if n >= Short.MinValue && n <= Short.MaxValue =>
      out.write(0xd1); out.write(((n >> 8) & 0xff).toInt); out.write((n & 0xff).toInt)
    case n: Long => // int64
      out.write(0xd3)
      (7 to 0 by -1).foreach(i => out.write(((n >> (8 * i)) & 0xff).toInt))
    case d: Double =>
      out.write(0xcb)
      val bits = java.lang.Double.doubleToLongBits(d)
      (7 to 0 by -1).foreach(i => out.write(((bits >> (8 * i)) & 0xff).toInt))
    case s: String =>
      val bytes = s.getBytes("UTF-8")
      if (bytes.length <= 31) out.write(0xa0 | bytes.length)
      else { out.write(0xd9); out.write(bytes.length) }
      out.write(bytes)
    case MsgpackDeserializer.MsgMap(entries) =>
      assert(entries.length <= 15)
      out.write(0x80 | entries.length)
      entries.foreach { case (k, x) => encode(k, out); encode(x, out) }
    case xs: Seq[_] =>
      assert(xs.length <= 15)
      out.write(0x90 | xs.length)
      xs.foreach(encode(_, out))
  }

  private def randomValue(rnd: scala.util.Random, depth: Int): Any =
    rnd.nextInt(if (depth >= 2) 5 else 7) match {
      case 0 => null
      case 1 => rnd.nextBoolean()
      case 2 => rnd.nextLong() >> rnd.nextInt(48) // varied magnitudes
      case 3 => java.lang.Double.longBitsToDouble(rnd.nextLong() & ~(1L << 52)) match {
        case d if d.isNaN => 1.5
        case d => d
      }
      case 4 => rnd.alphanumeric.take(rnd.nextInt(40)).mkString
      case 5 => Seq.fill(rnd.nextInt(4))(randomValue(rnd, depth + 1))
      case 6 => MsgpackDeserializer.MsgMap(
        Seq.fill(rnd.nextInt(4))((rnd.alphanumeric.take(3).mkString, randomValue(rnd, depth + 1))))
    }

  test("round-trip property: 300 random nested values decode exactly") {
    val rnd = new scala.util.Random(99)
    for (i <- 1 to 300) {
      val v = randomValue(rnd, 0)
      val out = new java.io.ByteArrayOutputStream()
      encode(v, out)
      assert(decode(out.toByteArray) == v, s"case $i: $v")
    }
  }
}
