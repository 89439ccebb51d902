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
}
