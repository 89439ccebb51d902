package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class ConfluentWireSpec extends AnyFunSuite {

  test("parses magic 0x00 + big-endian schema id + payload") {
    val bytes = Array[Byte](0x0, 0x0, 0x0, 0x1, 0x2, 'h', 'i')
    val env = ConfluentWire.parse(bytes)
    assert(env.schemaId == 258) // 0x00000102
    assert(new String(env.payload) == "hi")
  }

  test("rejects a wrong magic byte and short messages") {
    intercept[IllegalArgumentException](
      ConfluentWire.parse(Array[Byte](0x1, 0, 0, 0, 1, 2)))
    intercept[IllegalArgumentException](
      ConfluentWire.parse(Array[Byte](0x0, 0, 0)))
  }
}
