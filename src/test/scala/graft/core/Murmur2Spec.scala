package graft.core

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

class Murmur2Spec extends AnyFunSuite {

  test("reference known-answer: key k2 lands on partition 3 of 10") {
    // Asserted by the reference's own integration harness via
    // `--partitions 3` (`/root/reference/run-integration-tests:153-158`).
    assert(Murmur2.partition("k2", 10) == 3)
  }

  test("partition is always in [0, n) — 2000 random keys × varied n") {
    val rnd = new Random(42)
    for (_ <- 1 to 2000) {
      val key = rnd.alphanumeric.take(1 + rnd.nextInt(24)).mkString
      val n = 1 + rnd.nextInt(64)
      val p = Murmur2.partition(key, n)
      assert(p >= 0 && p < n, s"key=$key n=$n p=$p")
    }
  }

  test("toPositive maps Int.MinValue safely") {
    assert(Murmur2.toPositive(Int.MinValue) == 0)
    assert(Murmur2.toPositive(-1) == Int.MaxValue)
  }

  test("string and byte overloads agree on ASCII (oracle precondition)") {
    val rnd = new Random(7)
    for (_ <- 1 to 500) {
      val key = rnd.alphanumeric.take(1 + rnd.nextInt(16)).mkString
      assert(Murmur2.partition(key, 10) ==
        Murmur2.partition(key.getBytes("UTF-8"), 10))
    }
  }

  test("hash is deterministic across calls") {
    val h1 = Murmur2.hash("stable".getBytes)
    assert(h1 == Murmur2.hash("stable".getBytes))
  }
}
