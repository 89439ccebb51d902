package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract: entry() answers with rows on sf0.001. */
class EntrySpec extends AnyFunSuite {
  test("flagship entry returns rows") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
  }
}
