package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Snapshot landing: the retire-before-admit semantics on planted
  * cases, composition agreement with the diff, and fixture invariants. */
class SnapshotLandingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // Long repeated bodies so shingling has material to work with.
  private val bodyA = Array.tabulate(30)(i => s"alpha$i beta$i gamma$i").mkString(" ")
  private val bodyB = Array.tabulate(30)(i => s"delta$i epsil$i zetaa$i").mkString(" ")

  test("a changed doc does not collide with its own superseded text") {
    import spark.implicits._
    // Doc 1 changes slightly between snapshots. If the stale index row
    // survived, the new text would be a near-dup of its own old self and
    // landing would wrongly reject the update.
    val a = Seq((1L, bodyA), (2L, bodyB)).toDF("doc_id", "text")
    val b = Seq((1L, bodyA + " v2"), (2L, bodyB)).toDF("doc_id", "text")
    val r = SnapshotLanding.landingAdmissions(a, b, "doc_id", "text", 0.5)
      .collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === 1L && r(0).getString(1) === "changed")
    assert(!r(0).getBoolean(2) && !r(0).getBoolean(3) && r(0).getBoolean(4),
      s"changed doc should admit cleanly: ${r(0)}")
  }

  test("an added doc duplicating standing content is rejected") {
    import spark.implicits._
    val a = Seq((1L, bodyA)).toDF("doc_id", "text")
    // 10 is an exact copy of standing doc 1; 11 a near-dup (one token
    // appended); 12 fresh content.
    val b = Seq((1L, bodyA), (10L, bodyA), (11L, bodyA + " tail"),
      (12L, bodyB)).toDF("doc_id", "text")
    val r = SnapshotLanding.landingAdmissions(a, b, "doc_id", "text", 0.5)
      .collect().map(x => x.getLong(0) ->
        (x.getString(1), x.getBoolean(2), x.getBoolean(3), x.getBoolean(4)))
      .toMap
    assert(r.keySet === Set(10L, 11L, 12L))
    assert(r(10L) === (("added", true, true, false)))
    val (st11, ex11, near11, adm11) = r(11L)
    assert(st11 === "added" && !ex11 && near11 && !adm11)
    assert(r(12L) === (("added", false, false, true)))
  }

  test("removed docs appear nowhere; unchanged docs are not re-admitted") {
    import spark.implicits._
    val a = Seq((1L, bodyA), (2L, bodyB)).toDF("doc_id", "text")
    val b = Seq((2L, bodyB), (3L, bodyA + " fresh tail here")).toDF("doc_id", "text")
    val r = SnapshotLanding.landingAdmissions(a, b, "doc_id", "text", 0.5)
      .collect()
    // Only the added doc 3 is in the report: 1 was removed, 2 unchanged.
    assert(r.map(_.getLong(0)).toSeq === Seq(3L))
  }

  test("fixture: report ids ≡ the diff's added∪changed slice") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val v1 = docs.filter(col("doc_id") % 17 =!= 3)
    val v2 = docs.filter(col("doc_id") % 17 =!= 5)
      .withColumn("text", when(col("doc_id") % 13 === 0,
        concat(col("text"), lit(" edited"))).otherwise(col("text")))
    val landed = SnapshotLanding.landingAdmissions(v1, v2, "doc_id", "text", 0.5)
    val expect = CorpusDiff.diff(v1, v2, "doc_id", "text")
      .filter(col("status") =!= "removed")
    assert(landed.count() === expect.count())
    assert(landed.join(expect, Seq("doc_id", "status")).count() === expect.count())
    // Statuses partition the report.
    val sts = landed.select("status").distinct().collect()
      .map(_.getString(0)).toSet
    assert(sts.subsetOf(Set("added", "changed")) && sts.nonEmpty)
  }
}
