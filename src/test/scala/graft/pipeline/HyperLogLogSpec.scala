package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** HyperLogLog registers: merge ≡ union, audit column exactness, the
  * estimator's error envelope, and the degenerate edges. */
class HyperLogLogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val docs =
    graft.core.Tables.load(spark, TestSpark.Sf, "documents")

  test("register partition: sum(nd) per key equals exact distinct fps") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val viaRegisters = HyperLogLog.report(docs, "text", "source", n = 3)
      .select("source", "exact_distinct")
      .as[(String, Long)].collect().toMap
    val direct = docs
      .select(col("source"), explode(graft.functions.GraftFunctions
        .wordGramHashes(col("text"), 3)).as("fp"))
      .groupBy("source").agg(count_distinct(col("fp")).as("nd"))
      .as[(String, Long)].collect().toMap
    assert(viaRegisters == direct)
  }

  test("merge of two slice sketches ≡ the union sketch, bit-for-bit") {
    val a = HyperLogLog.sketchOf(docs.filter(col("doc_id") % 2 === 0), "text")
    val b = HyperLogLog.sketchOf(docs.filter(col("doc_id") % 2 === 1), "text")
    val union = HyperLogLog.sketchOf(docs, "text")
    assert(HyperLogLog.merge(a, b).toSeq == union.toSeq)
    // idempotent and commutative — the order-free guarantees
    assert(HyperLogLog.merge(union, a).toSeq == union.toSeq)
    assert(HyperLogLog.merge(b, a).toSeq == HyperLogLog.merge(a, b).toSeq)
  }

  test("estimate lands inside the HLL error envelope per source") {
    import spark.implicits._
    val rows = HyperLogLog.report(docs, "text", "source", n = 3)
      .select("source", "est_distinct", "exact_distinct")
      .as[(String, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, est, exact) =>
      assert(exact > 0, src)
      // raw-regime check: fixture 3-gram cardinality (~1.3k/source)
      // sits well past 2.5m = 640, so no small-range correction needed
      assert(exact > (5 * HyperLogLog.M) / 2,
        s"$src: fixture not in the raw regime (exact=$exact)")
      // raw estimator, m=256: sigma ~ 1.04/16 = 6.5%; allow 4 sigma
      val rel = math.abs(est - exact) / exact.toDouble
      assert(rel < 0.26, s"$src: est=$est exact=$exact rel=$rel")
    }
  }

  test("driver estimate matches the in-plan estimate on the same sum") {
    import spark.implicits._
    val (sScaled, est) = HyperLogLog.report(docs, "text", "source")
      .select("s_scaled", "est_distinct")
      .as[(Long, Double)].collect().head
    val full = HyperLogLog.sketchOf(docs, "text")
    // rebuild the source-agnostic sum shape: the formula is shared, so
    // feeding the report's own integer sum must reproduce its double
    val viaFormula = HyperLogLog.AlphaE9.toDouble *
      HyperLogLog.M * HyperLogLog.M *
      (1L << HyperLogLog.ScaleBits).toDouble / 1000000000.0 / sScaled.toDouble
    assert(est == viaFormula)
    assert(HyperLogLog.estimate(full) > 0.0)
  }

  test("empty input: untouched registers, saturating estimate path") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val s = HyperLogLog.sketchOf(empty, "text")
    assert(s.forall(_ == 0))
    // all-zero registers: sum = m * 2^52, estimate = alpha * m — the
    // raw estimator's floor, finite and positive
    val est = HyperLogLog.estimate(s)
    assert(est > 0.0 && est < HyperLogLog.M.toDouble)
    assert(HyperLogLog.report(empty, "text", "doc_id").isEmpty)
  }

  test("register-sidecar compaction: report bit-equal, rows fold to keys × hit registers") {
    val tbl = "graft_test_hll_compact"
    CorpusWriter.writeHllRegisters(docs.filter(col("doc_id") % 2 === 0),
      "text", "source", tbl, n = 3)
    CorpusWriter.appendToHllRegisters(docs.filter(col("doc_id") % 2 === 1),
      "text", "source", tbl, landingTag = "odds")
    // The same BATCH under a second tag: duplicates by (key, register)
    // accumulate ROWS across landings (harmless to the reader's max) —
    // exactly what compaction folds.
    CorpusWriter.appendToHllRegisters(docs.filter(col("doc_id") % 2 === 1),
      "text", "source", tbl, landingTag = "odds-again")
    // A REPLAY of an applied tag is skipped (the partition is the
    // applied-marker) — rows unchanged.
    val rowsPreReplay = spark.table(tbl).count()
    CorpusWriter.appendToHllRegisters(docs.filter(col("doc_id") % 2 === 1),
      "text", "source", tbl, landingTag = "odds")
    assert(spark.table(tbl).count() == rowsPreReplay)
    def report() = HyperLogLog.reportFromRegisters(spark, tbl, "source", n = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSeq
    val before = report()
    val rowsBefore = spark.table(tbl).count()
    CorpusWriter.compactHllRegisters(spark, tbl)
    assert(report() == before)
    val rowsAfter = spark.table(tbl).count()
    assert(rowsAfter < rowsBefore, s"$rowsBefore -> $rowsAfter")
    // Fully folded: one row per distinct (key, register) pair, all in
    // the __base partition.
    assert(rowsAfter ==
      spark.table(tbl).select("key", "register").distinct().count())
    assert(spark.table(tbl).select("landing").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("__base"))
  }

  test("per-landing retirement: dropping a landing's partition serves the remaining union (r19)") {
    val tbl = "graft_test_hll_retire"
    val tRef = "graft_test_hll_retire_ref"
    Seq(tbl, s"${tbl}_meta", tRef, s"${tRef}_meta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val evens = docs.filter(col("doc_id") % 2 === 0)
    val odds = docs.filter(col("doc_id") % 2 === 1)
    CorpusWriter.writeHllRegisters(evens, "text", "source", tbl, n = 3)
    CorpusWriter.appendToHllRegisters(odds, "text", "source", tbl,
      landingTag = "odds")
    // Retire the odds landing: O(1) partition drop, no corpus re-read.
    CorpusWriter.retireFromHllRegisters(spark, tbl, "odds")
    CorpusWriter.writeHllRegisters(evens, "text", "source", tRef, n = 3)
    def report(t: String) =
      HyperLogLog.reportFromRegisters(spark, t, "source", n = 3)
        .collect().map(_.mkString("|")).toSeq
    assert(report(tbl) == report(tRef),
      "retired landing still visible in the fold")
    // Retiring a tag that is not present raises loudly.
    val e = intercept[IllegalArgumentException] {
      CorpusWriter.retireFromHllRegisters(spark, tbl, "odds")
    }
    assert(e.getMessage.contains("not present"))
    // A kept landing survives compaction retireable; a folded one not.
    CorpusWriter.appendToHllRegisters(odds, "text", "source", tbl,
      landingTag = "odds2")
    CorpusWriter.compactHllRegisters(spark, tbl,
      keepLandings = Seq("odds2"))
    CorpusWriter.retireFromHllRegisters(spark, tbl, "odds2")
    assert(report(tbl) == report(tRef))
    Seq(tbl, s"${tbl}_meta", tRef, s"${tRef}_meta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("rho rank: saturation and width arithmetic") {
    // payload 0 -> RhoMax; top-bit-set payload -> 1
    import spark.implicits._
    val top = 1L << (HyperLogLog.PayloadBits - 1)
    val probe = spark.sql(
      s"""SELECT
         |  CASE WHEN 0 = 0 THEN ${HyperLogLog.RhoMax}
         |       ELSE ${HyperLogLog.RhoMax} - length(bin(0)) END AS zero_rho,
         |  ${HyperLogLog.RhoMax} - length(bin($top)) AS top_rho
         |""".stripMargin).as[(Int, Int)].collect().head
    assert(probe._1 == HyperLogLog.RhoMax)
    assert(probe._2 == 1)
  }
}
