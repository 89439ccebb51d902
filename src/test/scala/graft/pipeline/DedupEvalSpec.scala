package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Dedup calibration report: planted geometry (exact replicas captured,
  * disjoint docs absent), band accounting invariants on the fixture, and
  * the predicted-pair mass balancing against q97's own answer. */
class DedupEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("planted corpus: replicas band at 10 and are captured; disjoint pairs absent") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away home"
    val docs = Seq(
      (1L, base), (2L, base), // exact replicas: jaccard 1.0, hamming 0
      (3L, "completely different material about spark catalyst optimizer internals"),
      (4L, "unrelated text on byte pair encoding merge tables for tokenizers"))
      .toDF("doc_id", "text")
    val r = DedupEval.simhashCalibration(docs, "doc_id", "text", 0.3)
      .collect().map(x => x.getInt(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    // Replica pair: band 10, predicted.
    assert(r.contains(10) && r(10) === ((1L, 1L)))
    // No cross pair (3,4) or (1,3)... shares enough shingles to band.
    assert(!r.keys.exists(b => b >= 0 && b < 10))
  }

  test("sampled calibration equals full calibration on the drawn sub-corpus") {
    import org.apache.spark.sql.functions.{col, concat, lit, md5, substring}
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val sampled = DedupEval.simhashCalibration(docs, "doc_id", "text", 0.3,
      sampleRate = 0.5).collect().map(_.toSeq)
    val manual = docs.filter(
      substring(md5(concat(lit("cal:"), col("doc_id").cast("string"))), 1, 4)
        < lit(f"${(0.5 * 65536).toInt}%04x"))
    val want = DedupEval.simhashCalibration(manual, "doc_id", "text", 0.3)
      .collect().map(_.toSeq)
    assert(sampled.toSeq === want.toSeq)
  }

  test("fixture: per-band sanity + predicted mass balances q97") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val rep = DedupEval.simhashCalibration(docs, "doc_id", "text", 0.3)
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2)))
    // n_pred ≤ n_pairs everywhere; bands within [-1, 10].
    assert(rep.forall { case (b, n, p) => p <= n && b >= -1 && b <= 10 })
    // Every predicted pair lands in exactly one band: Σ n_pred equals
    // the q97 operator's own pair count.
    // same detector as the calibration's default: the 32-bit ball
    val predTotal = SimHash.hammingPairs(docs, "doc_id", "text",
      width = SimHash.Bits).count()
    assert(rep.map(_._3).sum === predTotal)
    // Labeled mass: Σ over b≥0 of n_pairs equals the q27 pair count.
    val labTotal = MinHashDedup.jaccardPairs(docs, "doc_id", "text", 0.3).count()
    assert(rep.filter(_._1 >= 0).map(_._2).sum === labTotal)
  }
}
