package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Residual IVF-PQ (r19): the IVFADC residual refinement — codebooks
  * train on vec − coarse_centroid, score = ⟨q, c_cell⟩ + LUT fold.
  * The full-path correctness gate is q181's DuckDB oracle; these pins
  * cover the degeneracies and the recall claim the refinement exists
  * for. */
class ResidualPqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val emb =
    graft.core.Tables.load(spark, TestSpark.Sf, "embeddings")

  private val Q = Seq(0L, 1L, 2L)
  private val KCoarse = 8

  test("nprobe = kCoarse degeneracy: every vector is a candidate; fewer probes are a bit-equal sub-multiset") {
    val n = emb.count()
    val all = ProductQuant.residualIvfAdcScored(emb, "vec_id", "embedding",
        Q, KCoarse, coarseRounds = 2, m = 8, k = 16, pqRounds = 2,
        dim = 64, nprobe = KCoarse)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    // Full-corpus degeneracy: with every cell probed the scan cut is
    // gone — each query scores exactly N − 1 candidates (self excluded).
    Q.foreach { q =>
      assert(all.count(_._1._1 == q) === n - 1,
        s"query $q did not score the full corpus at nprobe = kCoarse")
    }
    // Probe-count invariance: nprobe only gates WHICH cells score; a
    // candidate's score never depends on it (cell term + residual LUT
    // are per-(q, vec)) — so the nprobe=3 scores are a sub-multiset of
    // the full scan's, bit-for-bit.
    val allMap = all.toMap
    val few = ProductQuant.residualIvfAdcScored(emb, "vec_id", "embedding",
        Q, KCoarse, coarseRounds = 2, m = 8, k = 16, pqRounds = 2,
        dim = 64, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(few.nonEmpty && few.length < all.length)
    few.foreach { case (key, s) =>
      assert(java.lang.Double.doubleToLongBits(allMap(key)) ===
        java.lang.Double.doubleToLongBits(s), s"score moved for $key")
    }
  }

  test("residual encoding buys recall over raw-vector IVF-PQ at the same m, k, nprobe") {
    // Context for the bar: at 500 near-random fixture vectors the
    // refinement is close to noise (measured sweep: residual wins at
    // (m=4,k=8) 16>15 and (m=8,k=16) 20>19 over queries 0–4, loses at
    // others) — the gains the literature reports need corpora whose
    // coarse cells actually explain variance. The acceptance bar
    // (VERDICT r18 #6) is ≥ at the q86/q181 settings, where it holds
    // strictly with this query set.
    val qs = Seq(0L, 1L, 2L, 3L, 4L)
    def total(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val rows = df.select("n_exact", "n_hit").collect()
      (rows.map(_.getLong(0)).sum, rows.map(_.getLong(1)).sum)
    }
    val (exactR, hitR) = total(ProductQuant.annRecallResidual(emb,
      "vec_id", "embedding", qs, KCoarse, coarseRounds = 2, m = 8, k = 16,
      pqRounds = 2, dim = 64, nprobe = 3, topK = 10))
    val (exactP, hitP) = total(ProductQuant.annRecall(emb,
      "vec_id", "embedding", qs, KCoarse, coarseRounds = 2, m = 8, k = 16,
      pqRounds = 2, dim = 64, nprobe = 3, topK = 10))
    assert(exactR === exactP)
    assert(hitR >= hitP, s"residual recall $hitR/$exactR below raw $hitP/$exactP")
  }
}
