package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The stored IVF-PQ sidecar (q140): stored ≡ in-session bit-equality
  * and the landing identities, at PQ-code grain. */
class LandedIvfPqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val emb =
    graft.core.Tables.load(spark, TestSpark.Sf, "embeddings")
  private val qids = Seq(0L, 1L, 2L)

  private def queries = emb.filter(col("vec_id").isin(qids: _*))

  private def probeBits(tbl: String) =
    ProductQuant.ivfAdcTopKFromIndex(spark, tbl, queries, "vec_id",
        "embedding", nprobe = 3, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getLong(3)))
      .toSeq

  test("stored-index probe ≡ in-session ivfAdcTopK under the same training corpus") {
    val tbl = "graft_test_ivfpq_full"
    CorpusWriter.writeIvfPqIndex(emb, "vec_id", "embedding", tbl,
      kCoarse = 8, coarseRounds = 2, m = 8, k = 16, pqRounds = 2, dim = 64)
    val stored = probeBits(tbl)
    val live = ProductQuant.ivfAdcTopK(emb, "vec_id", "embedding", qids,
        kCoarse = 8, coarseRounds = 2, m = 8, k = 16, pqRounds = 2,
        dim = 64, nprobe = 3, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getLong(3)))
      .toSeq
    assert(stored == live)
  }

  test("stored probe: ONE member-table scan, directory-pruned to the probed cells") {
    val tbl = "graft_test_ivfpq_shape"
    CorpusWriter.writeIvfPqIndex(emb, "vec_id", "embedding", tbl,
      kCoarse = 8, coarseRounds = 2, m = 8, k = 16, pqRounds = 2, dim = 64)
    val scored = ProductQuant.ivfAdcScoredFromIndex(spark, tbl, queries,
      "vec_id", "embedding", nprobe = 3)
    scored.collect()
    val (mem, file) = PlanShapes.topLevelScans(scored)
    val names = PlanShapes.topLevelNodeNames(scored)
    val p = scored.queryExecution.executedPlan.toString
    assert(file == 1 && mem == 0, s"(mem=$mem, file=$file)\n$names")
    assert(!names.exists(_.startsWith("Union")), names)
    assert(names.exists(_.startsWith("BroadcastHashJoin")), names)
    // The static cell isin reaches the scan as a partition filter, so
    // unprobed cell directories never open.
    assert(p.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("cell")), p)
  }

  test("one landing ≡ two landings, and re-landing a batch is a no-op") {
    val a = emb.filter(col("vec_id") % 2 === 0)
    val b = emb.filter(col("vec_id") % 2 === 1)
    val one = "graft_test_ivfpq_one"
    CorpusWriter.writeIvfPqIndex(a, "vec_id", "embedding", one,
      kCoarse = 8, coarseRounds = 2, m = 8, k = 16, pqRounds = 2, dim = 64)
    CorpusWriter.appendToIvfPqIndex(b, "vec_id", "embedding", one)
    val two = "graft_test_ivfpq_two"
    CorpusWriter.writeIvfPqIndex(a, "vec_id", "embedding", two,
      kCoarse = 8, coarseRounds = 2, m = 8, k = 16, pqRounds = 2, dim = 64)
    CorpusWriter.appendToIvfPqIndex(
      b.filter(col("vec_id") % 3 === 0), "vec_id", "embedding", two)
    CorpusWriter.appendToIvfPqIndex(
      b.filter(col("vec_id") % 3 =!= 0), "vec_id", "embedding", two)
    assert(probeBits(one) == probeBits(two))
    val before = spark.table(one).count()
    CorpusWriter.appendToIvfPqIndex(b, "vec_id", "embedding", one)
    assert(spark.table(one).count() == before)
    assert(probeBits(one) == probeBits(two))
  }

  test("member table stores codes, not vectors (the byte cut)") {
    val tbl = "graft_test_ivfpq_full"
    if (!spark.catalog.tableExists(s"${tbl}_meta"))
      CorpusWriter.writeIvfPqIndex(emb, "vec_id", "embedding", tbl,
        kCoarse = 8, coarseRounds = 2, m = 8, k = 16, pqRounds = 2, dim = 64)
    val fields = spark.table(tbl).schema.fieldNames.toSet
    assert(fields == Set("vec_id", "codes", "cell"))
    val row = spark.table(tbl).limit(1).collect().head
    assert(row.getSeq[Long](row.fieldIndex("codes")).length == 8)
  }
}
