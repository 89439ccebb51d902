package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Landed SQ8 index: stored probe ≡ in-session on a full-corpus write,
  * re-landing is a no-op, and late out-of-range vectors clamp. */
class LandedSq8Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.mkString("|")).toSeq

  private def drop(t: String): Unit =
    Seq(t, s"${t}_grid", s"${t}_meta").foreach(x =>
      spark.sql(s"DROP TABLE IF EXISTS $x"))

  test("full-corpus write: stored probe ≡ in-session sq8TopK bit-equal") {
    val emb = graft.core.Tables.load(spark, TestSpark.Sf, "embeddings")
    val (inSession, f1) = graft.ops.Materialize.collecting {
      rows(ScalarQuant.sq8TopK(emb, "vec_id", "embedding",
        Seq(0L, 1L, 2L), dim = 64, topK = 10))
    }
    graft.ops.Materialize.release(f1)
    drop("graft_test_sq8")
    CorpusWriter.writeSq8Index(emb, "vec_id", "embedding", dim = 64,
      "graft_test_sq8", buckets = 8)
    try {
      val (stored, f2) = graft.ops.Materialize.collecting {
        rows(ScalarQuant.sq8TopKFromIndex(spark, "graft_test_sq8",
          emb.filter(col("vec_id").isin(0L, 1L, 2L)), "vec_id",
          "embedding", dim = 64, topK = 10))
      }
      graft.ops.Materialize.release(f2)
      assert(stored == inSession)
    } finally drop("graft_test_sq8")
  }

  test("stored probe scans the codes table ONCE for the whole batch") {
    val emb = graft.core.Tables.load(spark, TestSpark.Sf, "embeddings")
    drop("graft_test_sq8s")
    CorpusWriter.writeSq8Index(emb, "vec_id", "embedding", dim = 64,
      "graft_test_sq8s", buckets = 8)
    try {
      val (scored, frames) = graft.ops.Materialize.collecting {
        val d = ScalarQuant.sq8ScoredFromIndex(spark, "graft_test_sq8s",
          emb.filter(col("vec_id").isin(0L, 1L, 2L)), "vec_id",
          "embedding", dim = 64)
        d.collect()
        d
      }
      try {
        val (mem, file) = PlanShapes.topLevelScans(scored)
        val names = PlanShapes.topLevelNodeNames(scored)
        assert(file == 1 && mem == 0, s"(mem=$mem, file=$file)\n$names")
        assert(!names.exists(_.startsWith("Union")), names)
      } finally graft.ops.Materialize.release(frames)
    } finally drop("graft_test_sq8s")
  }

  test("re-landing the same batch is a no-op; row count stays the corpus") {
    val emb = graft.core.Tables.load(spark, TestSpark.Sf, "embeddings")
    val n = emb.count()
    drop("graft_test_sq8b")
    CorpusWriter.writeSq8Index(emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", dim = 64, "graft_test_sq8b", buckets = 8)
    try {
      CorpusWriter.appendToSq8Index(emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", "graft_test_sq8b")
      assert(spark.table("graft_test_sq8b").count() == n)
      CorpusWriter.appendToSq8Index(emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", "graft_test_sq8b")
      assert(spark.table("graft_test_sq8b").count() == n)
    } finally drop("graft_test_sq8b")
  }

  test("late vectors beyond the frozen grid clamp to the byte range") {
    val train = Seq((0L, Seq(0.0f, 0.0f)), (1L, Seq(1.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val grid = ScalarQuant.gridRows(train, "vec_id", "embedding", dim = 2)
    val mn = grid.map(_._2).toArray
    val dl = grid.map(_._3).toArray
    val late = Seq((2L, Seq(5.0f, -5.0f)), (3L, Seq(-5.0f, 5.0f)))
      .toDF("vec_id", "embedding")
    val codes = ScalarQuant.encodeUnderGrid(late, "vec_id", "embedding",
        mn, dl)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    assert(codes(2L) == Seq(255L, 0L)) // above max / below min
    assert(codes(3L) == Seq(0L, 255L))
  }
}
