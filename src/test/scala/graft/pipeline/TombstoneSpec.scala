package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Tombstoned deletes (r17): a standing tombstone must make a removal
  * un-servable immediately, answer bit-equal to the applied retirement,
  * and disappear into the member table when applied. */
class TombstoneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb =
    graft.core.Tables.load(spark, TestSpark.Sf, "embeddings")

  private def drop(ts: String*): Unit =
    ts.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  private def probeSq8(t: String): Seq[String] = {
    val (r, frames) = graft.ops.Materialize.collecting {
      ScalarQuant.sq8TopKFromIndex(spark, t,
          emb.filter(col("vec_id").isin(0L, 2L, 4L)), "vec_id",
          "embedding", dim = 64, topK = 10)
        .collect().map(_.mkString("|")).toSeq
    }
    graft.ops.Materialize.release(frames)
    r
  }

  test("SQ8: tombstone probe ≡ retired probe ≡ post-apply probe, bit-for-bit") {
    val tA = "graft_tomb_sq8_a" // tombstoned
    val tB = "graft_tomb_sq8_b" // retired eagerly
    drop(tA, s"${tA}_grid", s"${tA}_meta", s"${tA}_tombs",
      tB, s"${tB}_grid", s"${tB}_meta")
    CorpusWriter.writeSq8Index(emb, "vec_id", "embedding", dim = 64, tA,
      buckets = 8)
    CorpusWriter.writeSq8Index(emb, "vec_id", "embedding", dim = 64, tB,
      buckets = 8)
    val odds = emb.filter(col("vec_id") % 2 === 1)
    // Two tombstone landings + a deliberate duplicate + a never-present id.
    CorpusWriter.appendTombstones(spark, tA,
      emb.filter(col("vec_id") % 4 === 1), "vec_id")
    CorpusWriter.appendTombstones(spark, tA,
      emb.filter(col("vec_id") % 4 === 3), "vec_id")
    CorpusWriter.appendTombstones(spark, tA,
      Seq(1L, 999999999L).toDF("vec_id"), "vec_id")
    CorpusWriter.retireFromSq8Index(spark, tB, odds, "vec_id")
    val tombstoned = probeSq8(tA)
    assert(tombstoned == probeSq8(tB))
    // Member table unchanged while tombstones stand.
    val full = emb.count()
    assert(spark.table(tA).count() == full)
    // Apply folds them in: probe unchanged, sidecar gone, members cut.
    CorpusWriter.applySq8Tombstones(spark, tA)
    assert(!spark.catalog.tableExists(s"${tA}_tombs"))
    assert(spark.table(tA).count() == spark.table(tB).count())
    assert(probeSq8(tA) == tombstoned)
    // Re-applying with no tombstones is a no-op.
    CorpusWriter.applySq8Tombstones(spark, tA)
    assert(probeSq8(tA) == tombstoned)
    drop(tA, s"${tA}_grid", s"${tA}_meta",
      tB, s"${tB}_grid", s"${tB}_meta")
  }

  test("IVF: tombstoned ids vanish from probes immediately; apply preserves answers") {
    val t = "graft_tomb_ivf"
    drop(t, s"${t}_cent", s"${t}_meta", s"${t}_tombs")
    CorpusWriter.writeIvfIndex(emb, "vec_id", "embedding", t,
      k = 8, rounds = 2)
    def probe() = Clustering.ivfTopKFromIndex(spark, t,
        emb.filter(col("vec_id").isin(0L, 2L)), "vec_id", "embedding",
        nprobe = 8, topK = 20)
      .collect().map(_.mkString("|")).toSeq
    val before = probe()
    val doomed = before.map(_.split("\\|")(1).toLong).distinct.take(3)
    CorpusWriter.appendTombstones(spark, t, doomed.toDF("vec_id"), "vec_id")
    val after = probe()
    assert(doomed.forall(id => !after.exists(_.split("\\|")(1).toLong == id)))
    assert(after != before)
    CorpusWriter.applyIvfTombstones(spark, t)
    assert(probe() == after)
    assert(!spark.catalog.tableExists(s"${t}_tombs"))
    drop(t, s"${t}_cent", s"${t}_meta")
  }

  test("IVF-PQ: tombstone probe ≡ post-apply probe") {
    val t = "graft_tomb_ivfpq"
    drop(t, s"${t}_coarse", s"${t}_books", s"${t}_meta", s"${t}_tombs")
    CorpusWriter.writeIvfPqIndex(emb, "vec_id", "embedding", t,
      kCoarse = 8, coarseRounds = 2, m = 8, k = 16, pqRounds = 2, dim = 64)
    def probe() = ProductQuant.ivfAdcTopKFromIndex(spark, t,
        emb.filter(col("vec_id").isin(0L, 2L)), "vec_id", "embedding",
        nprobe = 3, topK = 10)
      .collect().map(_.mkString("|")).toSeq
    CorpusWriter.appendTombstones(spark, t,
      emb.filter(col("vec_id") % 3 === 1), "vec_id")
    val tombstoned = probe()
    CorpusWriter.applyIvfPqTombstones(spark, t)
    assert(probe() == tombstoned)
    drop(t, s"${t}_coarse", s"${t}_books", s"${t}_meta")
  }
}
