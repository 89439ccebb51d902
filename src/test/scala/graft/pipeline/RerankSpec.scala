package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Two-stage refined retrieval: with every cell probed and the
  * shortlist covering the corpus it IS the exact retrieval; with a
  * real shortlist its hit rate dominates plain ADC's; and the rerank
  * never invents candidates the ADC pass didn't shortlist. */
class RerankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def emb = graft.core.Tables.load(spark, TestSpark.Sf, "embeddings")
  private val Q = Seq(0L, 1L, 2L)

  /** Exact lifted-dot top-k per query, computed independently in-JVM
    * (same sequential fold as vec_dot). */
  private def exactTopK(topK: Int): Map[Long, Seq[(Long, Double)]] = {
    import spark.implicits._
    val lifted = Clustering.lifted(emb, "vec_id", "embedding")
      .select("vec_id", "fxd").as[(Long, Array[Double])].collect().toMap
    Q.map { qid =>
      val q = lifted(qid)
      qid -> lifted.toSeq.filter(_._1 != qid)
        .map { case (vid, v) => (vid, VecOps.dot(v, q)) }
        .sortBy { case (vid, s) => (-s, vid) }.take(topK)
    }.toMap
  }

  test("full probe + corpus-wide shortlist ≡ exact retrieval, bit-equal") {
    val n = emb.count().toInt
    val r = ProductQuant.ivfAdcRerankTopK(emb, "vec_id", "embedding",
        queryIds = Q, kCoarse = 4, coarseRounds = 1, m = 8, k = 16,
        pqRounds = 2, dim = 64, nprobe = 4, shortlist = n - 1, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exact = exactTopK(5)
    val expect = Q.flatMap(qid => exact(qid).map { case (vid, s) => (qid, vid, s) })
      .sortBy(t => (t._1, t._2))
    assert(r.toSeq === expect)
  }

  test("rerank hit count dominates plain ADC's for the same shortlist") {
    val exact = exactTopK(10).map { case (qid, xs) => qid -> xs.map(_._1).toSet }
    def hits(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (qid, xs) =>
          qid -> xs.count(x => exact(qid).contains(x._2)) }
    val adc = hits(ProductQuant.ivfAdcTopK(emb, "vec_id", "embedding",
      queryIds = Q, kCoarse = 8, coarseRounds = 2, m = 8, k = 16,
      pqRounds = 2, dim = 64, nprobe = 3, topK = 10))
    val rer = hits(ProductQuant.ivfAdcRerankTopK(emb, "vec_id", "embedding",
      queryIds = Q, kCoarse = 8, coarseRounds = 2, m = 8, k = 16,
      pqRounds = 2, dim = 64, nprobe = 3, shortlist = 30, topK = 10))
    Q.foreach { qid =>
      assert(rer.getOrElse(qid, 0) >= adc.getOrElse(qid, 0),
        s"qid=$qid rerank ${rer.get(qid)} < adc ${adc.get(qid)}")
    }
  }

  test("rerank candidates ⊆ the ADC shortlist (topK = shortlist → same set)") {
    def ids(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val short = ids(ProductQuant.ivfAdcTopK(emb, "vec_id", "embedding",
      queryIds = Q, kCoarse = 8, coarseRounds = 2, m = 8, k = 16,
      pqRounds = 2, dim = 64, nprobe = 3, topK = 15))
    val rer = ids(ProductQuant.ivfAdcRerankTopK(emb, "vec_id", "embedding",
      queryIds = Q, kCoarse = 8, coarseRounds = 2, m = 8, k = 16,
      pqRounds = 2, dim = 64, nprobe = 3, shortlist = 15, topK = 15))
    assert(rer === short)
  }

  test("topK above shortlist is rejected") {
    intercept[IllegalArgumentException] {
      ProductQuant.ivfAdcRerankTopK(emb, "vec_id", "embedding",
        queryIds = Q, kCoarse = 8, coarseRounds = 2, m = 8, k = 16,
        pqRounds = 2, dim = 64, nprobe = 3, shortlist = 5, topK = 10)
    }
  }
}
