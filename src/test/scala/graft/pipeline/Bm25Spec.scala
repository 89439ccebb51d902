package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** BM25 retrieval: exact-rational checks at k1=0 (where saturation is
  * identically 1 and the score IS the idf ratio), ranking properties at
  * the default parameters, and fixture invariants. */
class Bm25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("k1=0 degenerates to summed idf ratios — exact values") {
    import spark.implicits._
    // N=3; df(x)=1, df(z)=2; idf_x = 2.5/1.5, idf_z = 1.5/2.5.
    val docs = Seq((1L, "x x y"), (2L, "y z"), (3L, "z z z z"))
      .toDF("doc_id", "text")
    val r = Bm25.topK(docs, "doc_id", "text", Seq("x", "z"), k = 3,
        k1 = 0.0, b = 0.75)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    val idfX = math.floor((2.5 / 1.5) * 1.0 * 1048576.0).toLong
    val idfZ = math.floor((1.5 / 2.5) * 1.0 * 1048576.0).toLong
    assert(r(1L) === (1L, idfX)) // only "x"
    assert(r(2L) === (1L, idfZ)) // only "z"
    assert(r(3L) === (1L, idfZ)) // tf saturates away at k1=0
  }

  test("rarity dominates: the doc with the rare term outranks common-term docs") {
    import spark.implicits._
    val docs = Seq((1L, "rare common a b"), (2L, "common a b c"),
      (3L, "common b c d"), (4L, "a b c d")).toDF("doc_id", "text")
    val top = Bm25.topK(docs, "doc_id", "text", Seq("rare", "common"), k = 4)
      .collect()
    assert(top.head.getLong(0) === 1L) // rare+common beats common-only
    assert(top.map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
  }

  test("self-retrieval MRR: unique-content docs rank themselves first") {
    import spark.implicits._
    // doc 0 poses its own first 5 tokens; its content is unique, so it
    // must rank 1 with full reciprocal mass.
    val docs = Seq(
      (0L, "quartz vixen jumps over zebra quickly"),
      (1L, "common words shared by all documents here"),
      (2L, "common words shared by all documents too"))
      .toDF("doc_id", "text")
    val r = Bm25.selfRetrievalMrr(docs, "doc_id", "text", mod = 1L,
      maxQueries = 8, nTerms = 5, k = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.length === 3)
    assert(r.head === ((0L, 1L, Bm25.Scale)))
    // Every query doc contains its own query terms, so none can miss
    // entirely on this tiny corpus.
    assert(r.forall(_._2 >= 1L))
  }

  test("self rank agrees with the single-query topK replay per query") {
    import org.apache.spark.sql.functions.{col, size, slice}
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val got = Bm25.selfRetrievalMrr(docs, "doc_id", "text", mod = 97L,
      maxQueries = 4, nTerms = 5, k = 10)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got.nonEmpty)
    got.foreach { case (qid, rank) =>
      val terms = docs
        .filter(col("doc_id") === qid)
        .select(slice(graft.functions.GraftFunctions.wordGrams(col("text"), 1),
          1, 5))
        .collect()(0).getSeq[String](0)
      val top = Bm25.topK(docs, "doc_id", "text", terms, k = 10)
        .collect().map(_.getLong(0)).toSeq
      val want = top.indexOf(qid) match {
        case -1 => 0L
        case i => (i + 1).toLong
      }
      assert(rank === want, s"query $qid")
      graft.ops.Materialize.releaseAll(spark)
    }
  }

  test("fixture: k bounds the result, scores ordered, hits within query size") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val r = Bm25.topK(docs, "doc_id", "text", Seq("dup", "vector", "scan"),
      k = 10).collect()
    assert(r.length === 10)
    assert(r.forall(x => x.getLong(1) >= 1L && x.getLong(1) <= 3L))
    val scores = r.map(_.getLong(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }
}
