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
