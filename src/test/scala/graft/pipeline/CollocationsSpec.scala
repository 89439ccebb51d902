package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Collocation lift: exact fixed-point arithmetic on a planted fixture,
  * emission ≡ self-join equivalence, vocabulary bar, contracts. */
class CollocationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture = {
    import spark.implicits._
    // 8 docs: "gl" and "gr" always co-occur (4 docs), "xx" and "gl"
    // land together once out of xx's 2 and gl's 4 appearances.
    Seq(
      (0L, "gl gr alpha"), (1L, "gl gr beta"),
      (2L, "gl gr gamma"), (3L, "gl gr xx"),
      (4L, "xx delta"), (5L, "alpha beta"),
      (6L, "beta gamma"), (7L, "delta alpha")
    ).toDF("doc_id", "text")
  }

  test("planted lift values are exact ppm integers") {
    import spark.implicits._
    val got = Collocations.topPairs(fixture, "doc_id", "text",
        v = 16, minCount = 1, k = 100)
      .select("term_a", "term_b", "n_pair", "df_a", "df_b", "lift_ppm")
      .as[(String, String, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // gl+gr: c=4, df both 4, N=8 -> 1e6*4*8/(4*4) = 2_000_000
    val glgr = got(("gl", "gr"))
    assert(glgr._3 == 4L && glgr._6 == 2000000L)
    // gl+xx: c=1, df 4 and 2, N=8 -> 1e6*8/8 = 1_000_000 (independent)
    val glxx = got(("gl", "xx"))
    assert(glxx._3 == 1L && glxx._6 == 1000000L)
    // alpha+beta: c=1, df 3 and 3 -> floor(8e6/9) = 888_888
    val ab = got(("alpha", "beta"))
    assert(ab._6 == 888888L)
  }

  test("ranking: perfect collocation outranks independents; k truncates") {
    import spark.implicits._
    // minCount=1 admits the one-doc (delta, xx) pair, which ties gl/gr
    // at lift 2e6 and wins the asc tie-break — the deterministic-order
    // contract, pinned here; at minCount=2 only gl/gr survives.
    val top1 = Collocations.topPairs(fixture, "doc_id", "text",
        v = 16, minCount = 1, k = 1)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(top1.length == 1)
    assert((top1.head._1, top1.head._2) == ("delta", "xx"))
    val top2 = Collocations.topPairs(fixture, "doc_id", "text",
        v = 16, minCount = 2, k = 1)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert((top2.head._1, top2.head._2) == ("gl", "gr"))
  }

  test("minCount bar drops singleton pairs") {
    import spark.implicits._
    val got = Collocations.topPairs(fixture, "doc_id", "text",
        v = 16, minCount = 2, k = 100)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(got.map(r => (r._1, r._2)).toSet == Set(("gl", "gr")))
  }

  test("vocabulary bar: out-of-vocab terms contribute no pairs") {
    import spark.implicits._
    // v=2 keeps exactly gl and gr (df 4, ties below at 3)
    val got = Collocations.topPairs(fixture, "doc_id", "text",
        v = 2, minCount = 1, k = 100)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(got.map(r => (r._1, r._2)).toSet == Set(("gl", "gr")))
  }

  test("array-side emission ≡ within-doc self-join on the corpus fixture") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val fast = Collocations.topPairs(docs, "doc_id", "text",
      v = 32, minCount = 3, k = 50)
    // join mirror: presence self-join within doc, same vocab/filters
    graft.functions.GraftFunctions.register(spark)
    val pres = docs.select(col("doc_id"),
        explode(graft.functions.GraftFunctions.wordGrams(col("text"), 1))
          .as("term")).distinct()
    val vocab = pres.groupBy("term").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term").asc).limit(32)
    val pv = pres.join(broadcast(vocab), "term")
    val n = docs.count()
    val slow = pv.as("a").join(pv.as("b"),
        expr("a.doc_id = b.doc_id AND a.term < b.term"))
      .groupBy(col("a.term").as("term_a"), col("b.term").as("term_b"),
        col("a.df").as("df_a"), col("b.df").as("df_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= 3)
      .select(col("term_a"), col("term_b"), col("n_pair"),
        col("df_a"), col("df_b"),
        expr(s"(CAST(1000000 AS BIGINT) * n_pair * ${n}L) " +
          "div (df_a * df_b)").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("term_a"), col("term_b"))
      .limit(50)
    assert(fast.collect().toSeq == slow.collect().toSeq)
  }

  test("contracts fail loudly") {
    intercept[IllegalArgumentException] {
      Collocations.topPairs(fixture, "doc_id", "text",
        v = Collocations.MaxVocab + 1, minCount = 1, k = 1)
    }
    intercept[IllegalArgumentException] {
      Collocations.topPairs(fixture, "doc_id", "text",
        v = 4, minCount = 0, k = 1)
    }
  }
}
