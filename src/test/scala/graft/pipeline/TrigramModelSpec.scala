package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Trigram stupid backoff: hand-computed levels on a toy fixture, the
  * landing identity on the stored sidecar, and the overflow guard. */
class TrigramModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val S = TrigramModel.Scale // 1048576

  test("all four backoff levels score the hand-computed fixed points") {
    val train = Seq((0L, "a b c a b c"), (2L, "b c d")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b c d e"), // tri, tri, unseen
      (3L, "x b c"),     // bigram backoff: c(b c)=3, c(b)=3
      (5L, "z z d")      // unigram backoff: c(d)=1, N=9
    ).toDF("doc_id", "text")
    val got = TrigramModel.backoffScore(train, score, "doc_id", "text")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))).toMap
    // d1: "a b c" p=S*2 div 2=S; "b c d" p=S*1 div 3; "c d e" unseen.
    val d1sum = S + S / 3
    assert(got(1L) == ((3L, d1sum, d1sum.toDouble / (3L * S), 2L, 0L, 0L, 1L)))
    // d3: "x b c" backs off to bigram: (2S*3) div (5*3).
    val d3sum = (2 * S * 3) / 15
    assert(got(3L) == ((1L, d3sum, d3sum.toDouble / S, 0L, 1L, 0L, 0L)))
    // d5: "z z d" backs off to unigram: (4S*1) div (25*9).
    val d5sum = (4 * S) / 225
    assert(got(5L) == ((1L, d5sum, d5sum.toDouble / S, 0L, 0L, 1L, 0L)))
  }

  test("a trigram's context bigram is always in the model (no null division)") {
    // Single-doc train: every scored trigram that hits level 3 must
    // find its w12 context — same tokenization guarantees it.
    val train = Seq((0L, "p q r s")).toDF("doc_id", "text")
    val score = Seq((1L, "p q r s")).toDF("doc_id", "text")
    val r = TrigramModel.backoffScore(train, score, "doc_id", "text")
      .collect()
    assert(r.length == 1 && r(0).getLong(4) == 2L) // both windows level 3
    assert(r(0).getLong(2) == 2 * S)               // both p = S exactly
  }

  test("stored sidecar: write+append ≡ in-session, bit-equal; one landing ≡ two") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    import org.apache.spark.sql.functions.col
    val train = docs.filter(col("doc_id") % 2 === 0)
    val score = docs.filter(col("doc_id") % 2 === 1).limit(40)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.mkString("|")).toSeq
    val (inSession, f1) = graft.ops.Materialize.collecting {
      rows(TrigramModel.backoffScore(train, score, "doc_id", "text"))
    }
    graft.ops.Materialize.release(f1)

    spark.sql("DROP TABLE IF EXISTS graft_test_lm")
    spark.sql("DROP TABLE IF EXISTS graft_test_lm_meta")
    CorpusWriter.writeLmModel(train.filter(col("doc_id") % 4 === 0),
      "text", "graft_test_lm", buckets = 8)
    CorpusWriter.appendToLmModel(train.filter(col("doc_id") % 4 === 2),
      "text", "graft_test_lm", src = "tgspec:odds")
    val (stored, f2) = graft.ops.Materialize.collecting {
      rows(TrigramModel.scoreFromModel(score, "doc_id", "text",
        spark.table("graft_test_lm")))
    }
    graft.ops.Materialize.release(f2)
    assert(stored == inSession)

    spark.sql("DROP TABLE IF EXISTS graft_test_lm1")
    spark.sql("DROP TABLE IF EXISTS graft_test_lm1_meta")
    CorpusWriter.writeLmModel(train, "text", "graft_test_lm1", buckets = 8)
    val (oneLanding, f3) = graft.ops.Materialize.collecting {
      rows(TrigramModel.scoreFromModel(score, "doc_id", "text",
        spark.table("graft_test_lm1")))
    }
    graft.ops.Materialize.release(f3)
    assert(oneLanding == inSession)
  }

  test("counts past the Long-safe bound raise, never wrap") {
    val model = Seq(
      (1, "the", TrigramModel.MaxCount + 1),
      (0, "", TrigramModel.MaxCount + 1)
    ).toDF("level", "gram", "c")
    val score = Seq((1L, "x y the")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      TrigramModel.scoreFromModel(score, "doc_id", "text", model).collect()
    }
    assert(e.getMessage.contains("trigram LM count overflow"))
  }
}
