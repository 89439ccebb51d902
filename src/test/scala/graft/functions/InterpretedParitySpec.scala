package graft.functions

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Every native expression evaluated through BOTH engines Spark can pick:
  * whole-stage codegen (the normal path) and the interpreted `eval` path
  * (what runs on codegen fallback — e.g. a stage over the 8k-expression
  * limit or a codegen compile error). A doGenCode/eval divergence would
  * silently produce different results depending on plan shape; this pins
  * them identical on fixture + planted text.
  */
class InterpretedParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def allExprs(df: org.apache.spark.sql.DataFrame) = {
    GraftFunctions.register(spark)
    df.selectExpr(
      "doc_id",
      "rolling_hash(text) AS a",
      "minhash_sig(text) AS b",
      "shingle_set(text) AS c",
      "word_grams(text, 3) AS d",
      "token_chunks(text, 8) AS e",
      "word_gram_hashes(text, 3) AS f",
      "lang_scores(text) AS g",
      "simhash(text) AS h",
      "token_stats(text) AS i",
      "word_set_count(text, 'the,and,of,to,in,is') AS j",
      "pii_scrub(text) AS k",
      "kafka_partition(text, 7) AS l",
      "sig_agree_count(minhash_sig(text), minhash_sig(reverse(text))) AS m",
      "sig_band_mask(minhash_sig(text), minhash_sig(reverse(text))) AS n",
      "sorted_intersect_count(shingle_set(text), shingle_set(reverse(text))) AS o",
      "sorted_intersect_count(array_sort(array_distinct(word_gram_hashes(text, 3))), " +
        "array_sort(array_distinct(word_gram_hashes(reverse(text), 3)))) AS o2",
      "argmax_dot(array(CAST(doc_id AS DOUBLE), CAST(length(text) AS DOUBLE)), " +
        "array(array(1.0D, 0.5D), array(-1.0D, 2.0D), array(0.25D, 0.25D)), " +
        "array(0.25D, 0.5D, 0.0D), array(0L, 1L, 2L)) AS p")
  }

  test("codegen and interpreted evaluation agree on every native expression") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
      .limit(80).selectExpr("doc_id",
        "concat(text, element_at(array('', " +
          "' mail a.b@mail.org or +1-555-09 at 10.0.0.1 card 4111111111111111 é中'), " +
          "cast(doc_id % 2 + 1 AS INT))) AS text")
    def run(): Seq[String] =
      allExprs(docs).collect().map(_.toString).toSeq
    val codegen = run()
    val modes = Seq("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")
    val saved = modes.map { case (k, _) => k -> spark.conf.getOption(k) }
    modes.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val interpreted = run()
      assert(interpreted == codegen)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
