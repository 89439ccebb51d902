package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** KMV source-similarity: the bounded prune must equal the naive
  * distinct+rank sketch, duplicates must not crowd out sketch members,
  * and the estimator must track exact Jaccard on the fixture. */
class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bounded prune ≡ naive distinct+window sketch on the fixture grams") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val grams = docs.select(col("source").cast("string").as("source"),
      explode(graft.functions.GraftFunctions.wordGramHashes(col("text"), 3))
        .as("gram_fp"))
    val pruned = CorpusStats.kminSketch(grams, 64)
      .as[(String, Long)].collect().toSet
    val naive = grams.distinct()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("gram_fp")))
      .filter(col("rn") <= 64).drop("rn")
      .as[(String, Long)].collect().toSet
    assert(pruned === naive)
  }

  test("duplicates cannot evict a value that belongs in the k-min") {
    import spark.implicits._
    // One partition: k copies of fp=1 then a single fp=2. A row-heap of
    // size k would fill with the 1s and drop 2; the value-set keeps both.
    val rows = Seq.fill(5)(("s", 1L)) :+ (("s", 2L))
    val grams = rows.toDF("source", "gram_fp").coalesce(1)
    val sketch = CorpusStats.kminSketch(grams, 3)
      .as[(String, Long)].collect().sorted
    assert(sketch.toSeq === Seq(("s", 1L), ("s", 2L)))
  }

  test("estimator tracks exact Jaccard within the k-min error envelope") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val est = CorpusStats.kmvSourceSimilarity(docs, "source", "text",
        n = 3, k = 128)
      .select("src_a", "src_b", "jaccard_est")
      .as[(String, String, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    // Exact per-source distinct gram sets → true Jaccard per pair.
    val grams = docs.select(col("source").cast("string").as("source"),
        explode(graft.functions.GraftFunctions.wordGramHashes(col("text"), 3))
          .as("gram_fp"))
      .distinct().as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val srcs = grams.keys.toSeq.sorted
    var checked = 0
    for (a <- srcs; b <- srcs if a < b) {
      val inter = (grams(a) & grams(b)).size.toDouble
      val truth = inter / (grams(a) | grams(b)).size
      val e = est((a, b))
      // k=128 → σ ≈ J/√k plus small-sample wobble; 0.15 absolute is a
      // generous deterministic bound for fixture-sized sets.
      assert(math.abs(e - truth) <= 0.15,
        s"pair ($a,$b): est $e vs true $truth")
      checked += 1
    }
    assert(checked > 0)
  }

  test("output shape: one row per unordered pair, k_used ≤ k") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val r = CorpusStats.kmvSourceSimilarity(docs, "source", "text",
      n = 3, k = 128)
    val nSrc = docs.select("source").distinct().count()
    assert(r.count() === nSrc * (nSrc - 1) / 2)
    assert(r.filter(col("k_used") > 128 || col("shared_kmin") > col("k_used"))
      .count() === 0)
  }
}
