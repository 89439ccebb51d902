package graft.pipeline

import org.apache.spark.sql.functions.{col, concat, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SimHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("near-identical docs have small Hamming distance; unrelated docs large") {
    val base = "the quick brown fox jumps over the lazy dog again and again " * 3
    val near = base.replace("dog", "cat")
    val far = "catalyst tungsten shuffle partition broadcast codegen executor " * 3
    val sigs = SimHash.signatures(
        Seq((0L, base), (1L, near), (2L, far)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0L), sigs(1L)) < ham(sigs(0L), sigs(2L)))
    assert(ham(sigs(0L), sigs(1L)) <= 8)
  }

  test("identical docs collide exactly; hamming column agrees with bitCount") {
    val t = "one two three four five six"
    val df = Seq((0L, t), (1L, t)).toDF("doc_id", "text")
    val sigs = SimHash.signatures(df, "doc_id", "text").collect()
    assert(sigs(0).getLong(1) == sigs(1).getLong(1))
    val h = Seq((3L, 5L)).toDF("a", "b")
      .select(SimHash.hamming(col("a"), col("b")).as("h")).head().getAs[Number]("h")
    assert(h.intValue() == java.lang.Long.bitCount(3L ^ 5L))
  }

  test("native simhash ≡ the composed HOF formulation on fixture docs + edges") {
    graft.functions.GraftFunctions.register(spark)
    val fixture = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
      .select(col("text")).limit(200)
    val edges = Seq("", " \t\n ", "one", "a b  c\td", "Ünïcode tökens ☃ here").toDF("text")
    Seq(fixture, edges).foreach { df =>
      val rows = df.select(col("text"), SimHash.simhash("text").as("n"),
        SimHash.hofSimhash("text").as("h")).collect()
      rows.foreach(r => assert(r.getLong(1) == r.getLong(2), s"text=${r.getString(0)}"))
      assert(rows.nonEmpty)
    }
  }

  test("jaccardPairs verifies banded candidates with exact n-gram overlap") {
    val base = "the quick brown fox jumps over the lazy dog and keeps running far away " * 4
    val nearDup = base.replace("lazy", "idle")
    val unrelated = "completely different content about spark catalyst optimizer internals " * 4
    val docs = Seq((0L, base), (1L, nearDup), (2L, unrelated)).toDF("doc_id", "text")
    val pairs = MinHashDedup.jaccardPairs(docs, "doc_id", "text", minJac = 0.4).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 1L)))
    val jac = pairs.head.getAs[Double]("jaccard")
    assert(jac > 0.5 && jac < 1.0) // true overlap, not the minhash estimate
  }

  test("grouped-cell jaccardPairs ≡ the pair-join formulation, bits included") {
    // Fixture corpus + planted near-dup families (replicas with a tag
    // token), across repartitions — the dup-dense shape the grouped
    // verify exists for.
    val base = graft.core.Tables.load(spark, graft.TestSpark.Sf, "documents")
      .select(col("doc_id"), col("text")).limit(200)
    val planted = base.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 500000L).as("doc_id"),
        concat(lit("r1 "), col("text")).as("text"))
    val corpus = base.unionAll(planted).repartition(9)
    def run(f: (org.apache.spark.sql.DataFrame, String, String, Double) => org.apache.spark.sql.DataFrame) =
      f(corpus, "doc_id", "text", 0.4).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSeq
    val grouped = run(MinHashDedup.jaccardPairs)
    val joined = run(MinHashDedup.joinJaccardPairs)
    assert(grouped == joined)
    assert(grouped.nonEmpty) // the planted family must actually band together
  }
}
