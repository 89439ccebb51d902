package graft.pipeline

import org.apache.spark.sql.functions.col
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
}
