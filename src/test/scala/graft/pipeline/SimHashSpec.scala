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

  test("hammingPairs ≡ brute force over signatures (fixture + planted dups)") {
    // Fixture slice plus planted families: exact replicas (hamming 0)
    // and single-token edits (small nonzero hamming) — the shapes the
    // pigeonhole guarantee must catch.
    val base = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
      .select(col("doc_id"), col("text")).limit(150)
    val replicas = base.filter(col("doc_id") % 41 === 0)
      .select((col("doc_id") + 10000L).as("doc_id"), col("text"))
    val edited = base.filter(col("doc_id") % 29 === 0)
      .select((col("doc_id") + 20000L).as("doc_id"),
        concat(col("text"), lit(" zq")).as("text"))
    val docs = base.unionAll(replicas).unionAll(edited).repartition(7)
    val got = SimHash.hammingPairs(docs, "doc_id", "text",
        width = SimHash.Bits)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // Brute force from the same signatures.
    val sigs = SimHash.signatures(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val want = for {
      i <- sigs.indices; j <- (i + 1) until sigs.length
      d = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
      if d <= SimHash.DefaultMaxDist
    } yield (sigs(i)._1, sigs(j)._1, d.toLong)
    assert(got.toSet == want.toSet)
    assert(got.size == got.toSet.size, "first-qualifying-combo rule must dedup")
    assert(want.nonEmpty && want.exists(_._3 == 0L) && want.exists(_._3 > 0L))
  }

  test("wide fingerprint: 62-bit pairs ≡ brute force; sharper than 32-bit") {
    val base = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
      .select(col("doc_id"), col("text")).limit(200)
    val replicas = base.filter(col("doc_id") % 37 === 0)
      .select((col("doc_id") + 10000L).as("doc_id"), col("text"))
    val docs = base.unionAll(replicas).repartition(6)
    val got = SimHash.hammingPairsWide(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val sigs = SimHash.signatures62(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(sigs.forall(_._2 >= 0L), "62-bit signatures stay positive")
    val want = for {
      i <- sigs.indices; j <- (i + 1) until sigs.length
      d = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
      if d <= SimHash.DefaultMaxDist
    } yield (sigs(i)._1, sigs(j)._1, d.toLong)
    assert(got.toSet == want.toSet)
    assert(want.exists(_._3 == 0L)) // replicas still collide exactly
    // discrimination: the wide ball is a subset-scale of the 32-bit one
    val narrow = SimHash.hammingPairs(docs, "doc_id", "text",
      width = SimHash.Bits).count()
    assert(got.size.toLong <= narrow)
  }

  test("hammingSigPairs multiplicities account exactly for the doc-pair expansion") {
    val base = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
      .select(col("doc_id"), col("text")).limit(120)
    val replicas = base.filter(col("doc_id") % 17 === 0)
      .select((col("doc_id") + 10000L).as("doc_id"), col("text"))
    val docs = base.unionAll(replicas).repartition(5)
    graft.functions.GraftFunctions.register(spark)
    val sigGroups = SimHash.signatures(docs, "doc_id", "text")
      .groupBy("simhash").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val sp = SimHash.hammingSigPairs(sigGroups).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // mass check: Σ cross n_a·n_b + Σ self C(m,2) == |doc-level answer|
    val mass = sp.map { case (a, b, _, na, nb) =>
      if (a == b) na * (na - 1) / 2 else na * nb
    }.sum
    val docPairs = SimHash.hammingPairs(docs, "doc_id", "text",
      width = SimHash.Bits).count()
    assert(mass == docPairs)
    // structural checks: unique keys, self rows only for m >= 2, ordered sigs
    assert(sp.map(p => (p._1, p._2)).distinct.length == sp.length)
    assert(sp.forall(p => p._1 <= p._2))
    assert(sp.filter(p => p._1 == p._2).forall(p => p._4 >= 2 && p._3 == 0L))
  }

  test("width knob: default is 62-bit; each width ≡ its dedicated form") {
    // VERDICT r14 item 5: width is a parameter, 62-bit the deployment
    // default. The knob must dispatch bit-identically to the width's
    // dedicated entry point, and reject widths with no signature family.
    val base = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
      .select(col("doc_id"), col("text")).limit(120)
    val replicas = base.filter(col("doc_id") % 31 === 0)
      .select((col("doc_id") + 10000L).as("doc_id"), col("text"))
    val docs = base.unionAll(replicas).repartition(5)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val dflt = rows(SimHash.hammingPairs(docs, "doc_id", "text"))
    assert(dflt == rows(SimHash.hammingPairsWide(docs, "doc_id", "text")),
      "bare call must run the 62-bit deployment default")
    val w32 = rows(SimHash.hammingPairs(docs, "doc_id", "text",
      width = SimHash.Bits))
    assert(w32 == rows(SimHash.hammingPairsFromSignatures(
      SimHash.signatures(docs, "doc_id", "text"))))
    // both widths catch the planted exact replicas at distance 0
    val planted = replicas.select(col("doc_id")).collect()
      .map(r => r.getLong(0) - 10000L).toSet
    planted.foreach { id =>
      assert(dflt.contains((id, id + 10000L, 0L)), s"wide missed replica $id")
      assert(w32.contains((id, id + 10000L, 0L)), s"32-bit missed replica $id")
    }
    val err = intercept[RuntimeException] {
      SimHash.hammingPairs(docs, "doc_id", "text", width = 48)
    }
    assert(err.getMessage.contains("width"))
  }

  test("hammingPairs block layout covers all bits; combos are exact-recall") {
    val (widths, offsets) = SimHash.blockLayout(SimHash.Bits, SimHash.DefaultBlocks)
    assert(widths.sum == SimHash.Bits)
    assert(offsets.head == 0 && offsets.last + widths.last == SimHash.Bits)
    val (w62, o62) = SimHash.blockLayout(SimHash.WideBits, SimHash.DefaultBlocks)
    assert(w62.sum == SimHash.WideBits)
    assert(o62.last + w62.last == SimHash.WideBits)
    // any 3-bit difference leaves some combo of 3 blocks clean
    assert(SimHash.combos(6, 3).length == 20)
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
