package graft.pipeline

import org.apache.spark.sql.functions.{col, sum}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class WinnowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def reportOf(docs: Seq[(Long, String)], n: Int, w: Int) =
    Winnow.report(docs.toDF("doc_id", "text"), "doc_id", "text", n, w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("degenerate short docs: <= w grams select exactly one fingerprint") {
    // n=4, w=4: 5 tokens -> 2 grams (<= w) -> single global minimum.
    val got = reportOf(Seq((1L, "a b c d e"), (2L, "a b c d")), n = 4, w = 4)
    assert(got == Seq((1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("gram-less docs select nothing; empty docs keep their row") {
    val got = reportOf(Seq((1L, ""), (2L, "one two"), (3L, " \t ")), 4, 4)
    assert(got == Seq((1L, 0L, 0L), (2L, 0L, 0L), (3L, 0L, 0L)))
  }

  test("selection density: between ceil(g/w) distinct-bounded and g") {
    val docs = Seq((1L, (1 to 200).map(i => s"t$i").mkString(" ")))
    val Seq((_, g, sel)) = reportOf(docs, n = 3, w = 6)
    assert(g == 198L)
    // A window minimum persists at most w windows, so with all-distinct
    // grams at least (g - w + 1) / w distinct minima get selected.
    assert(sel >= (g - 6 + 1) / 6 && sel < g,
      s"density out of range: $sel of $g")
  }

  test("winnowing guarantee: a shared run of >= w + n - 1 tokens is caught") {
    // n=4, w=4 -> guarantee threshold t = 7 tokens. Plant exactly 7.
    val shared = "g1 g2 g3 g4 g5 g6 g7"
    val docs = Seq(
      (1L, s"aa bb cc $shared dd ee ff gg hh ii jj"),
      (2L, s"xx yy $shared zz ww vv uu tt ss rr qq"),
      (3L, "unrelated words only here nothing shared at all today"))
      .toDF("doc_id", "text")
    val got = Winnow.pairs(docs, "doc_id", "text", n = 4, w = 4,
        minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L)))
  }

  test("below the guarantee, no false obligation either way") {
    // A 3-token overlap with n=4 shares no gram at all -> zero pairs.
    val docs = Seq(
      (1L, "aa bb cc dd ee ff shared1 shared2 shared3"),
      (2L, "shared1 shared2 shared3 gg hh ii jj kk ll"))
      .toDF("doc_id", "text")
    val got = Winnow.pairs(docs, "doc_id", "text", 4, 4, minShared = 1)
    assert(got.count() == 0L)
  }

  test("boilerplate bar: a fingerprint past maxDf yields no pair evidence") {
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"
    val docs = (1L to 6L).map(i => (i, s"u${i}a u${i}b $boiler u${i}c"))
      .toDF("doc_id", "text")
    val loose = Winnow.pairs(docs, "doc_id", "text", 4, 4,
      minShared = 1, maxDf = 6)
    assert(loose.count() == 15L, "all C(6,2) pairs share the boilerplate")
    val strict = Winnow.pairs(docs, "doc_id", "text", 4, 4,
      minShared = 1, maxDf = 5)
    assert(strict.count() == 0L, "df=6 fingerprints excluded at maxDf=5")
  }

  test("array-side cell emission == fp self-join on the fixture corpus") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
    val a = Winnow.pairs(docs, "doc_id", "text", 4, 4, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val b = Winnow.joinPairs(docs, "doc_id", "text", 4, 4, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(a.nonEmpty, "fixture corpus has winnow-detectable near-dups")
    assert(a == b)
  }

  test("decontam: planted eval run >= w + n - 1 flags the carrier only") {
    val leaked = "e1 e2 e3 e4 e5 e6 e7"
    val docs = Seq(
      (0L, s"benchmark question $leaked answer choices here today"), // eval
      (1L, s"train doc carrying $leaked inside its body text"),
      (2L, "clean training document with no overlap at all present"))
      .toDF("doc_id", "text")
    val got = Winnow.decontam(docs, "doc_id", "text",
        col("doc_id") === 0L, n = 4, w = 4)
      .collect().map(r => r.getLong(0)).toSeq
    assert(got == Seq(1L), "only the carrier is flagged; eval row excluded")
  }

  test("decontam broadcast contract: oversized eval side fails loudly") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      Winnow.decontam(docs, "doc_id", "text",
        col("doc_id") % 2 === 0, n = 4, w = 4, maxEvalFps = 10L)
    }
    assert(e.getMessage.contains("broadcast contract"))
  }

  test("landed index: write+append ≡ write-union at the refcount fold; probe matches direct") {
    val spark0 = spark
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
    val pred = col("doc_id") % 5 === 0
    val tbl = "graft_winnowspec_idx"
    Seq(tbl, s"${tbl}_meta", s"${tbl}_srcs",
      s"${tbl}_u", s"${tbl}_u_meta").foreach(t =>
      spark0.sql(s"DROP TABLE IF EXISTS $t"))
    CorpusWriter.writeWinnowIndex(
      docs.filter(!pred && col("doc_id") % 2 === 0), "doc_id", "text",
      n = 4, w = 4, tbl, buckets = 8)
    CorpusWriter.appendToWinnowIndex(
      docs.filter(!pred && col("doc_id") % 2 === 1), "doc_id", "text", tbl,
      src = "winnowspec:odds")
    CorpusWriter.writeWinnowIndex(
      docs.filter(!pred), "doc_id", "text", n = 4, w = 4, s"${tbl}_u",
      buckets = 8)
    // The r18 refcount layout holds multiple (fp, c, src) rows per
    // fingerprint across landings — equality lives at the read fold:
    // same live fp set AND same net doc-refcount per fp as a union write.
    def fold(t: String): Map[Long, Long] =
      spark0.table(t).groupBy("fp").agg(sum("c").as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fold(tbl) === fold(s"${tbl}_u"), "append landing changed the fold")
    assert(CorpusWriter.readWinnowIndex(spark0, tbl)
        .collect().map(_.getLong(0)).toSet ===
      CorpusWriter.readWinnowIndex(spark0, s"${tbl}_u")
        .collect().map(_.getLong(0)).toSet)

    val viaIndex = Winnow.admitAgainstIndex(spark0, tbl,
        docs.filter(pred), "doc_id", "text", n = 4, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaIndex.nonEmpty)
    assert(viaIndex.exists(_._3 > 0L), "fixture increment shares fps")

    // Compaction restores the one-row-per-fp PHYSICAL layout (the raw
    // pin lives here) without moving the fold or the probe.
    CorpusWriter.compactWinnowIndex(spark0, tbl)
    val raw = spark0.table(tbl).collect().map(_.getLong(0))
    assert(raw.length == raw.distinct.length, "duplicate fps post-compaction")
    assert(fold(tbl) === fold(s"${tbl}_u"))
    val viaCompacted = Winnow.admitAgainstIndex(spark0, tbl,
        docs.filter(pred), "doc_id", "text", n = 4, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaCompacted === viaIndex)

    val e = intercept[IllegalArgumentException] {
      Winnow.admitAgainstIndex(spark0, tbl, docs.filter(pred),
        "doc_id", "text", n = 4, w = 9)
    }
    assert(e.getMessage.contains("written under"))
    Seq(tbl, s"${tbl}_meta", s"${tbl}_srcs",
      s"${tbl}_u", s"${tbl}_u_meta").foreach(t =>
      spark0.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("pairs orders and types are stable") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
    val out = Winnow.pairs(docs, "doc_id", "text", 4, 4, minShared = 2)
    assert(out.schema.fieldNames.toSeq ==
      Seq("doc_a", "doc_b", "shared_fps"))
    val rows = out.collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
  }
}
