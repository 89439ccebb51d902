package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Incremental admission: exact/near decisions against the corpus
  * sidecar and lower-id increment siblings — never corpus×corpus. */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(corpus: Seq[(Long, String)], inc: Seq[(Long, String)],
      minSim: Double = 0.5): Seq[(Long, Boolean, Boolean, Boolean)] = {
    import spark.implicits._
    IncrementalDedup.admissions(
        IncrementalDedup.index(corpus.toDF("doc_id", "text"), "doc_id", "text"),
        inc.toDF("doc_id", "text"), "doc_id", "text", minSim)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
  }

  test("exact vs corpus, near vs corpus, sibling dup, and unique admissions") {
    val base = "the quick brown fox jumps over the lazy dog while catalyst optimizes plans " * 4
    val corpus = Seq(
      10L -> base,
      11L -> ("completely different corpus content about parquet row groups and bloom filters " * 4))
    val inc = Seq(
      100L -> base, // byte-identical to corpus 10
      101L -> base.replace("lazy", "idle"), // near-dup of corpus 10
      102L -> ("unique increment content about shuffle partitioning strategies at scale " * 4),
      103L -> ("unique increment content about shuffle partitioning strategies at scale " * 4), // = sibling 102
      104L -> ("totally fresh subject matter entirely unlike anything stored before now " * 4))
    assert(run(corpus, inc) == Seq(
      (100L, true, true, false), // identical text: exact AND (trivially) near
      (101L, false, true, false), // one token changed: near only
      (102L, false, false, true), // first of the sibling pair: admitted
      (103L, true, true, false), // blocked by LOWER-id sibling 102 (greedy-by-id)
      (104L, false, false, true)))
  }

  test("near-dup blocking is one-directional within the increment: lower id wins") {
    val text = "spark structured streaming state stores and watermark semantics explained " * 4
    val out = run(corpus = Seq(1L -> ("entirely unrelated corpus doc about columnar encodings " * 4)),
      inc = Seq(200L -> text, 201L -> ("v2 " + text))) // prefixed replica, the PipelineSpec planted-family shape
    assert(out == Seq((200L, false, false, true), (201L, false, true, false)))
  }

  test("short documents (no shingle) participate in exact dedup only") {
    val out = run(corpus = Seq(1L -> "abc"), inc = Seq(2L -> "abc", 3L -> "xyz"))
    assert(out == Seq((2L, true, false, false), (3L, false, false, true)))
  }

  test("a STORED bucketed sidecar admits identically; distinct-fp runs exchange-free") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog while catalyst optimizes plans " * 4
    val corpus = Seq(10L -> base,
      11L -> ("completely different corpus content about parquet row groups and bloom filters " * 4))
    val inc = Seq(100L -> base, 101L -> ("v2 " + base),
      102L -> ("unique increment content about shuffle partitioning strategies at scale " * 4))
    val incDf = inc.toDF("doc_id", "text")
    val inline = IncrementalDedup.admissions(
        IncrementalDedup.index(corpus.toDF("doc_id", "text"), "doc_id", "text"),
        incDf, "doc_id", "text", 0.5).collect().map(_.toSeq).toSeq

    CorpusWriter.writeAdmissionIndex(corpus.toDF("doc_id", "text"),
      "doc_id", "text", table = "graft_sidecar_test", buckets = 4)
    try {
      val stored = spark.table("graft_sidecar_test")
      val viaStored = IncrementalDedup.admissions(stored, incDf,
        "doc_id", "text", 0.5).collect().map(_.toSeq).toSeq
      assert(viaStored == inline)
      // The deployment payoff of bucketing: the corpus-scale distinct-fp
      // aggregate consumes the bucketed scan's fp partitioning directly.
      val p = stored.select("fp").distinct()
        .queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), p)
    } finally spark.sql("DROP TABLE IF EXISTS graft_sidecar_test")
  }

  test("near flags ≡ the banded pair mirror on randomized shared-fragment corpora") {
    // The PipelineSpec randomized harness applied to admission: on every
    // seed, a doc's near_dup flag must equal "some banded candidate pair
    // (same estimator, same bands) links it to a corpus doc or a
    // lower-id sibling with est ≥ minSim" derived from the equivalence
    // mirror joinCandidatePairs over the union's signatures.
    import spark.implicits._
    val frags = IndexedSeq(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "sphinx of black quartz judge my vow",
      "how vexingly quick daft zebras jump",
      "bright vixens jump dozy fowl quack")
    val minSim = 0.5
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val all = (0L until 40L).map { id =>
        val text = Seq.fill(3 + rnd.nextInt(3))(frags(rnd.nextInt(frags.length)))
          .mkString(" ") + s" tail${rnd.nextInt(4)}"
        (id, text)
      }
      val (incRows, corpusRows) = all.partition(_._1 % 3 == 0)
      val incIds = incRows.map(_._1).toSet
      val got = run(corpusRows, incRows, minSim)
        .collect { case (id, _, near, _) if near => id }.toSet
      val pairs = MinHashDedup.joinCandidatePairs(
          MinHashDedup.signatures(all.toDF("doc_id", "text"), "doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .filter(_._3 >= minSim)
      val expected = incIds.filter { i =>
        pairs.exists { case (a, b, _) =>
          (b == i && (!incIds.contains(a) || a < i)) ||
            (a == i && !incIds.contains(b)) // b > i qualifies only as corpus
        }
      }
      assert(got == expected, s"seed $seed")
    }
  }

  test("empty corpus admits everything non-sibling; empty increment yields no rows") {
    val text = "some perfectly ordinary document text that stands alone in the corpus " * 4
    // Bootstrap: the very first increment sees an EMPTY corpus index.
    assert(run(corpus = Seq.empty, inc = Seq(1L -> text, 2L -> text)) ==
      Seq((1L, false, false, true), (2L, true, true, false)))
    // A quiet ingest tick: nothing to admit, nothing to decide.
    assert(run(corpus = Seq(1L -> text), inc = Seq.empty).isEmpty)
  }

  test("raising minSim past the estimate admits the near-duplicate") {
    val base = "the quick brown fox jumps over the lazy dog while catalyst optimizes plans " * 4
    val out = run(corpus = Seq(10L -> base),
      inc = Seq(100L -> base.replace("lazy", "idle")), minSim = 0.999)
    assert(out == Seq((100L, false, false, true)))
  }
}
