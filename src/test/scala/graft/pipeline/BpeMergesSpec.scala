package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** BPE merge training vs a local reference implementation: the textbook
  * toy, the greedy-overlap edge, tie-break determinism, and the full
  * fixture replayed against an in-memory BPE trainer over the same
  * tokenization. */
class BpeMergesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Local reference BPE: word-frequency dict in, per-round
    * (a, b, pairCount, corpusTokens) out. Greedy left-to-right merge,
    * overlapping adjacencies all counted, ties (count DESC, a, b). */
  private def refBpe(wordFreq: Map[String, Long], rounds: Int)
      : Seq[(Int, String, String, Long, Long)] = {
    var seqs = wordFreq.toSeq.map { case (w, f) =>
      (w.map(_.toString).toVector, f)
    }
    (1 to rounds).flatMap { r =>
      val cnt = collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- seqs; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        cnt(k) = cnt.getOrElse(k, 0L) + f
      }
      if (cnt.isEmpty) None // vocabulary exhausted: no row this round
      else {
        val ((a, b), c) = cnt.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        seqs = seqs.map { case (syms, f) => (mergeGreedy(syms, a, b), f) }
        val toks = seqs.map { case (s, f) => s.length * f }.sum
        Some((r, a, b, c, toks))
      }
    }
  }

  private def mergeGreedy(syms: Vector[String], a: String, b: String)
      : Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def tokenize(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .filter(_.forall(c => c >= 'a' && c <= 'z'))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def run(texts: Seq[String], rounds: Int)
      : Seq[(Int, String, String, Long, Long)] = {
    import spark.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    BpeMerges.merges(docs, "text", rounds).collect().toSeq
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
  }

  test("empty word frame (nothing matching ^[a-z]+$) returns no merges, no NPE") {
    // ADVICE r21: sum over zero rows is SQL NULL — the total-F unbox
    // must not throw; training exhausts on round 1 with an empty list.
    assert(run(Seq("123 456", "!!! ???"), 3) === Seq.empty)
    assert(run(Seq.empty, 2) === Seq.empty)
  }

  test("textbook toy corpus matches the local reference trainer") {
    val texts = Seq(
      "low low low low low",
      "lower lower newest newest newest",
      "newest newest newest widest widest widest")
    assert(run(texts, 6) === refBpe(tokenize(texts), 6))
  }

  test("greedy left-to-right overlap: aaaa merges to (aa)(aa)") {
    // (a,a) counts 3 in 'aaaa'; after the merge the word is two symbols.
    val got = run(Seq("aaaa"), 1)
    assert(got === Seq((1, "a", "a", 3L, 2L)))
    // Odd run: aaa -> (aa)(a), three symbols total across the corpus of
    // one word; second round merges (aa, a).
    val odd = run(Seq("aaa"), 2)
    assert(odd(0) === (1, "a", "a", 2L, 2L))
    assert(odd(1) === (2, "aa", "a", 1L, 1L))
  }

  test("tie-break picks the lexicographically least pair") {
    // 'xy' and 'ab' both appear twice; (a,b) must win round 1.
    val got = run(Seq("xy xy ab ab"), 1)
    assert(got.head._2 === "a" && got.head._3 === "b")
  }

  test("non-alphabetic and mixed-case tokens are gated identically") {
    val texts = Seq("Ab AB 123 a-b ab!", "ab ab")
    // Only the pure-lowercase forms survive: 'ab' x2 (lowercased Ab/AB
    // also pass the gate post-lowering) — mirror the local gate exactly.
    assert(run(texts, 2) === refBpe(tokenize(texts), 2))
  }

  test("per-round argmax plans as TakeOrderedAndProject, never a full sort") {
    import spark.implicits._
    val cur = Seq(("ab", 2L, " a  b "), ("abc", 1L, " a  b  c "))
      .toDF("word", "f", "seq")
    val p = BpeMerges.bestPair(cur).queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("pairStats ≡ bestPair: same argmax under the min_by ordering struct, grand = Σ cnt") {
    import spark.implicits._
    // Counts: (a,b)=3, (x,y)=2, (b,c)=1 → best (a,b,3), grand 6. The
    // (x,y)=2 row would win a WRONG tie-break ordering that compared
    // pairs before counts, so this pins the struct field order too.
    val cur = Seq(("ab", 2L, " a  b "), ("xy", 2L, " x  y "),
        ("abc", 1L, " a  b  c "))
      .toDF("word", "f", "seq")
    val bp = BpeMerges.bestPair(cur).collect()(0)
    val ps = BpeMerges.pairStats(cur).collect()(0)
    val best = ps.getStruct(0)
    assert((best.getString(0), best.getString(1), best.getLong(2)) ===
      ((bp.getString(0), bp.getString(1), bp.getLong(2))))
    assert(ps.getLong(1) === 6L)
    // Exhausted vocabulary (every word one symbol): null best, null grand.
    val done = Seq(("a", 2L, " a "), ("b", 1L, " b ")).toDF("word", "f", "seq")
    assert(BpeMerges.bestPair(done).collect().isEmpty)
    val er = BpeMerges.pairStats(done).collect()(0)
    assert(er.isNullAt(0) && er.isNullAt(1))
  }

  test("encodeWith applies merges greedily in training order") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa aa"), (2L, "ab")).toDF("doc_id", "text")
    // merges: (a,a) then (aa,aa): 'aaaa'→(aa)(aa)→(aaaa)=1 tok; 'aa'→1;
    // 'ab' unaffected by either merge → 2 toks.
    val r = BpeMerges.encodeWith(docs, "doc_id", "text",
      Seq(("a", "a"), ("aa", "aa")))
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r(1L) === ((2L, 2L)))
    assert(r(2L) === ((1L, 2L)))
  }

  test("trainAndEncode token total equals training's final corpus_tokens") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val trained = BpeMerges.trainMerges(docs, "text", rounds = 4)
    assert(trained.size === 4)
    val enc = BpeMerges.trainAndEncode(docs, "doc_id", "text", rounds = 4)
    val total = enc.agg(org.apache.spark.sql.functions.sum("n_tokens"))
      .collect()(0).getLong(0)
    assert(total === trained.last._5)
  }

  test("fertility report ≡ the per-doc encode rolled up by lang") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val enc = BpeMerges.trainAndEncode(docs, "doc_id", "text", rounds = 4)
    val expect = docs.select(col("doc_id").cast("long").as("doc_id"),
        col("lang").as("grp"))
      .join(enc, "doc_id")
      .groupBy("grp")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("n_words"),
        sum("n_tokens").as("n_tokens"))
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val got = BpeMerges.fertilityReport(docs, "doc_id", "text", "lang",
        rounds = 4)
      .collect().map { r =>
        // fertility is exactly the ratio of the two reported sums
        assert(r.getDouble(4) ===
          r.getLong(3).toDouble / r.getLong(2).toDouble)
        (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))
      }.toMap
    assert(got === expect)
    assert(got.values.forall { case (_, w, t) => t >= w }) // merges never split
  }

  test("stored merge table: encodeFromMerges ≡ trainAndEncode bit-equal") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.mkString("|")).toSeq
    val inSession = rows(BpeMerges.trainAndEncode(docs, "doc_id", "text",
      rounds = 4))
    spark.sql("DROP TABLE IF EXISTS graft_test_bpe_merges")
    CorpusWriter.writeBpeMerges(docs, "text", rounds = 4,
      "graft_test_bpe_merges")
    try {
      val stored = rows(BpeMerges.encodeFromMerges(docs, "doc_id", "text",
        spark.table("graft_test_bpe_merges")))
      assert(stored == inSession)
      // An untrained (empty) table is rejected loudly.
      intercept[IllegalArgumentException] {
        BpeMerges.encodeFromMerges(docs, "doc_id", "text",
          spark.table("graft_test_bpe_merges").limit(0))
      }
    } finally spark.sql("DROP TABLE IF EXISTS graft_test_bpe_merges")
  }

  test("fixture corpus: 6 rounds match the local reference trainer") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val texts = docs.select("text").collect().map(_.getString(0)).toSeq
    val got = run2(docs, 6)
    assert(got === refBpe(tokenize(texts), 6))
    // Token count must be non-increasing round over round.
    assert(got.map(_._5) === got.map(_._5).sorted.reverse)
  }

  private def run2(docs: org.apache.spark.sql.DataFrame, rounds: Int)
      : Seq[(Int, String, String, Long, Long)] =
    BpeMerges.merges(docs, "text", rounds).collect().toSeq
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
}
