package graft.pipeline

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Corpus-preparation operators: decontamination, passage dedup, quality
  * flags, epoch shuffle — planted-fixture semantics plus partitioning
  * invariance (results must not depend on how the input is split). */
class TrainingPrepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decontam flags exactly the train docs sharing an n-gram with eval") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),          // eval (id % 2 = 0)
      (1L, "xx yy Beta Gamma DELTA epsilon zz"),            // hits (case-folded)
      (3L, "alpha beta gamma nope delta epsilon zeta nope") // no shared 4-gram
    ).toDF("doc_id", "text")
    val got = Decontam.overlapReport(docs, "doc_id", "text",
        col("doc_id") % 2 === 0, n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 1L))) // only "beta gamma delta epsilon"
  }

  test("decontam counts distinct overlapping grams once") {
    val docs = Seq(
      (0L, "a b c d a b c d"),        // eval: gram "a b c d" (and rotations)
      (1L, "a b c d x a b c d")       // train: "a b c d" twice → 1 distinct + extras
    ).toDF("doc_id", "text")
    val got = Decontam.overlapReport(docs, "doc_id", "text",
        col("doc_id") === 0, n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // Train grams: {a b c d, b c d x, c d x a, d x a b, x a b c}; eval grams:
    // {a b c d, b c d a, c d a b, d a b c}. The eval rotations never occur in
    // the train doc, so the intersection is exactly {"a b c d"} → 1 (and the
    // repeat of that gram in the train doc still counts once).
    assert(got == Seq((1L, 1L)))
  }

  test("decontam eval side past the broadcast bound is a contract error, not an OOM") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"), // eval: 3 distinct 4-grams
      (1L, "xx yy beta gamma delta epsilon zz")
    ).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      Decontam.overlapReport(docs, "doc_id", "text",
        col("doc_id") % 2 === 0, n = 4, maxEvalGrams = 2L).collect()
    }
    assert(ex.getMessage.contains("broadcast contract bound"))
  }

  test("passage dedup drops corpus-frequent chunks, keeps order, drops empty docs") {
    val boiler = "one two three four five six seven eight" // exactly one chunk
    val docs = Seq(
      (0L, s"$boiler unique zero tail"),
      (1L, s"$boiler unique one tail"),
      (2L, boiler) // all-boilerplate → vanishes
    ).toDF("doc_id", "text")
    val got = Passages.dedupPassages(docs, "doc_id", "text", 8, 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (0L, "unique zero tail", 1L),
      (1L, "unique one tail", 1L)))
  }

  test("passage dedup is invariant to input partitioning") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    def run(p: Int) = Passages.dedupPassages(docs.repartition(p), "doc_id", "text", 8, 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(run(1) == run(7))
  }

  test("quality flags: bounds and stopword check") {
    val wordy = ("word " * 30).trim            // 30 tokens, mean 4.0, no stopword
    val stopy = ("word " * 29).trim + " the"   // 30 tokens, has "the", mean 3.97
    val tiny = "the of is"                     // 3 tokens → fails count
    val longw = (("wordiest " * 25).trim)      // mean 8.0 → fails mean bound
    val df = Seq((0L, wordy), (1L, stopy), (2L, tiny), (3L, longw))
      .toDF("doc_id", "text")
    val got = TextStats.qualityFlags(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getBoolean(3), r.getBoolean(4),
        r.getBoolean(5), r.getBoolean(6))).toSeq
    assert(got == Seq(
      (0L, true, true, false, false),
      (1L, true, true, true, true),
      (2L, false, false, true, false),
      (3L, true, false, false, false)))
  }

  test("epoch shuffle: total, contiguous per-shard positions, epoch-sensitive") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val a = EpochShuffle.assign(docs, "doc_id", epoch = 3, numShards = 16).collect()
    assert(a.length == docs.count())
    val byShard = a.groupBy(_.getInt(1))
    assert(byShard.keySet.subsetOf((0 until 16).toSet))
    byShard.values.foreach { rows =>
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to rows.length).toSeq)
    }
    val b = EpochShuffle.assign(docs, "doc_id", epoch = 4, numShards = 16).collect()
    val posA = a.map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val posB = b.map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(posA != posB) // a new epoch is a genuinely different order
    // determinism across partitioning
    val a2 = EpochShuffle.assign(docs.repartition(7), "doc_id", 3, 16)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(a2 == posA)
  }
}
