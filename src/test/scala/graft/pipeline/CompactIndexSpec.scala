package graft.pipeline

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Sidecar compaction (VERDICT r14 item 3): repeated bucketed APPENDS
  * accumulate one file-set per landing; compaction rewrites in place
  * under the same bucket spec and must be answer-INVISIBLE — the probe
  * reads bit-identically before and after, with the file count collapsed
  * to one file per bucket.
  */
class CompactIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randText(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
  }

  private def released[T](body: => T): T = {
    val (out, frames) = graft.ops.Materialize.collecting(body)
    graft.ops.Materialize.release(frames)
    out
  }

  /** Data files under a managed table's warehouse directory. */
  private def dataFiles(table: String): Seq[String] = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val dir = new java.io.File(new java.net.URI(wh).getPath, table.toLowerCase)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet")).map(_.getName).toSeq
  }

  test("stratified-index probe is bit-equal across compaction; files collapse") {
    // One corpus, landed in EIGHT batches — the accumulation regime the
    // compactor exists for. Planted containment: each increment quote is
    // a substring of one corpus page.
    val pages = (1L to 16L).map(i => i -> randText(100 + i.toInt, 400 + 40 * i.toInt))
    val corpus = pages.toDF("doc_id", "text")
    val increment = pages.take(4)
      .map { case (i, p) => (100L + i) -> p.substring(50, 110) }
      .toDF("doc_id", "text")
    val tbl = "graft_test_compact_strat"
    val landings = pages.grouped(2).toSeq
    CorpusWriter.writeStratifiedIndex(
      landings.head.toDF("doc_id", "text"), "doc_id", "text", tbl, buckets = 4)
    landings.tail.foreach(b =>
      CorpusWriter.appendToStratifiedIndex(
        b.toDF("doc_id", "text"), "doc_id", "text", tbl))

    def probe(): Set[(Long, Long, Long, Long, Double)] = released {
      MinHashDedup.incrementalContainmentPairs(spark, tbl, increment,
        "doc_id", "text", 0.9, MinHashDedup.StrataSpan)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSet
    }
    val before = probe()
    assert(before.nonEmpty, "fixture must plant containment pairs")
    val memBefore = dataFiles(s"${tbl}_mem").size
    val payBefore = dataFiles(s"${tbl}_payload").size
    // 8 landings × ≥1 file per touched bucket — well above one per bucket.
    assert(memBefore > 4, s"expected accumulation, got $memBefore files")

    CorpusWriter.compactStratifiedIndex(spark, tbl)

    assert(probe() == before, "compaction changed the probe answer")
    val memAfter = dataFiles(s"${tbl}_mem").size
    val payAfter = dataFiles(s"${tbl}_payload").size
    assert(memAfter <= 4 && memAfter < memBefore,
      s"_mem files $memBefore -> $memAfter (buckets=4)")
    assert(payAfter <= 4 && payAfter < payBefore,
      s"_payload files $payBefore -> $payAfter (buckets=4)")
    assert(dataFiles(s"${tbl}_levels").size == 1)
    // The bucket spec survived the rewrite: a second compaction still
    // sees a bucketed table (compactTable refuses non-bucketed ones).
    CorpusWriter.compactStratifiedIndex(spark, tbl)
    assert(probe() == before)
  }

  test("gram-index novelty is bit-equal across compaction; files collapse") {
    val docs = (1L to 40L)
      .map(i => i -> s"alpha bravo ${randText(i.toInt, 60)} charlie delta doc$i")
    val corpusBatches = docs.filter(_._1 % 5 != 0).grouped(8).toSeq
    val increment = docs.filter(_._1 % 5 == 0).toDF("doc_id", "text")
    val tbl = "graft_test_compact_gram"
    CorpusWriter.writeGramIndex(
      corpusBatches.head.toDF("doc_id", "text"), "text", n = 3, tbl, buckets = 4)
    corpusBatches.tail.foreach(b =>
      CorpusWriter.appendToGramIndex(b.toDF("doc_id", "text"), "text", tbl,
        src = s"compactspec:${b.hashCode}"))

    def probe(): Set[(Long, Long, Long)] = released {
      Novelty.noveltyAgainstIndex(spark, tbl, increment, "doc_id", "text", n = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val before = probe()
    assert(before.nonEmpty)
    val filesBefore = dataFiles(tbl).size
    assert(filesBefore > 4, s"expected accumulation, got $filesBefore files")

    CorpusWriter.compactGramIndex(spark, tbl)

    assert(probe() == before, "compaction changed the novelty answer")
    val filesAfter = dataFiles(tbl).size
    assert(filesAfter <= 4 && filesAfter < filesBefore,
      s"files $filesBefore -> $filesAfter (buckets=4)")
  }

  test("compactTable refuses a non-bucketed table loudly") {
    val tbl = "graft_test_compact_plain"
    CorpusWriter.dropOrphanedLocation(spark, tbl)
    Seq((1L, "x")).toDF("id", "v")
      .write.mode("overwrite").format("parquet").saveAsTable(tbl)
    val err = intercept[RuntimeException] {
      CorpusWriter.compactTable(spark, tbl)
    }
    assert(err.getMessage.contains("not a bucketed table"))
  }
}
