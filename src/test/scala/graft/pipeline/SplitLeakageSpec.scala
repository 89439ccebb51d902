package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Split-leakage audit: every val doc reports, values bound [0,1], and
  * the report agrees with a manual recomputation from the split + gram
  * frames it composes. */
class SplitLeakageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("fixture: annotation-complete over val docs, consistent with manual recompute") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val pairs = MinHashDedup.nearDupPairs(docs, "doc_id", "text", 0.5)
    val rep = DupClusters.splitLeakageReport(docs, "doc_id", "text",
      pairs, "doc_a", "doc_b", valFrac = 0.1, n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rep.nonEmpty)
    assert(rep.forall { case (_, n, l) => l >= 0 && l <= n })

    // Manual recompute from the same split and gram derivations.
    graft.functions.GraftFunctions.register(spark)
    val split = DupClusters.groupSplit(docs, "doc_id",
      DupClusters.connectedComponents(pairs, "doc_a", "doc_b"), 0.1)
    val valIds = split.filter(col("split") === "val")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rep.map(_._1).toSet.subsetOf(valIds))
    // Every val doc with at least one 4-gram reports.
    val gramCounts = docs.select(col("doc_id"),
        size(graft.functions.GraftFunctions.wordGramHashes(col("text"), 4))
          .as("g"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expectIds = valIds.filter(id => gramCounts.getOrElse(id, 0) > 0)
    assert(rep.map(_._1).toSet === expectIds)

    // Spot-check one doc's leaked count against a driver-side recompute.
    val trainIds = split.filter(col("split") === "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val allGrams = docs.select(col("doc_id"),
        graft.functions.GraftFunctions.wordGramHashes(col("text"), 4)
          .as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val trainGrams = trainIds.flatMap(allGrams.getOrElse(_, Set.empty))
    rep.take(5).foreach { case (id, n, l) =>
      val g = allGrams(id)
      assert(n === g.size.toLong, s"doc $id")
      assert(l === g.count(trainGrams.contains).toLong, s"doc $id")
    }
  }
}
