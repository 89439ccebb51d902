package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The stored IVF-PQ sidecar (q140): stored ≡ in-session bit-equality
  * and the landing identities, at PQ-code grain. */
class LandedIvfPqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val emb =
    graft.core.Tables.load(spark, TestSpark.Sf, "embeddings")
  private val qids = Seq(0L, 1L, 2L)

  private def queries = emb.filter(col("vec_id").isin(qids: _*))

  private def probeBits(tbl: String) =
    ProductQuant.ivfAdcTopKFromIndex(spark, tbl, queries, "vec_id",
        "embedding", nprobe = 3, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getLong(3)))
      .toSeq

  test("stored-index probe ≡ in-session ivfAdcTopK under the same training corpus") {
    val tbl = "graft_test_ivfpq_full"
    CorpusWriter.writeIvfPqIndex(emb, "vec_id", "embedding", tbl,
      kCoarse = 8, coarseRounds = 2, m = 8, k = 16, pqRounds = 2, dim = 64)
    val stored = probeBits(tbl)
    val live = ProductQuant.ivfAdcTopK(emb, "vec_id", "embedding", qids,
        kCoarse = 8, coarseRounds = 2, m = 8, k = 16, pqRounds = 2,
        dim = 64, nprobe = 3, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getLong(3)))
      .toSeq
    assert(stored == live)
  }

  test("stored probe: ONE member-table scan, directory-pruned to the probed cells") {
    val tbl = "graft_test_ivfpq_shape"
    CorpusWriter.writeIvfPqIndex(emb, "vec_id", "embedding", tbl,
      kCoarse = 8, coarseRounds = 2, m = 8, k = 16, pqRounds = 2, dim = 64)
    val scored = ProductQuant.ivfAdcScoredFromIndex(spark, tbl, queries,
      "vec_id", "embedding", nprobe = 3)
    scored.collect()
    val (mem, file) = PlanShapes.topLevelScans(scored)
    val names = PlanShapes.topLevelNodeNames(scored)
    val p = scored.queryExecution.executedPlan.toString
    assert(file == 1 && mem == 0, s"(mem=$mem, file=$file)\n$names")
    assert(!names.exists(_.startsWith("Union")), names)
    assert(names.exists(_.startsWith("BroadcastHashJoin")), names)
    // The static cell isin reaches the scan as a partition filter, so
    // unprobed cell directories never open.
    assert(p.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("cell")), p)
  }

  test("one landing ≡ two landings, and re-landing a batch is a no-op") {
    val a = emb.filter(col("vec_id") % 2 === 0)
    val b = emb.filter(col("vec_id") % 2 === 1)
    val one = "graft_test_ivfpq_one"
    CorpusWriter.writeIvfPqIndex(a, "vec_id", "embedding", one,
      kCoarse = 8, coarseRounds = 2, m = 8, k = 16, pqRounds = 2, dim = 64)
    CorpusWriter.appendToIvfPqIndex(b, "vec_id", "embedding", one)
    val two = "graft_test_ivfpq_two"
    CorpusWriter.writeIvfPqIndex(a, "vec_id", "embedding", two,
      kCoarse = 8, coarseRounds = 2, m = 8, k = 16, pqRounds = 2, dim = 64)
    CorpusWriter.appendToIvfPqIndex(
      b.filter(col("vec_id") % 3 === 0), "vec_id", "embedding", two)
    CorpusWriter.appendToIvfPqIndex(
      b.filter(col("vec_id") % 3 =!= 0), "vec_id", "embedding", two)
    assert(probeBits(one) == probeBits(two))
    val before = spark.table(one).count()
    CorpusWriter.appendToIvfPqIndex(b, "vec_id", "embedding", one)
    assert(spark.table(one).count() == before)
    assert(probeBits(one) == probeBits(two))
  }

  test("residual sidecar: stored probe ≡ in-session residualIvfAdcTopK; landing identity; encoding guards (r19)") {
    val tbl = "graft_test_rivfpq_full"
    Seq("", "_coarse", "_books", "_meta")
      .foreach(s => spark.sql(s"DROP TABLE IF EXISTS $tbl$s"))
    CorpusWriter.writeResidualIvfPqIndex(emb, "vec_id", "embedding", tbl,
      kCoarse = 8, coarseRounds = 2, m = 8, k = 16, pqRounds = 2, dim = 64)
    def rBits(t: String) =
      ProductQuant.residualIvfAdcTopKFromIndex(spark, t, queries,
          "vec_id", "embedding", nprobe = 3, topK = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getLong(3)))
        .toSeq
    val live = ProductQuant.residualIvfAdcTopK(emb, "vec_id", "embedding",
        qids, kCoarse = 8, coarseRounds = 2, m = 8, k = 16, pqRounds = 2,
        dim = 64, nprobe = 3, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getLong(3)))
      .toSeq
    assert(rBits(tbl) == live)
    // Encoding guards both ways: the raw probe and the raw landing
    // refuse a residual index...
    val e1 = intercept[IllegalArgumentException] {
      ProductQuant.ivfAdcTopKFromIndex(spark, tbl, queries, "vec_id",
        "embedding", nprobe = 3, topK = 10)
    }
    assert(e1.getMessage.contains("residual-encoded"))
    val e2 = intercept[IllegalArgumentException] {
      CorpusWriter.appendToIvfPqIndex(emb.limit(1), "vec_id", "embedding", tbl)
    }
    assert(e2.getMessage.contains("residual-encoded"))
    // ...and the residual probe refuses a raw index.
    val rawTbl = "graft_test_ivfpq_full"
    if (!spark.catalog.tableExists(s"${rawTbl}_meta"))
      CorpusWriter.writeIvfPqIndex(emb, "vec_id", "embedding", rawTbl,
        kCoarse = 8, coarseRounds = 2, m = 8, k = 16, pqRounds = 2, dim = 64)
    val e3 = intercept[IllegalArgumentException] {
      ProductQuant.residualIvfAdcTopKFromIndex(spark, rawTbl, queries,
        "vec_id", "embedding", nprobe = 3, topK = 10)
    }
    assert(e3.getMessage.contains("raw-encoded"))
    // Landing identity: write(evens)+append(odds in two batches) probes
    // bit-equal to one append, and re-landing is a no-op.
    val a = emb.filter(col("vec_id") % 2 === 0)
    val b = emb.filter(col("vec_id") % 2 === 1)
    val one = "graft_test_rivfpq_one"
    val two = "graft_test_rivfpq_two"
    Seq(one, two).foreach(t => Seq("", "_coarse", "_books", "_meta")
      .foreach(s => spark.sql(s"DROP TABLE IF EXISTS $t$s")))
    CorpusWriter.writeResidualIvfPqIndex(a, "vec_id", "embedding", one,
      kCoarse = 8, coarseRounds = 2, m = 8, k = 16, pqRounds = 2, dim = 64)
    CorpusWriter.appendToResidualIvfPqIndex(b, "vec_id", "embedding", one)
    CorpusWriter.writeResidualIvfPqIndex(a, "vec_id", "embedding", two,
      kCoarse = 8, coarseRounds = 2, m = 8, k = 16, pqRounds = 2, dim = 64)
    CorpusWriter.appendToResidualIvfPqIndex(
      b.filter(col("vec_id") % 3 === 0), "vec_id", "embedding", two)
    CorpusWriter.appendToResidualIvfPqIndex(
      b.filter(col("vec_id") % 3 =!= 0), "vec_id", "embedding", two)
    assert(rBits(one) == rBits(two))
    val before = spark.table(one).count()
    CorpusWriter.appendToResidualIvfPqIndex(b, "vec_id", "embedding", one)
    assert(spark.table(one).count() == before)
    Seq(tbl, one, two).foreach(t => Seq("", "_coarse", "_books", "_meta")
      .foreach(s => spark.sql(s"DROP TABLE IF EXISTS $t$s")))
  }

  test("staleness-driven partial re-land at PQ grain: stale cells re-encode under frozen books; untouched files stable (r19)") {
    import spark.implicits._
    val evens = emb.filter(col("vec_id") % 2 === 0)
    val tbl = "graft_test_ivfpq_reland"
    val ref = "graft_test_ivfpq_reland_ref"
    Seq(tbl, ref).foreach(t => Seq("", "_coarse", "_books", "_meta")
      .foreach(s => spark.sql(s"DROP TABLE IF EXISTS $t$s")))
    CorpusWriter.writeIvfPqIndex(evens, "vec_id", "embedding", tbl,
      kCoarse = 8, coarseRounds = 2, m = 8, k = 16, pqRounds = 2, dim = 64)
    val byCell = spark.table(tbl).select("cell", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    val bigCells = byCell.filter(_._2.length >= 4).keys.toSeq.sorted
    assert(bigCells.size >= 2, s"too few populated cells: $byCell")
    val c1 = bigCells.head
    val deleted = byCell(c1).take(byCell(c1).length / 2).toSet
    val current = evens.filter(!col("vec_id").isin(deleted.toSeq: _*))
    val report = CorpusWriter.ivfPqCellStaleness(spark, tbl, current,
        "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(report.filter { case (_, (mi, or)) => mi + or > 0 }.keySet == Set(c1))
    def partFiles(t: String): Map[String, Long] = {
      val cat = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(t))
      val root = new java.io.File(new java.net.URI(cat.location.toString).getPath)
      def walk(f: java.io.File): Iterator[java.io.File] =
        if (f.isDirectory) f.listFiles().iterator.flatMap(walk)
        else Iterator.single(f)
      walk(root).filter(_.getName.startsWith("part-"))
        .map(f => (root.toPath.relativize(f.toPath).toString, f.lastModified))
        .toMap
    }
    val before = partFiles(tbl)
    assert(CorpusWriter.relandStaleIvfPqCells(spark, tbl, current,
      "vec_id", "embedding", bar = 0.0) == Seq(c1))
    val after = partFiles(tbl)
    val untouched = (p: String) => !p.startsWith(s"cell=$c1/")
    assert(before.filter(kv => untouched(kv._1)) ==
      after.filter(kv => untouched(kv._1)))
    // Probe ≡ the established partition-scoped retirement on a twin.
    CorpusWriter.writeIvfPqIndex(evens, "vec_id", "embedding", ref,
      kCoarse = 8, coarseRounds = 2, m = 8, k = 16, pqRounds = 2, dim = 64)
    CorpusWriter.retireFromIvfPqIndex(spark, ref,
      deleted.toSeq.toDF("vec_id"), "vec_id")
    assert(probeBits(tbl) == probeBits(ref))
    assert(CorpusWriter.relandStaleIvfPqCells(spark, tbl, current,
      "vec_id", "embedding", bar = 0.0).isEmpty)
    Seq(tbl, ref).foreach(t => Seq("", "_coarse", "_books", "_meta")
      .foreach(s => spark.sql(s"DROP TABLE IF EXISTS $t$s")))
  }

  test("member table stores codes, not vectors (the byte cut)") {
    val tbl = "graft_test_ivfpq_full"
    if (!spark.catalog.tableExists(s"${tbl}_meta"))
      CorpusWriter.writeIvfPqIndex(emb, "vec_id", "embedding", tbl,
        kCoarse = 8, coarseRounds = 2, m = 8, k = 16, pqRounds = 2, dim = 64)
    val fields = spark.table(tbl).schema.fieldNames.toSet
    assert(fields == Set("vec_id", "codes", "cell"))
    val row = spark.table(tbl).limit(1).collect().head
    assert(row.getSeq[Long](row.fieldIndex("codes")).length == 8)
  }
}
