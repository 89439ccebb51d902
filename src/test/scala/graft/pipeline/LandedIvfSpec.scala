package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The stored IVF-index sidecar (q137): landing identities, stored ≡
  * in-session bit-equality, and the probe's partition-pruned scan.
  */
class LandedIvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val emb =
    graft.core.Tables.load(spark, TestSpark.Sf, "embeddings")
  private val qids = Seq(0L, 1L, 2L, 3L, 4L)

  private def queries = emb.filter(col("vec_id").isin(qids: _*))

  private def probeBits(tbl: String, nprobe: Int = 2) =
    Clustering.ivfTopKFromIndex(spark, tbl, queries, "vec_id", "embedding",
        nprobe = nprobe, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getLong(3)))
      .toSeq

  test("stored-index probe ≡ in-session ivfTopK under the same training corpus") {
    val tbl = "graft_test_ivf_full"
    CorpusWriter.writeIvfIndex(emb, "vec_id", "embedding", tbl,
      k = 8, rounds = 3)
    val stored = probeBits(tbl)
    val live = Clustering.ivfTopK(emb, "vec_id", "embedding", qids,
        k = 8, rounds = 3, nprobe = 2, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getLong(3)))
      .toSeq
    assert(stored == live)
  }

  test("one landing ≡ two landings, and re-landing a batch is a no-op") {
    val a = emb.filter(col("vec_id") % 2 === 0)
    val b = emb.filter(col("vec_id") % 2 === 1)
    val one = "graft_test_ivf_one"
    CorpusWriter.writeIvfIndex(a, "vec_id", "embedding", one,
      k = 8, rounds = 3)
    CorpusWriter.appendToIvfIndex(b, "vec_id", "embedding", one)
    val two = "graft_test_ivf_two"
    CorpusWriter.writeIvfIndex(a, "vec_id", "embedding", two,
      k = 8, rounds = 3)
    CorpusWriter.appendToIvfIndex(
      b.filter(col("vec_id") % 3 === 0), "vec_id", "embedding", two)
    CorpusWriter.appendToIvfIndex(
      b.filter(col("vec_id") % 3 =!= 0), "vec_id", "embedding", two)
    assert(probeBits(one) == probeBits(two))
    // Anti-join discipline: landing b again changes nothing.
    val before = spark.table(one).count()
    CorpusWriter.appendToIvfIndex(b, "vec_id", "embedding", one)
    assert(spark.table(one).count() == before)
    assert(probeBits(one) == probeBits(two))
  }

  test("re-landing a vec_id with a CHANGED embedding never duplicates the id") {
    import spark.implicits._
    // 20 spread-out vectors so training yields several live cells.
    def vec(seed: Long): Seq[Float] =
      (0 until 64).map(i => (((seed * 31 + i * 17) % 13) - 6).toFloat / 7f)
    val a = (0L until 20L).map(id => (id, vec(id))).toDF("vec_id", "embedding")
    val tbl = "graft_test_ivf_changed"
    CorpusWriter.writeIvfIndex(a, "vec_id", "embedding", tbl, k = 4, rounds = 2)
    // Re-land ids 0-4 with DIFFERENT embeddings (likely new cells).
    val changed = (0L until 5L).map(id => (id, vec(id + 977L)))
      .toDF("vec_id", "embedding")
    CorpusWriter.appendToIvfIndex(changed, "vec_id", "embedding", tbl)
    val dup = spark.table(tbl).groupBy("vec_id").count()
      .filter(col("count") > 1).count()
    assert(dup == 0, "changed-embedding re-landing duplicated vec_ids")
    assert(spark.table(tbl).count() == 20)
  }

  test("the probe scan prunes cell directories (PartitionFilters)") {
    val tbl = "graft_test_ivf_full"
    if (!spark.catalog.tableExists(s"${tbl}_meta"))
      CorpusWriter.writeIvfIndex(emb, "vec_id", "embedding", tbl,
        k = 8, rounds = 3)
    val scored = Clustering.ivfScoredFromIndex(spark, tbl, queries,
      "vec_id", "embedding", nprobe = 2)
    val p = scored.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") &&
      p.linesIterator.exists(l => l.contains("PartitionFilters") &&
        l.contains("cell")), p)
  }

  private def dataFileCount(tbl: String): Int = {
    val cat = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(tbl))
    def walk(f: java.io.File): Iterator[java.io.File] =
      if (f.isDirectory) f.listFiles().iterator.flatMap(walk)
      else Iterator.single(f)
    walk(new java.io.File(new java.net.URI(cat.location.toString).getPath))
      .count(_.getName.startsWith("part-"))
  }

  test("compaction: one file per cell directory, probe bits unchanged") {
    val tbl = "graft_test_ivf_compact"
    val a = emb.filter(col("vec_id") % 4 === 0)
    CorpusWriter.writeIvfIndex(a, "vec_id", "embedding", tbl,
      k = 8, rounds = 2)
    (1L to 3L).foreach(r => CorpusWriter.appendToIvfIndex(
      emb.filter(col("vec_id") % 4 === r), "vec_id", "embedding", tbl))
    val before = probeBits(tbl)
    val filesBefore = dataFileCount(tbl)
    CorpusWriter.compactIvfIndex(spark, tbl)
    assert(probeBits(tbl) == before)
    val filesAfter = dataFileCount(tbl)
    assert(filesAfter < filesBefore, s"$filesBefore -> $filesAfter")
    // One task holds each cell, so each cell directory holds one file:
    // ≤ k files total.
    assert(filesAfter <= 8, s"filesAfter=$filesAfter")
  }

  private def partFiles(tbl: String): Map[String, Long] = {
    val cat = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(tbl))
    val root = new java.io.File(new java.net.URI(cat.location.toString).getPath)
    def walk(f: java.io.File): Iterator[java.io.File] =
      if (f.isDirectory) f.listFiles().iterator.flatMap(walk)
      else Iterator.single(f)
    walk(root).filter(_.getName.startsWith("part-"))
      .map(f => (root.toPath.relativize(f.toPath).toString, f.lastModified))
      .toMap
  }

  test("staleness-driven partial re-land: only stale cells rewrite; untouched files byte-stable (r19)") {
    import spark.implicits._
    val evens = emb.filter(col("vec_id") % 2 === 0)
    val tbl = "graft_test_ivf_reland"
    val ref = "graft_test_ivf_reland_ref"
    Seq(tbl, ref).foreach(t => Seq("", "_cent", "_meta")
      .foreach(s => spark.sql(s"DROP TABLE IF EXISTS $t$s")))
    CorpusWriter.writeIvfIndex(evens, "vec_id", "embedding", tbl,
      k = 8, rounds = 2)
    // Localize the corpus change to two cells: delete half of c1's
    // members, add clones (new ids, same embeddings → same cell) of
    // two c2 members.
    val byCell = spark.table(tbl).select("cell", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    val bigCells = byCell.filter(_._2.length >= 4).keys.toSeq.sorted
    assert(bigCells.size >= 3, s"fixture yielded too few populated cells: $byCell")
    val (c1, c2) = (bigCells(0), bigCells(1))
    val deleted = byCell(c1).take(byCell(c1).length / 2).toSet
    val cloneSrc = byCell(c2).take(2).toSet
    val added = emb.filter(col("vec_id").isin(cloneSrc.toSeq: _*))
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val current = evens.filter(!col("vec_id").isin(deleted.toSeq: _*))
      .select(col("vec_id"), col("embedding"))
      .unionAll(added)
    // Staleness localizes: exactly c1 (orphans) and c2 (missing) over 0.
    val report = CorpusWriter.ivfCellStaleness(spark, tbl, current,
        "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val staleCells = report.filter { case (_, (_, _, mi, or)) => mi + or > 0 }
    assert(staleCells.keySet == Set(c1, c2), s"stale = $staleCells")
    val filesBefore = partFiles(tbl)
    val relanded = CorpusWriter.relandStaleIvfCells(spark, tbl, current,
      "vec_id", "embedding", bar = 0.0)
    assert(relanded.toSet == Set(c1, c2))
    // Untouched cells' files unchanged by name AND mtime.
    val filesAfter = partFiles(tbl)
    val untouched = (p: String) =>
      !p.startsWith(s"cell=$c1/") && !p.startsWith(s"cell=$c2/")
    assert(filesBefore.filter(kv => untouched(kv._1)) ==
      filesAfter.filter(kv => untouched(kv._1)),
      "partial re-land touched a non-stale cell's files")
    // Member state converged: deleted gone, clones present in c2.
    val members = spark.table(tbl).select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deleted.forall(!members.contains(_)))
    cloneSrc.foreach(s => assert(members.get(s + 100000L).contains(c2)))
    // Probe ≡ the established retire+append chain on a twin index.
    CorpusWriter.writeIvfIndex(evens, "vec_id", "embedding", ref,
      k = 8, rounds = 2)
    CorpusWriter.retireFromIvfIndex(spark, ref,
      deleted.toSeq.toDF("vec_id"), "vec_id")
    CorpusWriter.appendToIvfIndex(added, "vec_id", "embedding", ref)
    assert(probeBits(tbl) == probeBits(ref))
    // And re-running at the same bar is a no-op: nothing stale remains.
    assert(CorpusWriter.relandStaleIvfCells(spark, tbl, current,
      "vec_id", "embedding", bar = 0.0).isEmpty)
    Seq(tbl, ref).foreach(t => Seq("", "_cent", "_meta")
      .foreach(s => spark.sql(s"DROP TABLE IF EXISTS $t$s")))
  }

  test("moved vector: relanding only the destination cell drags the origin in — no duplicate vec_id (r20)") {
    import spark.implicits._
    val evens = emb.filter(col("vec_id") % 2 === 0)
    val tbl = "graft_test_ivf_moved"
    Seq("", "_cent", "_meta").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl$s"))
    CorpusWriter.writeIvfIndex(evens, "vec_id", "embedding", tbl,
      k = 8, rounds = 2)
    val byCell = spark.table(tbl).select("cell", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    // Origin = the LARGEST cell (one orphan barely moves its
    // staleness); destination = another populated cell, pushed over
    // the bar by cloning all its members as unlanded growth.
    val c1 = byCell.maxBy(_._2.length)._1
    val c2 = byCell.filter(kv => kv._1 != c1 && kv._2.length >= 2)
      .keys.min
    val v = byCell(c1).head
    val donor = byCell(c2).head
    // v re-embeds to the donor's embedding: same frozen-centroid argmax
    // → v now assigns to c2, leaving its stale row in c1.
    val current = evens.filter(col("vec_id") =!= v)
      .select(col("vec_id"), col("embedding"))
      .unionAll(emb.filter(col("vec_id") === donor)
        .select(lit(v).as("vec_id"), col("embedding")))
      .unionAll(emb.filter(col("vec_id").isin(byCell(c2): _*))
        .select((col("vec_id") + 200000L).as("vec_id"), col("embedding")))
    val rep = CorpusWriter.ivfCellStaleness(spark, tbl, current,
        "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(rep(c2) > rep(c1), s"fixture: want dest staler — $rep")
    // A bar strictly between the two: only the DESTINATION exceeds it.
    val bar = (rep(c1) + rep(c2)) / 2.0
    val relanded = CorpusWriter.relandStaleIvfCells(spark, tbl, current,
      "vec_id", "embedding", bar)
    // The move closure drags the origin cell in alongside the
    // destination (without it, v's stale c1 row would survive and the
    // vec_id would occupy two cells).
    assert(relanded.contains(c2) && relanded.contains(c1), s"$relanded")
    val members = spark.table(tbl).select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(members.map(_._1).distinct.length == members.length,
      "duplicate vec_id across cells after partial re-land")
    assert(members.toMap.get(v).contains(c2))
    Seq("", "_cent", "_meta").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl$s"))
  }

  test("centroid drift: recenter targets the drifted cell, never degrades quantization, membership re-converges (r20)") {
    val evens = emb.filter(col("vec_id") % 2 === 0)
    val tbl = "graft_test_ivf_drift"
    Seq("", "_cent", "_meta").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl$s"))
    CorpusWriter.writeIvfIndex(evens, "vec_id", "embedding", tbl,
      k = 8, rounds = 2)
    // Manufacture drift: every member of one populated cell translates
    // by +0.5 per component — the cell's data moved, not its landings.
    val byCell = spark.table(tbl).select("cell", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1))).toMap
    val cMoved = byCell.maxBy(_._2.length)._1
    val movedIds = byCell(cMoved).toSeq
    val current = evens.select(col("vec_id"),
      when(col("vec_id").isin(movedIds: _*),
        expr("transform(embedding, v -> v + 0.5F)"))
        .otherwise(col("embedding")).as("embedding"))
    val rep = CorpusWriter.ivfCentroidDrift(spark, tbl, current,
      "vec_id", "embedding").sortBy(-_._3)
    assert(rep.head._3 > rep(1)._3 * 1.5,
      s"fixture: want one clearly-drifted cell — $rep")
    val bar = (rep.head._3 + rep(1)._3) / 2.0
    // Quantization quality meter: total assignment score (dot − ½|c|²)
    // — SSE differs from it by a centroid-independent constant, so
    // score non-decreasing ⇔ SSE non-increasing.
    def scoreSum(): Double = {
      val cents = spark.table(s"${tbl}_cent").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1).toSeq
      Clustering.withCluster(
          Clustering.lifted(current, "vec_id", "embedding"), cents)
        .agg(sum("score")).collect()(0).getDouble(0)
    }
    val before = scoreSum()
    val (recentered, _) = CorpusWriter.recenterDriftedIvfCells(spark,
      tbl, current, "vec_id", "embedding", bar)
    assert(recentered == Seq(rep.head._1), s"$recentered vs $rep")
    assert(scoreSum() >= before, "recenter degraded quantization")
    // Membership converged to the updated-centroid assignment exactly.
    val cents = spark.table(s"${tbl}_cent").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).toSeq
    val want = Clustering.withCluster(
        Clustering.lifted(current, "vec_id", "embedding"), cents)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = spark.table(tbl).select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    // And nothing remains stale.
    assert(CorpusWriter.relandStaleIvfCells(spark, tbl, current,
      "vec_id", "embedding", bar = 0.0).isEmpty)
    Seq("", "_cent", "_meta").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl$s"))
  }

  test("meta contract: nprobe beyond the stored k refuses loudly") {
    val tbl = "graft_test_ivf_full"
    if (!spark.catalog.tableExists(s"${tbl}_meta"))
      CorpusWriter.writeIvfIndex(emb, "vec_id", "embedding", tbl,
        k = 8, rounds = 3)
    val e = intercept[IllegalArgumentException] {
      Clustering.ivfTopKFromIndex(spark, tbl, queries, "vec_id",
        "embedding", nprobe = 9, topK = 10)
    }
    assert(e.getMessage.contains("nprobe"))
  }
}
