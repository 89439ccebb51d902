package graft.pipeline

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** Connected components must agree with a reference union-find on every
  * graph shape that stresses the propagation: chains (diameter), merged
  * components, isolated pairs. */
class DupClustersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)], maxIters: Int = 20): Map[Long, Long] =
    DupClusters.connectedComponents(pairs.toDF("a", "b"), "a", "b", maxIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Reference union-find over the same pairs. */
  private def expected(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // root labels are minimal: union always keeps the smaller root
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("two components, one formed by a chain") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
    val got = cc(pairs)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("long chain converges in O(log diameter) rounds (pointer jumping)") {
    val chain = (0L until 30L).map(i => (i, i + 1))
    // propagation alone would need 30 rounds; jumping gets there in ≤ 8
    assert(cc(chain, maxIters = 8) == (0L to 30L).map(_ -> 0L).toMap)
  }

  test("exceeding the round bound raises instead of returning wrong labels") {
    val chain = (0L until 30L).map(i => (i, i + 1))
    assertThrows[IllegalStateException](cc(chain, maxIters = 2))
  }

  test("random graph ≡ union-find") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(200)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    assert(cc(pairs) == expected(pairs))
  }

  test("canonicalize keeps exactly one doc per cluster plus all singletons") {
    val docs = (1L to 10L).map(i => (i, s"text$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("a", "b")
    val kept = DupClusters.canonicalize(docs, "doc_id", pairs, "a", "b")
    assert(kept.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 4L, 5L, 6L, 7L, 9L, 10L))
    // the cluster-member side is runtime-small → AQE's FINAL plan must
    // have converted the anti-join to broadcast (statically it is SMJ:
    // the CC output has no size stats)
    val physical = kept.queryExecution.executedPlan.toString
    assert(physical.contains("isFinalPlan=true"), physical.take(300))
    assert(physical.contains("BroadcastHashJoin") && physical.contains("LeftAnti"),
      physical.take(2000))
  }

  test("fixture near-dup pairs resolve to clusters labeled by their min doc") {
    val pairs = MinHashDedup.nearDupPairs(
      Tables.load(spark, TestSpark.Sf, "documents"), "doc_id", "text", 0.5)
    val clusters = DupClusters.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(clusters.nonEmpty)
    // every cluster label is a member of its own cluster and the minimum
    val byCluster = clusters.groupBy(_._2).view.mapValues(_.map(_._1).toSet)
    byCluster.foreach { case (label, members) =>
      assert(members.contains(label) && label == members.min)
    }
  }

  test("groupSplit: no near-dup pair ever straddles the train/val boundary") {
    val docs = Tables.load(spark, TestSpark.Sf, "documents")
    val pairs = MinHashDedup.nearDupPairs(docs, "doc_id", "text", 0.5)
    val splitDf = DupClusters.groupSplit(docs, "doc_id", pairs,
      "doc_a", "doc_b", valFrac = 0.3)
    val split = splitDf
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // The cluster table is graph-sized → AQE's final plan must broadcast
    // it against the corpus (the q40 canonicalize property, same reason).
    val physical = splitDf.queryExecution.executedPlan.toString
    assert(physical.contains("isFinalPlan=true"), physical.take(300))
    assert(physical.contains("BroadcastHashJoin"), physical.take(2000))
    // Total: one row per document, both sides populated at valFrac=0.3.
    assert(split.size == docs.count())
    assert(split.values.exists(_._2 == "val") &&
      split.values.exists(_._2 == "train"))
    // THE property: both ends of every near-dup pair share root + split —
    // a row-wise split would leak each duplicated doc across the boundary.
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    edges.foreach { case (a, b) =>
      assert(split(a) == split(b), s"pair ($a,$b) straddles: ${split(a)} vs ${split(b)}")
    }
    // Unpaired docs root themselves.
    val paired = edges.flatMap(e => Seq(e._1, e._2)).toSet
    split.foreach { case (id, (root, _)) =>
      if (!paired.contains(id)) assert(root == id, s"singleton $id rooted at $root")
    }
  }

  test("groupSplit uses transitive closure, not just direct pairs") {
    // Chain 1–2, 2–3: docs 1 and 3 never share a pair but must share a
    // split (near-dup similarity chains in real corpora).
    val docs = (1L to 6L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val out = DupClusters.groupSplit(docs, "doc_id", pairs, "a", "b", 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L) == out(2L) && out(2L) == out(3L))
    assert(out(1L)._1 == 1L)
    assert(Seq(4L, 5L, 6L).forall(i => out(i)._1 == i))
  }

  test("canonicalizeBest keeps the top-scoring member; ≡ canonicalize on anti-id score") {
    val docs = Seq(
      (1L, "a", 10L), (2L, "b", 30L), (3L, "c", 20L), // cluster {1,2,3}
      (7L, "d", 5L), (8L, "e", 5L), // cluster {7,8}: tie → smaller id
      (9L, "f", 1L) // singleton
    ).toDF("doc_id", "text", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("a", "b")
    val kept = DupClusters.canonicalizeBest(docs, "doc_id", pairs, "a", "b",
      "quality").collect().map(_.getLong(0)).sorted.toSeq
    // doc 2 wins {1,2,3} on quality 30; tie in {7,8} goes to doc 7;
    // the singleton survives untouched.
    assert(kept == Seq(2L, 7L, 9L))
    // Output schema is the input's, no helper columns leak.
    assert(DupClusters.canonicalizeBest(docs, "doc_id", pairs, "a", "b",
      "quality").columns.toSeq == Seq("doc_id", "text", "quality"))
    // With a score DECREASING in id, the best member IS the minimum id:
    // canonicalizeBest degenerates to canonicalize exactly.
    val fixture = Tables.load(spark, TestSpark.Sf, "documents").limit(200)
    val fpairs = graft.ops.Materialize.barrier(
      MinHashDedup.nearDupPairs(fixture, "doc_id", "text", 0.5))
    try {
      val best = DupClusters.canonicalizeBest(
        fixture.withColumn("anti",
          -org.apache.spark.sql.functions.col("doc_id")), "doc_id", fpairs,
        "doc_a", "doc_b", "anti")
        .collect().map(_.getLong(0)).toSet
      val plain = DupClusters.canonicalize(fixture, "doc_id", fpairs,
        "doc_a", "doc_b").collect().map(_.getLong(0)).toSet
      assert(best == plain)
      assert(best.nonEmpty)
    } finally graft.ops.Materialize.release(Seq(fpairs))
  }

  test("clusters-form groupSplit composes a precomputed cluster table (r10 verdict)") {
    // A handmade cluster table drives the splits directly — no CC run —
    // and every doc takes exactly its ROOT's md5 draw.
    val docs = (1L to 8L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val clusters = Seq((2L, 1L), (1L, 1L), (5L, 4L), (4L, 4L))
      .toDF("id", "cluster")
    val out = DupClusters.groupSplit(docs, "doc_id", clusters, 0.4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L)._1 == 1L && out(2L)._1 == 1L && out(1L) == out(2L))
    assert(out(4L)._1 == 4L && out(5L)._1 == 4L && out(4L) == out(5L))
    Seq(3L, 6L, 7L, 8L).foreach(i => assert(out(i)._1 == i))
    // The draw is the documented md5-threshold rule, checked per root.
    val threshold = f"${math.floor(0.4 * 65536).toLong}%04x"
    out.foreach { case (_, (root, split)) =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(root.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      assert(split == (if (md5 < threshold) "val" else "train"), s"root $root")
    }
    // Delegation: the pairs form on edges generating those clusters
    // returns the identical frame.
    val pairs = Seq((1L, 2L), (4L, 5L)).toDF("a", "b")
    val viaPairs = DupClusters.groupSplit(docs, "doc_id", pairs, "a", "b", 0.4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(viaPairs == out)
  }

  test("dedupManifest: one CC run yields split + canonical flag consistently") {
    val docs = Tables.load(spark, TestSpark.Sf, "documents")
    val pairs = graft.ops.Materialize.barrier(
      MinHashDedup.nearDupPairs(docs, "doc_id", "text", 0.5))
    try {
      val manifest = DupClusters.dedupManifest(docs, "doc_id", pairs,
        "doc_a", "doc_b", valFrac = 0.1)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getString(2), r.getBoolean(3))).toMap
      // is_canonical ⟺ the doc survives canonicalize — the manifest must
      // agree with the standalone q40 chain on the same pairs.
      val kept = DupClusters.canonicalize(docs, "doc_id", pairs, "doc_a", "doc_b")
        .collect().map(_.getLong(0)).toSet
      assert(manifest.size == docs.count())
      manifest.foreach { case (id, (root, _, canon)) =>
        assert(canon == kept.contains(id), s"doc $id")
        assert(canon == (id == root), s"doc $id root $root")
      }
      // And the split column is exactly the groupSplit draw on the same
      // pairs (same CC, same md5 rule).
      val split = DupClusters.groupSplit(docs, "doc_id", pairs,
        "doc_a", "doc_b", valFrac = 0.1)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      manifest.foreach { case (id, (root, s, _)) =>
        assert(split(id) == ((root, s)), s"doc $id")
      }
    } finally graft.ops.Materialize.release(Seq(pairs))
  }

  test("sourceDupReport: planted cross-source copy and within-source dup") {
    import org.apache.spark.sql.functions.col
    val body = Array.tabulate(30)(i => s"tok$i word$i item$i").mkString(" ")
    val other = Array.tabulate(30)(i => s"aaa$i bbb$i ccc$i").mkString(" ")
    // srcA: 1 (root) + 2 (its within-source dup). srcB: 3 copies srcA's
    // content (cross-source dup, root 1 lives in srcA); 4 is unique.
    val docs = Seq(
      (1L, "srcA", body), (2L, "srcA", body + " x"),
      (3L, "srcB", body + " y"), (4L, "srcB", other))
      .toDF("doc_id", "source", "text")
    val r = DupClusters.sourceDupReport(docs, "doc_id", "source", "text", 0.5)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4))).toMap
    assert(r("srcA") === ((2L, 1L, 0L, 0.5)))
    assert(r("srcB") === ((2L, 1L, 1L, 0.5)))
  }

  test("sourceDupReport fixture invariants: totals add up, rates in [0,1]") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val r = DupClusters.sourceDupReport(docs, "doc_id", "source", "text", 0.5)
      .collect()
    assert(r.map(_.getLong(1)).sum === docs.count())
    r.foreach { row =>
      assert(row.getLong(2) <= row.getLong(1))
      assert(row.getDouble(4) >= 0.0 && row.getDouble(4) <= 1.0)
    }
  }

  private def incCc(stored: Map[Long, Long],
      pairs: Seq[(Long, Long)]): Map[Long, Long] =
    DupClusters.incrementalClusters(
      stored.toSeq.toDF("id", "cluster"), pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("incrementalClusters: merge, extend, new-vertex and no-op landings") {
    // Standing: {1,2,3} rooted 1; {10,11} rooted 10; singleton graph only
    // tracks paired vertices, so 20 is absent.
    val stored = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L)
    // Landing: (3,10) merges the two components; (11,20) extends with a
    // new vertex; (30,31) is a brand-new component; (1,2) is a no-op
    // edge inside an existing cluster.
    val got = incCc(stored, Seq((3L, 10L), (11L, 20L), (30L, 31L), (1L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L,
      20L -> 1L, 30L -> 30L, 31L -> 30L))
  }

  test("incrementalClusters: empty landing leaves the assignment unchanged") {
    val stored = Map(1L -> 1L, 2L -> 1L, 7L -> 7L, 8L -> 7L)
    assert(incCc(stored, Seq.empty) == stored)
  }

  test("incrementalClusters ≡ full CC over the union on randomized landings") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val all = Seq.fill(150)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter { case (a, b) => a != b }
      // Split edges into an initial corpus landing plus two increments.
      val tagged = all.map(p => (p, rnd.nextInt(3)))
      val base = tagged.collect { case (p, 0) => p }
      val inc1 = tagged.collect { case (p, 1) => p }
      val inc2 = tagged.collect { case (p, 2) => p }
      var state = cc(base)
      state = incCc(state, inc1)
      state = incCc(state, inc2)
      assert(state == expected(all), s"trial $trial diverged")
    }
  }

  test("cluster sidecar: write + two update landings ≡ full CC, bucket spec survives") {
    import graft.pipeline.CorpusWriter
    val tbl = "graft_test_clusters_sidecar"
    Seq("", "_meta", "__swap").foreach { s =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl$s")
      CorpusWriter.dropOrphanedLocation(spark, tbl + s)
    }
    val rnd = new scala.util.Random(11)
    val all = Seq.fill(120)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter { case (a, b) => a != b }
    val (base, rest) = all.splitAt(40)
    val (inc1, inc2) = rest.splitAt(40)
    CorpusWriter.writeClusters(
      DupClusters.connectedComponents(base.toDF("a", "b"), "a", "b"),
      tbl, buckets = 4)
    CorpusWriter.updateClusters(spark, tbl, inc1.toDF("a", "b"), "a", "b")
    CorpusWriter.updateClusters(spark, tbl, inc2.toDF("a", "b"), "a", "b")
    val got = spark.table(tbl).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected(all))
    // The swap-and-rename must keep the bucket layout: consumers rely on
    // the id-bucketed scan for exchange-free joins across landings.
    val catalogTable = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(tbl))
    assert(catalogTable.bucketSpec.exists(b =>
      b.numBuckets == 4 && b.bucketColumnNames == Seq("id")), catalogTable.bucketSpec)
    assert(!spark.catalog.tableExists(s"${tbl}__swap"))
  }
}
