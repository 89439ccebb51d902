package graft.ops

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** The cache-release contract (VERDICT r8 item 1): every pipeline query
  * that materializes a query-lifetime cache registers it with
  * [[Materialize]], and releasing after the result is consumed leaves no
  * cached relation behind — the long-lived-session leak (one cached
  * corpus-scale aggregate per query until storage pressure evicts) is
  * closed by construction, not by `clearCache()` hygiene. */
class MaterializeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Every registered query whose construction persists at least one
    * shared frame (directly or through the pipelines it composes). */
  private val cacheUsers = Seq(
    "q22_minhash_pairs", // MinHashDedup.nearDupPairs: sig
    "q27_jaccard_pairs", // MinHashDedup.jaccardPairs: sig (inline-released) + hotMembers
    "q33_sign_lsh_pairs", // Similarity.bucketedNearDupPairs: reduced frame
    "q37_dup_clusters", // nearDupPairs sig + DupClusters edge cache (inline-released)
    "q40_canonical_corpus", // same chain as q37
    "q42_decontam", // Decontam: evalGrams
    "q48_kmeans", // Clustering.lifted
    "q49_semantic_dedup", // Clustering.lifted
    "q50_ivf_ann", // Clustering.lifted
    "q51_tfidf", // TfIdf: (doc, term) aggregate
    "q54_importance", // Importance: (doc, gram) aggregate
    "q55_importance_select", // Importance: (doc, stratum, gram) aggregate
    "q56_incremental_dedup", // IncrementalDedup: increment sidecar frame
    "q57_temperature_mix", // Sampling.temperatureMix: per-stratum quota frame
    "q59_group_split", // nearDupPairs sig + CC edge cache (inline-released)
    "q60_containment", // jaccard-machinery hotMembers frame
    "q61_target_mix", // Sampling.targetMix: per-stratum quota frame
    "q62_containment_stratified", // stratified index membership frame
    "q63_dedup_manifest", // nearDupPairs sig + CC edge cache (inline-released)
    "q64_waterfill_mix", // Sampling.waterfillMix: per-stratum quota frame
    "q65_incremental_containment", // two-sided stratified index frame
    "q66_canonical_best") // nearDupPairs sig + CC edge cache (inline-released)

  for (name <- cacheUsers)
    test(s"$name: consume, release, and no registered cache survives") {
      val before = Materialize.liveSnapshot(spark)
      val (rows, frames) = Materialize.collecting {
        SparkEntry.queries(name)(spark, TestSpark.Sf).collect()
      }
      assert(rows.nonEmpty)
      assert(frames.nonEmpty, s"$name registered no frame — if its caches " +
        "moved off Materialize, drop it from cacheUsers")
      Materialize.release(frames)
      frames.foreach(f => assert(f.storageLevel == StorageLevel.NONE,
        s"$name left a cached frame after release"))
      // Identity, not count (ADVICE r10): releasing this test's frames
      // can dissolve a SAME-PLAN CacheManager entry another suite left
      // registered (CacheManager dedupes by plan) and the self-healing
      // prune then drops that stale twin — a net count could mask a
      // genuine leak. Instead: no frame may be live now that wasn't
      // live before this query ran.
      val leaked = Materialize.liveSnapshot(spark) -- before
      assert(leaked.isEmpty,
        s"$name leaked ${leaked.size} registry entries")
    }

  test("releaseAll drains every registered frame for the session") {
    val ((), frames) = Materialize.collecting {
      SparkEntry.queries("q51_tfidf")(spark, TestSpark.Sf).collect()
      SparkEntry.queries("q54_importance")(spark, TestSpark.Sf).collect()
      ()
    }
    assert(frames.nonEmpty)
    // The consuming action is done and the caches are still warm — the
    // service-shaped moment where releaseAll is supposed to run.
    assert(frames.forall(_.storageLevel != StorageLevel.NONE))
    assert(Materialize.releaseAll(spark) >= frames.size)
    assert(frames.forall(_.storageLevel == StorageLevel.NONE))
    assert(Materialize.liveCount(spark) == 0)
  }

  test("concurrent consume + racing releaseAll stays answer-preserving") {
    // The service scenario: several requests build and consume the same
    // pipeline query (CacheManager dedupes same-plan caches, so they
    // SHARE the materialized aggregate) while completions release. A
    // release racing another request's execution may force a recompute —
    // never a wrong answer (every registered frame is deterministic).
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val expected = SparkEntry.queries("q51_tfidf")(spark, TestSpark.Sf)
      .collect().map(_.toSeq).toSeq
    Materialize.releaseAll(spark)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val runs = (1 to 4).map { _ =>
        Future {
          val rows = SparkEntry.queries("q51_tfidf")(spark, TestSpark.Sf)
            .collect().map(_.toSeq).toSeq
          Materialize.releaseAll(spark) // completion hook, racing the others
          rows
        }
      }
      val all = Await.result(Future.sequence(runs), Duration("180s"))
      assert(all.forall(_ == expected))
    } finally pool.shutdown()
    Materialize.releaseAll(spark)
    assert(Materialize.liveCount(spark) == 0)
  }

  test("registry self-prunes entries whose cache was dropped out-of-band") {
    // A session using clearCache-style hygiene (or a direct unpersist)
    // drops the cache WITHOUT going through release — the registry must
    // not hold the stale Dataset reference forever (ADVICE r9). liveCount
    // and releaseAll prune storageLevel-NONE entries on entry.
    val before = Materialize.liveCount(spark)
    val (d, frames) = Materialize.collecting {
      Materialize.barrier(spark.range(0, 12347).toDF("prune_probe"))
    }
    assert(frames.size == 1)
    assert(Materialize.liveCount(spark) == before + 1)
    d.unpersist(blocking = true) // out-of-band: NOT Materialize.release
    assert(Materialize.liveCount(spark) == before,
      "stale registry entry survived an out-of-band cache drop")
    // releaseAll after the prune has nothing extra to release for it,
    // and re-registering the same plan tracks a fresh, releasable entry.
    val d2 = Materialize.barrier(spark.range(0, 12347).toDF("prune_probe"))
    assert(Materialize.liveCount(spark) == before + 1)
    assert(Materialize.releaseAll(spark) >= 1)
    assert(d2.storageLevel == StorageLevel.NONE)
    assert(Materialize.liveCount(spark) == 0)
  }

  test("release is recompute-safe: a released frame still answers") {
    val (df, frames) = Materialize.collecting {
      val d = SparkEntry.queries("q51_tfidf")(spark, TestSpark.Sf)
      d.collect()
      d
    }
    val expected = df.collect()
    Materialize.release(frames)
    // The cache is gone; the SAME DataFrame recomputes to the same rows
    // (every registered frame is deterministic by construction).
    assert(df.collect().sameElements(expected))
  }
}
