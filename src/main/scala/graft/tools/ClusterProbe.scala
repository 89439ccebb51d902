package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Measures the r15 incremental-cluster-maintenance claim: folding a
  * landing's pairs into the STORED cluster sidecar
  * ([[graft.pipeline.DupClusters.incrementalClusters]] via
  * [[graft.pipeline.CorpusWriter.updateClusters]]) vs re-running
  * connected components over the full pair set — the ~13.8 s dominant
  * 64× term five SCALING rows shared. Usage:
  *   runMain graft.tools.ClusterProbe [sfDir] [mod] [reps]
  * increment pairs = any edge touching doc_id % mod == 0.
  *
  * Pair GENERATION is deliberately outside both timings (the full pair
  * set is materialized to parquet untimed and both paths read it): any
  * landing must generate its increment's pairs, so the comparison
  * isolates exactly the cluster-maintenance step the two designs differ
  * on. The probe also asserts bit-equality of the two assignments
  * before reporting — a fast wrong answer is not a result.
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-sf-big")
    val mod = if (args.length > 1) args(1).toInt else 5
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir", "/tmp/graft-clusterprobe-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      graft.ops.Materialize.releaseAll(spark)
      spark.catalog.clearCache()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[clusterprobe] $label: $t%.3f s")
      t
    }
    // Untimed: materialize the full pair set once; both paths read it.
    val pairsPath = s"/tmp/graft-clusterprobe-pairs-${sfDir.hashCode.toHexString}"
    if (!new java.io.File(s"$pairsPath/_SUCCESS").exists()) {
      val docs = graft.core.Tables.load(spark, sfDir, "documents")
      graft.pipeline.MinHashDedup.nearDupPairs(docs, "doc_id", "text", 0.5)
        .write.mode("overwrite").parquet(pairsPath)
      graft.ops.Materialize.releaseAll(spark)
      spark.catalog.clearCache()
    }
    val pairs = spark.read.parquet(pairsPath)
    val inc = col("doc_a") % mod === 0 || col("doc_b") % mod === 0
    println(s"[clusterprobe] pairs=${pairs.count()} " +
      s"increment=${pairs.filter(inc).count()} (mod=$mod)")
    val tbl = s"graft_probe_clusters_$mod"
    // One-time landing of the standing corpus's clusters. Bucket count
    // sized to the fixture (the q67 registration's knob: 256 buckets
    // over a 315k-row table is file-open overhead, not layout).
    timed("sidecar WRITE (one-time corpus landing: CC over corpus pairs)") {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}_meta")
      graft.pipeline.CorpusWriter.writeClusters(
        graft.pipeline.DupClusters.connectedComponents(
          pairs.filter(!inc), "doc_a", "doc_b"), tbl, buckets = 32)
    }
    (1 to reps).foreach { i =>
      timed(s"FULL CC over all pairs, pass $i") {
        graft.pipeline.DupClusters.connectedComponents(pairs, "doc_a", "doc_b")
          .write.format("noop").mode("overwrite").save()
      }
    }
    // Compute-only: the incremental assignment to a noop sink — what a
    // consumer pays to READ fresh cluster state at a landing, without
    // persisting it back.
    (1 to reps).foreach { i =>
      timed(s"INCREMENTAL compute only (noop sink), pass $i") {
        graft.pipeline.DupClusters.incrementalClusters(spark.table(tbl),
            pairs.filter(inc), "doc_a", "doc_b")
          .write.format("noop").mode("overwrite").save()
      }
    }
    // Pass 1 is the meaningful landing (later passes fold already-merged
    // edges — contracted self-loops — and converge instantly).
    (1 to reps).foreach { i =>
      timed(s"INCREMENTAL landing (updateClusters incl. sidecar rewrite), pass $i") {
        graft.pipeline.CorpusWriter.updateClusters(spark, tbl,
          pairs.filter(inc), "doc_a", "doc_b")
      }
    }
    // Equality gate: the landed table must be bit-equal to full CC.
    val full = graft.pipeline.DupClusters
      .connectedComponents(pairs, "doc_a", "doc_b")
    val stored = spark.table(tbl).select(col("id"), col("cluster"))
    val diff = full.exceptAll(stored).count() + stored.exceptAll(full).count()
    println(s"[clusterprobe] equality diff rows: $diff " +
      (if (diff == 0L) "(bit-equal)" else "(MISMATCH!)"))
    spark.stop()
    if (diff != 0L) sys.exit(1)
  }
}
