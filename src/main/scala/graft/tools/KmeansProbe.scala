package graft.tools

import org.apache.spark.sql.SparkSession

/** Clustering scale probe: `runMain graft.tools.KmeansProbe [sfDir] [k]
  * [rounds] [reps] [mode] [sampleFrac]` times
  * [[graft.pipeline.Clustering.kmeans]] (mode `kmeans`; `true`/`dedup`
  * = `semanticDedup`, `pq` = [[graft.pipeline.ProductQuant.encode]])
  * at an arbitrary cluster count — the knob the registered q48/q49
  * fixtures pin at k=8. `sampleFrac < 1` routes through the
  * sample-trained codebook paths (r15: `kmeansSampled` /
  * `encodeSampled`). Used by SCALING.md's k=64 / 16×-corpus rows;
  * prints the formatted plan first so the single `argmax_dot`
  * assignment node is visible (vs the k-wide expression tree it
  * replaced).
  */
object KmeansProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 8
    val rounds = if (args.length > 2) args(2).toInt else 3
    val reps = if (args.length > 3) args(3).toInt else 3
    val mode = if (args.length > 4) args(4) else "kmeans"
    val dedup = mode == "true" || mode == "dedup"
    val sampleFrac = if (args.length > 5) args(5).toDouble else 1.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def query() = {
      val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
      if (dedup)
        graft.pipeline.Clustering.semanticDedup(emb, "vec_id", "embedding",
          k, rounds, minCos = 0.9)
      else if (mode == "pq" && sampleFrac < 1.0)
        graft.pipeline.ProductQuant.encodeSampled(emb, "vec_id", "embedding",
          m = 8, k = k, rounds = rounds, dim = 64, sampleFrac = sampleFrac)
      else if (mode == "pq")
        graft.pipeline.ProductQuant.encode(emb, "vec_id", "embedding",
          m = 8, k = k, rounds = rounds, dim = 64)
      else if (sampleFrac < 1.0)
        graft.pipeline.Clustering.kmeansSampled(emb, "vec_id", "embedding",
          k, rounds, sampleFrac)
      else
        graft.pipeline.Clustering.kmeans(emb, "vec_id", "embedding", k, rounds)
    }
    query().explain("formatted")
    val what = if (dedup) "semantic_dedup" else mode
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      query().write.format("noop").mode("overwrite").save()
      graft.ops.Materialize.releaseAll(spark)
      spark.catalog.clearCache()
      println(f"[kmeansprobe] $what k=$k rounds=$rounds frac=$sampleFrac pass $i: " +
        f"${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
