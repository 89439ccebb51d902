package graft.tools

import org.apache.spark.sql.SparkSession

/** Clustering scale probe: `runMain graft.tools.KmeansProbe [sfDir] [k]
  * [rounds] [reps] [dedup]` times [[graft.pipeline.Clustering.kmeans]]
  * (or `semanticDedup` when `dedup=true`) at an arbitrary cluster count —
  * the knob the registered q48/q49 fixtures pin at k=8. Used by
  * SCALING.md's k=64 / 16×-corpus rows; prints the formatted plan first
  * so the single `argmax_dot` assignment node is visible (vs the k-wide
  * expression tree it replaced).
  */
object KmeansProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 8
    val rounds = if (args.length > 2) args(2).toInt else 3
    val reps = if (args.length > 3) args(3).toInt else 3
    val dedup = args.length > 4 && args(4).toBoolean
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
      else
        graft.pipeline.Clustering.kmeans(emb, "vec_id", "embedding", k, rounds)
    }
    query().explain("formatted")
    val what = if (dedup) "semantic_dedup" else "kmeans"
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      query().write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      println(f"[kmeansprobe] $what k=$k rounds=$rounds pass $i: " +
        f"${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
