package graft.tools

import org.apache.spark.sql.SparkSession

/** The VERDICT r16 #1 "done" probe: flat ADC/SQ8 retrieval cost must be
  * (near-)independent of |Q| now the whole query batch rides ONE codes
  * scan — the per-query unionAll it replaced paid |Q| scans. Usage:
  * `runMain graft.tools.BatchScaleProbe [sfDir]` (default the 16×
  * scaled embeddings corpus from tools/make_scaled_corpus.py); prints
  * steady-state seconds at |Q| ∈ {3, 30, 300}. */
object BatchScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft-sf-big"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir", "/tmp/graft-batchprobe-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
    val allIds = emb.select("vec_id").orderBy("vec_id")
      .limit(300).collect().map(_.getLong(0)).toSeq
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    for (qn <- Seq(3, 30, 300)) {
      val qids = allIds.take(qn)
      // Warm once, then min-of-2 steady passes (the bench discipline).
      def runSq8(): Unit = {
        val (_, f) = graft.ops.Materialize.collecting {
          graft.pipeline.ScalarQuant.sq8TopK(emb, "vec_id", "embedding",
            qids, dim = 64, topK = 10).write.format("noop")
            .mode("overwrite").save()
        }
        graft.ops.Materialize.release(f)
      }
      def runAdc(): Unit = {
        val (_, f) = graft.ops.Materialize.collecting {
          graft.pipeline.ProductQuant.adcTopK(emb, "vec_id", "embedding",
            qids, m = 8, k = 16, rounds = 2, dim = 64, topK = 10)
            .write.format("noop").mode("overwrite").save()
        }
        graft.ops.Materialize.release(f)
      }
      runSq8()
      val sq8 = Seq(time(runSq8()), time(runSq8())).min
      runAdc()
      val adc = Seq(time(runAdc()), time(runAdc())).min
      println(f"[batchprobe] |Q|=$qn%4d  sq8TopK=$sq8%.2f s  adcTopK=$adc%.2f s")
    }
    spark.stop()
  }
}
