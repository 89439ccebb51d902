package graft.tools

import org.apache.spark.sql.SparkSession

/** 64× scale probe for the sampled dedup-calibration grain:
  * `runMain graft.tools.CalProbe [sfDir] [sampleRate] [reps]`. */
object CalProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft-sf-big"
    val rate = if (args.length > 1) args(1).toDouble else 0.05
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val rows = graft.pipeline.DedupEval
        .simhashCalibration(docs, "doc_id", "text", 0.3, sampleRate = rate)
        .collect()
      println(f"[calprobe] rate=$rate pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
        s"bands=${rows.length}, pairs=${rows.map(_.getLong(1)).sum}")
      graft.ops.Materialize.releaseAll(spark)
    }
    spark.stop()
  }
}
