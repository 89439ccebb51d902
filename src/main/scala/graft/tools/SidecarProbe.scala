package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Measures the q67 steady-state claim: admission against the STORED
  * stratified sidecar vs the q65 text form that re-shingles the corpus
  * per admission, across increment sizes. Usage:
  *   runMain graft.tools.SidecarProbe [sfDir] [mods] [reps]
  * where `mods` is a comma list of moduli — increment = doc_id % m == 0,
  * corpus = the rest — so larger m means a smaller increment against the
  * same-sized corpus, the deployment direction (a drip of arriving data
  * against a standing 100 TB corpus). The eliminated term (corpus
  * shingle + emission) is constant per admission in the text form;
  * stored-form recurring cost should fall toward the bucketed-scan floor
  * as the increment shrinks.
  */
object SidecarProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-sf-big")
    val mods = if (args.length > 1) args(1).split(",").toSeq.map(_.toInt)
      else Seq(5, 50)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir", "/tmp/graft-sidecarprobe-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    def timed(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      graft.ops.Materialize.releaseAll(spark)
      spark.catalog.clearCache()
      println(f"[sidecarprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    mods.foreach { m =>
      val corpus = docs.filter(col("doc_id") % m =!= 0)
      val inc = docs.filter(col("doc_id") % m === 0)
      println(s"[sidecarprobe] mod=$m corpus=${corpus.count()} inc=${inc.count()}")
      val tbl = s"graft_probe_sidecar_$m"
      timed(s"mod=$m sidecar WRITE (one-time landing)") {
        graft.pipeline.CorpusWriter.writeStratifiedIndex(
          corpus, "doc_id", "text", tbl)
      }
      (1 to reps).foreach { i =>
        timed(s"mod=$m TEXT form pass $i") {
          graft.pipeline.MinHashDedup.incrementalContainmentPairs(
            corpus, inc, "doc_id", "text", 0.6)
            .write.format("noop").mode("overwrite").save()
        }
        timed(s"mod=$m STORED form pass $i") {
          graft.pipeline.MinHashDedup.incrementalContainmentPairs(
            spark, tbl, inc, "doc_id", "text", 0.6,
            graft.pipeline.MinHashDedup.StrataSpan)
            .write.format("noop").mode("overwrite").save()
        }
      }
    }
    spark.stop()
  }
}
