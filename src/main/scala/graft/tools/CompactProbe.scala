package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the r15 compaction claim: after N bucketed landings a
  * stratified sidecar holds ~N file-sets per bucket and the probe's
  * "two bucketed scans" open N× the files; `compactStratifiedIndex`
  * collapses the table to one file per bucket, answer-invisibly. Usage:
  *   runMain graft.tools.CompactProbe [sfDir] [landings] [reps]
  * Builds the sidecar in `landings` appends (corpus = doc_id % 50 != 0,
  * the SidecarProbe deployment split), probes the 2% increment `reps`
  * times, compacts (timed), re-probes, and equality-gates the answers
  * via count + checksum.
  */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-sf-big")
    val landings = if (args.length > 1) args(1).toInt else 8
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir", "/tmp/graft-compactprobe-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val inc = docs.filter(col("doc_id") % 50 === 0)
    val tbl = "graft_probe_compact"

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val out = body
      graft.ops.Materialize.releaseAll(spark)
      spark.catalog.clearCache()
      println(f"[compactprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      out
    }
    def files(suffix: String): Int = {
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val dir = new java.io.File(new java.net.URI(
        if (wh.contains(":")) wh else s"file://$wh").getPath,
        (tbl + suffix).toLowerCase)
      Option(dir.listFiles()).getOrElse(Array.empty)
        .count(_.getName.endsWith(".parquet"))
    }
    def probe(label: String): (Long, Long) = timed(label) {
      val r = graft.pipeline.MinHashDedup.incrementalContainmentPairs(
        spark, tbl, inc, "doc_id", "text", 0.6,
        graft.pipeline.MinHashDedup.StrataSpan)
        // bit_xor, not sum: ANSI mode (Spark 4 default) faults a LongType
        // sum overflow, and xxhash64 checksums overflow almost surely.
        .agg(count(lit(1)),
          expr("bit_xor(xxhash64(inc_id, corp_id, containment))"))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    timed(s"landing 1/$landings (initial write)") {
      graft.pipeline.CorpusWriter.writeStratifiedIndex(
        corpus.filter(col("doc_id") % landings === 0), "doc_id", "text", tbl)
    }
    (1 until landings).foreach { i =>
      timed(s"landing ${i + 1}/$landings (append)") {
        graft.pipeline.CorpusWriter.appendToStratifiedIndex(
          corpus.filter(col("doc_id") % landings === i), "doc_id", "text", tbl)
      }
    }
    println(s"[compactprobe] files before: _mem=${files("_mem")} " +
      s"_payload=${files("_payload")} _levels=${files("_levels")}")
    val before = (1 to reps).map(i => probe(s"probe pre-compact pass $i"))
    timed("compactStratifiedIndex") {
      graft.pipeline.CorpusWriter.compactStratifiedIndex(spark, tbl)
    }
    println(s"[compactprobe] files after: _mem=${files("_mem")} " +
      s"_payload=${files("_payload")} _levels=${files("_levels")}")
    val after = (1 to reps).map(i => probe(s"probe post-compact pass $i"))
    require(before.toSet.size == 1 && after.toSet.size == 1 &&
      before.head == after.head,
      s"ANSWER CHANGED: before=${before.head} after=${after.head}")
    println(s"[compactprobe] answers equal: count=${after.head._1} " +
      s"checksum=${after.head._2}")
    spark.stop()
  }
}
