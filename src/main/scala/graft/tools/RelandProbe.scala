package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the r19 partial re-land claim: when staleness is LOCALIZED
  * (a takedown wave or growth burst hitting a few cells),
  * `relandStaleIvfCells` rewrites only those cells' directories, while
  * the alternative — a full `writeIvfIndex` — retrains and rewrites
  * everything. Usage:
  *   runMain graft.tools.RelandProbe [sfDir] [k]
  * Builds an IVF index on the embeddings, deletes half the members of
  * the two most-populated cells (a localized takedown), then times the
  * staleness meter, the partial re-land, and the full rebuild, gating
  * partial ≡ rebuild-under-the-same-centroids on the member rows.
  */
object RelandProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-sf-big")
    val k = if (args.length > 1) args(1).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir", "/tmp/graft-relandprobe-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.CorpusWriter

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val out = body
      graft.ops.Materialize.releaseAll(spark)
      spark.catalog.clearCache()
      println(f"[relandprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      out
    }

    val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
    val n = emb.count()
    val tbl = "graft_probe_reland"
    Seq(tbl, s"${tbl}_cent", s"${tbl}_meta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    timed(s"initial writeIvfIndex (n=$n, k=$k)") {
      CorpusWriter.writeIvfIndex(emb, "vec_id", "embedding", tbl,
        k = k, rounds = 2)
    }
    // Localized takedown: half the members of the two biggest cells.
    val byCell = spark.table(tbl).groupBy("cell").count()
      .orderBy(desc("count"), asc("cell")).limit(2)
      .collect().map(_.getLong(0)).toSeq
    val doomed = spark.table(tbl)
      .filter(col("cell").isin(byCell: _*) && col("vec_id") % 2 === 0)
      .select("vec_id")
    val doomedIds = doomed.collect().map(_.getLong(0)).toSet
    println(s"[relandprobe] takedown: ${doomedIds.size} vectors in " +
      s"cells ${byCell.mkString(",")} of $k")
    val current = emb.filter(!col("vec_id").isin(doomedIds.toSeq: _*))

    timed("ivfCellStaleness meter") {
      CorpusWriter.ivfCellStaleness(spark, tbl, current,
        "vec_id", "embedding").collect()
    }
    val relanded = timed("relandStaleIvfCells (partial)") {
      CorpusWriter.relandStaleIvfCells(spark, tbl, current,
        "vec_id", "embedding", bar = 0.0)
    }
    println(s"[relandprobe] relanded cells: ${relanded.sorted.mkString(",")}")

    val full = s"${tbl}_full"
    Seq(full, s"${full}_cent", s"${full}_meta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    timed("full writeIvfIndex rebuild (retrain)") {
      CorpusWriter.writeIvfIndex(current, "vec_id", "embedding", full,
        k = k, rounds = 2)
    }
    // Gate: the partial re-land's members equal the retirement path's
    // (same frozen centroids — the full rebuild retrains, so its cell
    // ASSIGNMENT may differ; compare against retire-on-the-same-index).
    val ref = s"${tbl}_ref"
    Seq(ref, s"${ref}_cent", s"${ref}_meta")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    CorpusWriter.writeIvfIndex(emb, "vec_id", "embedding", ref,
      k = k, rounds = 2)
    import spark.implicits._
    CorpusWriter.retireFromIvfIndex(spark, ref,
      doomedIds.toSeq.toDF("vec_id"), "vec_id")
    val a = spark.table(tbl).select("vec_id", "cell").collect()
      .map(_.toSeq).toSet
    val b = spark.table(ref).select("vec_id", "cell").collect()
      .map(_.toSeq).toSet
    println(s"[relandprobe] partial ≡ retire-on-same-index members: ${a == b}")
    spark.stop()
  }
}
