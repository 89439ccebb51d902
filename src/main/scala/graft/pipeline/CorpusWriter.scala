package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Pipeline sink: write a deduplicated corpus as parquet partitioned by a
  * grouping column — the standard layout for a training-data shard store
  * (partition pruning on read; one directory per language/source).
  *
  * Dedup keeps the lowest-id document per exact text (hash-groupBy — one
  * shuffle on the text hash, no sort). At 100 TB, partitionBy on a
  * low-cardinality column like `lang` keeps file counts sane; pair with
  * `maxRecordsPerFile` to bound shard size.
  */
object CorpusWriter {

  /** Exact-dedup: keep the minimum-id row per distinct `textCol`. */
  def dedupExact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keepers = docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    docs.join(keepers, Seq(idCol), "left_semi")
  }

  def writeDeduped(docs: DataFrame, idCol: String, textCol: String,
      partitionCol: String, path: String, maxRecordsPerFile: Long = 1000000L): Unit =
    dedupExact(docs, idCol, textCol)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(path)

  /** Store the corpus's admission sidecar ([[IncrementalDedup.index]]:
    * ~140 bytes/doc of fp + minhash signature) as a table BUCKETED by
    * fingerprint — written once when the corpus lands, so per-increment
    * admission ([[IncrementalDedup.admissions]]) never recomputes
    * signatures from corpus text, and the sidecar-wide distinct-fp
    * aggregate (the one corpus-scale step of the exact check) runs with
    * NO exchange: the bucketed scan already delivers fp-hash
    * partitioning (IncrementalDedupSpec pins the exchange-free plan). */
  def writeAdmissionIndex(corpus: DataFrame, idCol: String, textCol: String,
      table: String, buckets: Int = 256): Unit =
    IncrementalDedup.index(corpus, idCol, textCol)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "fp")
      .sortBy("fp")
      .format("parquet")
      .saveAsTable(table)
}
