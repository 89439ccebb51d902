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
}
