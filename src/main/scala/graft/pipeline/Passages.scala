package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Passage-level boilerplate removal (the CCNet/RefinedWeb paragraph-dedup
  * shape): split every document into fixed-size token chunks, drop each
  * chunk that occurs in at least `maxDocs` distinct documents (headers,
  * footers, licence blocks — corpus-frequent passages), and rebuild the
  * documents from the surviving chunks in order.
  *
  * Scale shape: chunking is a map-side codegen'd `transform` + explode —
  * raw text is never shuffled whole. The frequency pass shuffles
  * `(chunk-hash, doc_id)` once; the over-threshold chunk set is USUALLY
  * small (boilerplate repeats, the long tail doesn't), so the removal
  * anti-join is broadcast-able — but "usually" is not "by construction":
  * on a real crawl with a low `maxDocs` the set includes every quote and
  * template shared by a handful of pages, and a forced `broadcast()` hint
  * there is a driver/executor OOM, not a plan choice. So NO static hint:
  * AQE broadcasts the anti-join when the built side is genuinely below
  * `spark.sql.autoBroadcastJoinThreshold` (PassagesSpec asserts it does
  * at fixture scale) and falls back to a shuffle join when it is not —
  * the same reasoning as [[DupClusters.canonicalize]]. Only the rebuild
  * groupBy shuffles the kept chunks back to their documents.
  */
object Passages {

  /** Chunks of `chunkTokens` lowercased whitespace tokens, space-joined;
    * the last chunk may be shorter. `(pos, chunk)` via posexplode keeps
    * the rebuild order without carrying the source text. Native
    * single-pass expression ([[graft.functions.WordGramsExpr]], chunked
    * mode); the replaced HOF formulation survives as [[hofChunkArray]]
    * for the WordGramsSpec equivalence gate. */
  private def chunkArray(text: Column, chunkTokens: Int): Column =
    graft.functions.GraftFunctions.tokenChunks(text, chunkTokens)

  private[graft] def hofChunkArray(text: Column, chunkTokens: Int): Column = {
    val t = regexp_extract_all(lower(text), lit("\\S+"), lit(0))
    val nChunks = floor((size(t) + (chunkTokens - 1)) / chunkTokens).cast("int")
    when(size(t) > 0,
      transform(sequence(lit(1), nChunks),
        i => array_join(slice(t, (i - lit(1)) * chunkTokens + lit(1), lit(chunkTokens)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** (doc_id, clean_text, n_kept): every document that retains at least
    * one chunk after corpus-frequent chunks (in ≥ `maxDocs` docs) drop. */
  def dedupPassages(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, maxDocs: Int): DataFrame = {
    require(chunkTokens > 0 && maxDocs > 1,
      s"need chunkTokens > 0 and maxDocs > 1: $chunkTokens, $maxDocs")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val chunks = docs.select(col(idCol).as("doc_id"),
        posexplode_outer(chunkArray(col(textCol), chunkTokens)).as(Seq("pos", "chunk")))
      .filter(col("chunk").isNotNull)
    // maxDocs == 2 gate collapse (the RepeatedSpans idiom): "≥ 2
    // distinct docs" ⟺ min(doc_id) ≠ max(doc_id) — one
    // partial-aggregated exchange instead of countDistinct's two-phase
    // distinct expansion (guide §2.3).
    val boilerplate =
      if (maxDocs == 2)
        chunks.groupBy("chunk")
          .agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
          .filter(col("mn") =!= col("mx"))
          .select("chunk")
      else chunks.groupBy("chunk")
        .agg(countDistinct("doc_id").as("nd"))
        .filter(col("nd") >= maxDocs)
        .select("chunk")
    chunks.join(boilerplate, Seq("chunk"), "left_anti")
      .groupBy("doc_id")
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("chunk")))),
          x => x.getField("chunk")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[dedupPassages]] over table `documents`. */
  def oracleSql(chunkTokens: Int, maxDocs: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t FROM documents),
       |chunks AS (
       |  SELECT doc_id, i AS pos,
       |    array_to_string(t[(i-1)*$chunkTokens+1:i*$chunkTokens], ' ') AS chunk
       |  FROM toks, LATERAL unnest(range(1, ((len(t) + ${chunkTokens - 1}) // $chunkTokens) + 1)) AS r(i)
       |  WHERE len(t) > 0),
       |freq AS (SELECT chunk, count(DISTINCT doc_id) AS nd FROM chunks GROUP BY chunk)
       |SELECT doc_id, string_agg(chunk, ' ' ORDER BY pos) AS clean_text,
       |       count(*) AS n_kept
       |FROM chunks JOIN freq USING (chunk)
       |WHERE nd < $maxDocs
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
