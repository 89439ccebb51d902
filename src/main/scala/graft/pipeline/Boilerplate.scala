package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Materialize

/** Per-source template detection — the CCNet/RefinedWeb site-level
  * boilerplate pass: a chunk that repeats across many documents OF THE
  * SAME SOURCE is a header, footer, nav block, or licence stub of that
  * site's template, even when it is globally rare. Differs from
  * [[Passages]] (q43) on all three axes that matter operationally:
  * frequency is counted WITHIN source (a 30-doc blog's template never
  * clears a corpus-wide absolute bar), the threshold is RELATIVE
  * (`pct`% of the source's documents, so it scales from 10-doc sources
  * to 10M-doc crawls) with an absolute floor (`minDocs`, so 2-doc
  * sources don't flag everything they share), and the output is the
  * REPORT policies consume (per-doc template fraction → drop/scrub
  * decisions), not a rewritten corpus.
  *
  * Scale shape: chunking + md5 fingerprinting are map-side codegen'd
  * scan work — raw text never shuffles, only (doc_id, source, fp) slim
  * rows. That frame is MATERIALIZED (the [[TfIdf.topTerms]] convention)
  * because the within-source frequency pass and the per-doc rollup both
  * consume it. The per-source doc totals are a sources-sized rollup
  * (broadcast); the frequency join is (source, fp)-keyed with no static
  * hint (template sets are usually small, but "usually" is not "by
  * construction" — the [[Passages]] OOM reasoning; AQE decides). The
  * threshold compare is pure integer arithmetic — no float enters until
  * the one reported fraction.
  */
object Boilerplate {

  /** (doc_id, source, n_segments, boiler_segments, boiler_frac) for
    * every document with ≥ 1 token: segments are `chunkTokens`-token
    * chunks ([[graft.functions.WordGramsExpr]] chunked mode, short tail
    * kept); a segment is template iff its within-source distinct-doc
    * count is ≥ `minDocs` AND ≥ `pct`% of the source's documents. */
  def sourceTemplateReport(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, chunkTokens: Int, minDocs: Int, pct: Int): DataFrame = {
    require(chunkTokens > 0 && minDocs > 1 && pct >= 0 && pct <= 100,
      s"need chunkTokens > 0, minDocs > 1, pct in [0,100]: " +
        s"$chunkTokens, $minDocs, $pct")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val seg = Materialize.barrier(docs.select(
        col(idCol).cast("long").as("doc_id"), col(srcCol).as("source"),
        explode_outer(graft.functions.GraftFunctions.tokenChunks(col(textCol),
          chunkTokens)).as("chunk"))
      .filter(col("chunk").isNotNull)
      .select(col("doc_id"), col("source"), md5(col("chunk")).as("fp")))
    val srcDocs = docs.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("src_docs"))
    val segDf = seg.select("source", "fp", "doc_id").distinct()
      .groupBy("source", "fp").agg(count(lit(1)).as("seg_df"))
    seg.join(segDf, Seq("source", "fp"))
      .join(broadcast(srcDocs), "source")
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_segments"),
        sum(when(col("seg_df") >= minDocs &&
            col("seg_df") * 100L >= lit(pct.toLong) * col("src_docs"),
          1L).otherwise(0L)).as("boiler_segments"))
      .select(col("doc_id"), col("source"), col("n_segments"),
        col("boiler_segments"),
        (col("boiler_segments").cast("double") /
          col("n_segments").cast("double")).as("boiler_frac"))
      .orderBy("doc_id")
  }

  /** The REWRITE the report's drop/scrub decision feeds (the [[
    * RepeatedSpans.scrub]] convention at source-template grain):
    * every document with ≥ 1 token comes back with its template
    * chunks removed — `scrub_text` is the surviving chunks rejoined in
    * document order (normalized text, like every chunk-grain rewrite),
    * beside the report counts, and a fully-templated document survives
    * with empty text rather than vanishing (policies decide drops, the
    * scrub never does).
    *
    * Same scale shape as the report — the only additions are the
    * chunk's position (riding the existing slim rows) and a doc-sized
    * ordered rebuild inside the final per-doc rollup; raw text still
    * never shuffles, only chunks that survive into the rebuild. */
  def scrubTemplates(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, chunkTokens: Int, minDocs: Int, pct: Int): DataFrame = {
    require(chunkTokens > 0 && minDocs > 1 && pct >= 0 && pct <= 100,
      s"need chunkTokens > 0, minDocs > 1, pct in [0,100]: " +
        s"$chunkTokens, $minDocs, $pct")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val seg = Materialize.barrier(docs.select(
        col(idCol).cast("long").as("doc_id"), col(srcCol).as("source"),
        posexplode_outer(graft.functions.GraftFunctions.tokenChunks(col(textCol),
          chunkTokens)).as(Seq("pos", "chunk")))
      .filter(col("chunk").isNotNull)
      .select(col("doc_id"), col("source"), col("pos"), col("chunk"),
        md5(col("chunk")).as("fp")))
    val srcDocs = docs.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("src_docs"))
    val segDf = seg.select("source", "fp", "doc_id").distinct()
      .groupBy("source", "fp").agg(count(lit(1)).as("seg_df"))
    seg.join(segDf, Seq("source", "fp"))
      .join(broadcast(srcDocs), "source")
      .withColumn("tpl", col("seg_df") >= minDocs &&
        col("seg_df") * 100L >= lit(pct.toLong) * col("src_docs"))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_segments"),
        sum(when(col("tpl"), 1L).otherwise(0L)).as("boiler_segments"),
        array_join(expr(
          "transform(array_sort(collect_list(CASE WHEN NOT tpl THEN " +
            "struct(pos, chunk) END)), s -> s.chunk)"), " ")
          .as("scrub_text"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[scrubTemplates]] over table `documents`. */
  def scrubOracleSql(chunkTokens: Int, minDocs: Int, pct: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, source, regexp_extract_all(lower(text), '\\S+') AS t
       |  FROM documents),
       |seg AS (
       |  SELECT doc_id, source, i,
       |    array_to_string(t[(i-1)*$chunkTokens+1:i*$chunkTokens], ' ') AS chunk,
       |    md5(array_to_string(t[(i-1)*$chunkTokens+1:i*$chunkTokens], ' ')) AS fp
       |  FROM toks, LATERAL unnest(range(1, ((len(t) + ${chunkTokens - 1}) // $chunkTokens) + 1)) AS r(i)
       |  WHERE len(t) > 0),
       |src_docs AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS src_docs
       |  FROM documents GROUP BY source),
       |seg_df AS (
       |  SELECT source, fp, CAST(count(DISTINCT doc_id) AS BIGINT) AS seg_df
       |  FROM seg GROUP BY source, fp),
       |j AS (
       |  SELECT seg.doc_id, seg.source, seg.i, seg.chunk,
       |    (seg_df >= $minDocs AND seg_df * 100 >= $pct * src_docs) AS tpl
       |  FROM seg JOIN seg_df USING (source, fp) JOIN src_docs USING (source))
       |SELECT doc_id, source,
       |       CAST(count(*) AS BIGINT) AS n_segments,
       |       CAST(sum(CASE WHEN tpl THEN 1 ELSE 0 END) AS BIGINT) AS boiler_segments,
       |       coalesce(string_agg(CASE WHEN NOT tpl THEN chunk END, ' ' ORDER BY i), '') AS scrub_text
       |FROM j GROUP BY doc_id, source ORDER BY doc_id""".stripMargin

  /** DuckDB oracle for [[sourceTemplateReport]] over table `documents`. */
  def oracleSql(chunkTokens: Int, minDocs: Int, pct: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, source, regexp_extract_all(lower(text), '\\S+') AS t
       |  FROM documents),
       |seg AS (
       |  SELECT doc_id, source,
       |    md5(array_to_string(t[(i-1)*$chunkTokens+1:i*$chunkTokens], ' ')) AS fp
       |  FROM toks, LATERAL unnest(range(1, ((len(t) + ${chunkTokens - 1}) // $chunkTokens) + 1)) AS r(i)
       |  WHERE len(t) > 0),
       |src_docs AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS src_docs
       |  FROM documents GROUP BY source),
       |seg_df AS (
       |  SELECT source, fp, CAST(count(DISTINCT doc_id) AS BIGINT) AS seg_df
       |  FROM seg GROUP BY source, fp)
       |SELECT doc_id, source,
       |       CAST(count(*) AS BIGINT) AS n_segments,
       |       CAST(sum(CASE WHEN seg_df >= $minDocs
       |                      AND seg_df * 100 >= $pct * src_docs
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS boiler_segments,
       |       CAST(CAST(sum(CASE WHEN seg_df >= $minDocs
       |                           AND seg_df * 100 >= $pct * src_docs
       |                          THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
       |         / CAST(count(*) AS DOUBLE) AS boiler_frac
       |FROM seg JOIN seg_df USING (source, fp) JOIN src_docs USING (source)
       |GROUP BY doc_id, source ORDER BY doc_id""".stripMargin
}
