package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.oracle.Duck

/** Incremental corpus admission — dedup a NEW increment against an
  * EXISTING canonical corpus without re-pairing the corpus against
  * itself: the batch complement of [[graft.streaming.StreamDedup]] (its
  * scaladoc's "front the stream with the batch canonical corpus and
  * dedup only the increment" production shape). A continuous crawl
  * pipeline runs this per ingest batch; re-running whole-corpus dedup
  * (q22/q37/q40) per increment would re-shuffle 100 TB to admit a few
  * GB.
  *
  * Per increment document the decision is:
  *  - `exact_dup`  — its content fingerprint already exists in the
  *    corpus [[index]], or an increment sibling with a LOWER doc id has
  *    the same fingerprint (the [[graft.streaming.StreamDedup.batch]]
  *    min-id rule applied within the increment);
  *  - `near_dup`   — some LSH-banded candidate partner (any corpus doc,
  *    or an increment sibling with a lower id — the [[Clustering
  *    .semanticDedup]] greedy-by-id convention: deterministic and
  *    order-free, a rejected lower sibling still blocks) agrees on a
  *    band and estimates Jaccard ≥ `minSim` from the minhash
  *    signatures (same banding, same estimator as [[MinHashDedup]] —
  *    one blocking family for the whole dedup surface);
  *  - `admitted`   — neither.
  *
  * Scale shape: the corpus contributes ONLY through its [[index]]
  * sidecar — 8-byte fingerprint + 16-long signature per doc, ~140
  * bytes/doc (≈ 1.4 TB per 10¹⁰ docs), stored once when the corpus is
  * written and NEVER recomputed from text (the registered query builds
  * it inline because the fixture is small; production reads the stored
  * table, bucketed by fingerprint / band key à la [[CorpusWriter]] so
  * the admission joins co-locate without reshuffling the sidecar per
  * increment). The increment is the small side by definition: its
  * materialized (fp, sig) frame feeds the exact check, the band join
  * and the output (three consumers — the [[graft.ops.Materialize]]
  * convention), and AQE broadcasts it against the corpus-sized index
  * scans. Candidate pairs are banded, never all-pairs, and pair volume
  * is bounded by increment-side matches (≤ Bands× overproduction before
  * the distinct, increment-sized, not corpus-sized).
  */
object IncrementalDedup {

  /** The stored admission sidecar of a canonical corpus: `(doc_id, fp,
    * sig)` — sig is null for docs shorter than one shingle (they
    * participate in exact dedup only, the [[MinHashDedup.shingled]]
    * length rule). */
  def index(corpus: DataFrame, idCol: String, textCol: String): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    corpus.select(col(idCol).cast("long").as("doc_id"),
      GraftFunctions.rollingHash(col(textCol)).as("fp"),
      when(length(col(textCol)) >= MinHashDedup.ShingleK,
        GraftFunctions.minhashSig(col(textCol))).as("sig"))
  }

  /** Admission decisions for every increment document: `(doc_id,
    * exact_dup, near_dup, admitted)`, doc_id ascending. `idx` is the
    * corpus [[index]] (or any frame with its schema). */
  def admissions(idx: DataFrame, increment: DataFrame, idCol: String,
      textCol: String, minSim: Double): DataFrame = {
    require(minSim > 0.0 && minSim <= 1.0, s"minSim out of (0,1]: $minSim")
    val spark = increment.sparkSession
    GraftFunctions.register(spark)
    // The increment's own sidecar rows: three consumers (exact check,
    // band join, output spine) — materialized once, increment-sized.
    val inc = graft.ops.Materialize.barrier(
      index(increment, idCol, textCol))

    // Exact: fingerprint seen in the corpus, or held by a lower-id
    // increment sibling. The corpus side reduces to a distinct-fp set
    // BEFORE the join (fp-keyed aggregate over the sidecar scan).
    val corpusFp = idx.select("fp").distinct()
    val seenInCorpus = inc.join(corpusFp, Seq("fp"), "left_semi")
      .select(col("doc_id")).withColumn("in_corpus", lit(true))
    val firstInInc = inc.groupBy("fp").agg(min("doc_id").as("first_id"))

    // Near: band the increment (small) against corpus ∪ lower-id
    // siblings; same band slicing as MinHashDedup's self-join mirror.
    val bandCol = explode_outer(expr(
      s"transform(sequence(0, ${MinHashDedup.Bands - 1}), " +
        s"b -> struct(b AS band, slice(sig, b * ${MinHashDedup.RowsPerBand} + 1, " +
        s"${MinHashDedup.RowsPerBand}) AS bkey))")).as("bd")
    // array_compact normalizes element nullability: a sidecar read back
    // from parquet types sig as array<bigint> (nullable elements), which
    // the native signature comparators reject — compact is a no-op on
    // the data (signatures never hold nulls) that restores the
    // non-null-element type either way.
    val incBands = inc.filter(col("sig").isNotNull)
      .select(col("doc_id"), array_compact(col("sig")).as("sig"))
      .select(col("doc_id"), col("sig"), bandCol)
      .filter(col("bd").isNotNull)
      .select(col("doc_id"), col("sig"), col("bd.band").as("band"), col("bd.bkey").as("bkey"))
    val partnerBands = idx.select(col("doc_id").as("p_id"), col("sig"), lit(true).as("is_corpus"))
      .unionAll(inc.select(col("doc_id").as("p_id"), col("sig"), lit(false).as("is_corpus")))
      .filter(col("sig").isNotNull)
      .select(col("p_id"), array_compact(col("sig")).as("sig"), col("is_corpus"))
      .select(col("p_id"), col("sig"), col("is_corpus"), bandCol)
      .filter(col("bd").isNotNull)
      .select(col("p_id"), col("sig").as("p_sig"), col("is_corpus"),
        col("bd.band").as("band"), col("bd.bkey").as("bkey"))
    val nearHit = incBands.join(partnerBands,
        incBands("band") === partnerBands("band") &&
          incBands("bkey") === partnerBands("bkey") &&
          (col("is_corpus") || col("p_id") < col("doc_id")))
      .filter(expr(
        s"sig_agree_count(sig, p_sig) / CAST(${MinHashDedup.NumHashes} AS DOUBLE)") >= minSim)
      .select("doc_id").distinct()
      .withColumn("near", lit(true))

    inc.select(col("doc_id"), col("fp"))
      .join(firstInInc, "fp")
      .join(seenInCorpus, Seq("doc_id"), "left")
      .join(nearHit, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("in_corpus"), lit(false)) ||
          col("doc_id") > col("first_id")).as("exact_dup"),
        coalesce(col("near"), lit(false)).as("near_dup"))
      .withColumn("admitted", !col("exact_dup") && !col("near_dup"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[admissions]] over table `documents`, increment
    * = rows where `incPredSql` holds, corpus = the rest. Reuses
    * [[MinHashDedup.ctePrefixSql]]'s shingle/signature/band CTEs (the
    * shared banding derivation) and re-renders the same partner rule. */
  def oracleSql(incPredSql: String, minSim: Double): String =
    s"""${MinHashDedup.ctePrefixSql},
       |${admissionCtesSql(
           s"SELECT doc_id, ${Duck.rollingHashSql("text")} AS fp, " +
             s"($incPredSql) AS is_inc FROM documents", minSim)}
       |SELECT i.doc_id,
       |  i.doc_id IN (SELECT doc_id FROM ex) AS exact_dup,
       |  i.doc_id IN (SELECT doc_id FROM near) AS near_dup,
       |  NOT (i.doc_id IN (SELECT doc_id FROM ex)
       |    OR i.doc_id IN (SELECT doc_id FROM near)) AS admitted
       |FROM fp i WHERE i.is_inc ORDER BY i.doc_id""".stripMargin

  /** The admission CTE block (fp → banded candidates → near → exact),
    * parameterized on the `(doc_id, fp, is_inc)` source select so
    * [[SnapshotLanding]] can run it over a composed relation. Assumes
    * the [[MinHashDedup.ctePrefixSql]] CTEs (`bands`, `sig`) precede it;
    * exposes CTEs `fp`, `near`, `ex` to the caller's final select. */
  private[pipeline] def admissionCtesSql(fpSelect: String,
      minSim: Double): String =
    s"""fp AS ($fpSelect),
       |icand AS (
       |  SELECT DISTINCT l.doc_id AS i, r.doc_id AS p
       |  FROM bands l JOIN bands r ON l.b = r.b AND l.bkey = r.bkey
       |    AND l.doc_id != r.doc_id
       |  JOIN fp fi ON fi.doc_id = l.doc_id
       |  JOIN fp fr ON fr.doc_id = r.doc_id
       |  WHERE fi.is_inc AND ((NOT fr.is_inc) OR r.doc_id < l.doc_id)),
       |near AS (
       |  SELECT DISTINCT c.i AS doc_id FROM icand c
       |  JOIN sig sa ON sa.doc_id = c.i
       |  JOIN sig sb ON sb.doc_id = c.p
       |  WHERE len(list_filter(range(1, ${MinHashDedup.NumHashes + 1}),
       |    j -> sa.sig[j] = sb.sig[j])) / CAST(${MinHashDedup.NumHashes} AS DOUBLE)
       |    >= $minSim),
       |ex AS (
       |  SELECT i.doc_id FROM fp i WHERE i.is_inc AND (
       |    EXISTS (SELECT 1 FROM fp c WHERE NOT c.is_inc AND c.fp = i.fp)
       |    OR EXISTS (SELECT 1 FROM fp j WHERE j.is_inc AND j.fp = i.fp
       |      AND j.doc_id < i.doc_id)))""".stripMargin
}
