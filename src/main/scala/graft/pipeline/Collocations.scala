package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Materialize

/** Document-level collocation mining — the association-analysis corner
  * of the text-statistics family: which vocabulary terms CO-OCCUR in
  * documents far beyond what their individual document frequencies
  * predict. [[BigramModel]] (q88) scores ADJACENT token pairs inside a
  * sequence; this op scores UNORDERED term pairs at document grain —
  * the signal behind topic-pair discovery, template detection ("these
  * two terms always travel together → boilerplate family"), and the
  * co-occurrence statistics a word-association feature pipeline ships.
  *
  * The score is the LIFT `P(a,b) / (P(a)·P(b))` in exact ppm fixed
  * point — `lift_ppm = (10^6 · c_ab · N) div (c_a · c_b)`, all
  * integers, one integer floor-division (monotone with PMI =
  * log(lift), so the top-k under lift IS the top-k under PMI with no
  * transcendental in the plan — the [[Importance]]/[[SourceDrift]]
  * fixed-point discipline). Overflow is bounded by contract:
  * `10^6 · c_ab · N ≤ 10^6 · N²`, within BIGINT for any corpus below
  * ~3·10^6 docs per run; past that, scores shard by corpus slice and
  * merge, or the ppm scale drops to ppk (the scale is a parameter of
  * the arithmetic, not the design).
  *
  * Scale shape: ONE tokenize→distinct pass builds (doc, term)
  * presence, materialized once for the two consumers (the
  * [[Vocabulary]] convention); the top-`v` vocabulary is a
  * TakeOrderedAndProject (bounded heap, never a full sort) collected
  * under the ≤ [[MaxVocab]] driver contract, re-keyed to dense int
  * ids in term order, and broadcast back onto presence; each document
  * then contributes its ≤ `v` in-vocabulary term IDS as ONE sorted
  * array and pairs emit ARRAY-SIDE from that bounded cell as packed
  * `id_a·MaxVocab + id_b` longs (the q58/q129 emission with 8-byte
  * pair rows — a document with t vocab terms costs C(t,2) ≤ C(v,2)
  * slim output rows, never a join square, and `v` is an enforced
  * contract). The pair aggregate — the only corpus-scale exchange —
  * therefore moves one long per pair; names and dfs re-attach after
  * aggregation via v-row broadcast joins, and the final top-k is
  * again a bounded heap. */
object Collocations {

  /** Hard bound on the vocabulary parameter: C(v,2) per-doc emission
    * must stay a bounded cell (the [[DiverseSelect]] cap rationale). */
  val MaxVocab: Int = 1 << 12

  /** Top-`k` vocabulary term pairs by lift, among pairs co-occurring
    * in ≥ `minCount` documents. Vocabulary = top-`v` terms by document
    * frequency (df DESC, term ASC — the bit-stable [[Vocabulary]]
    * tie-break). Output: (term_a, term_b, n_pair, df_a, df_b,
    * lift_ppm), ordered lift DESC then pair asc. */
  def topPairs(docs: DataFrame, idCol: String, textCol: String,
      v: Int, minCount: Int, k: Int): DataFrame = {
    require(v > 0 && v <= MaxVocab,
      s"vocabulary size must be in [1, $MaxVocab]: $v")
    require(minCount > 0, s"minCount must be positive: $minCount")
    require(k > 0, s"k must be positive: $k")
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val nDocs = docs.count()
    val pres = Materialize.barrier(docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode_outer(graft.functions.GraftFunctions
          .wordGrams(col(textCol), 1)).as("term"))
      .filter(col("term").isNotNull)
      .distinct())
    // Top-v vocabulary COLLECTED (≤ MaxVocab rows — the bounded
    // driver-artifact convention) and re-keyed to dense int ids in
    // TERM order, so id order ≡ term order and the packed pair key
    // below preserves the (term_a < term_b) emission convention
    // exactly. The r21 profile showed the old string-struct pair
    // aggregate as the query's dominant stage: every emitted pair
    // carried two term strings + two dfs through the exchange and the
    // hash aggregate. Packing (id_a·MaxVocab + id_b) into ONE long
    // shrinks the pair row to 8 bytes and turns the aggregate's key
    // comparison into long equality (guide §2.3, narrower types) —
    // names and dfs re-attach AFTER aggregation via two broadcast
    // joins against the v-row vocab relation.
    val vocabRows = pres.groupBy("term").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term").asc)
      .limit(v)
      .collect()
    val vocabIdx = vocabRows.map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1).zipWithIndex
      .map { case ((t, df), i) => (i.toLong, t, df) }.toSeq
    val vocab = vocabIdx.toDF("tid", "term", "df")
    val cells = pres
      .join(broadcast(vocab.select("tid", "term")), "term")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(col("tid"))).as("ts"))
    val pairCounts = cells
      .select(explode(expr(
        "flatten(transform(ts, (__ca, __ci) -> " +
          "transform(slice(ts, __ci + 2, size(ts)), __cb -> " +
          s"__ca * $MaxVocab + __cb)))")).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    val aSide = vocab.select(col("tid").as("__ta"),
      col("term").as("term_a"), col("df").as("df_a"))
    val bSide = vocab.select(col("tid").as("__tb"),
      col("term").as("term_b"), col("df").as("df_b"))
    pairCounts
      .select((col("pk") / MaxVocab).cast("long").as("__ta"),
        (col("pk") % MaxVocab).as("__tb"), col("n_pair"))
      .join(broadcast(aSide), "__ta")
      .join(broadcast(bSide), "__tb")
      .select(col("term_a"), col("term_b"), col("n_pair"),
        col("df_a"), col("df_b"),
        expr(s"(CAST(1000000 AS BIGINT) * n_pair * ${nDocs}L) " +
          "div (df_a * df_b)").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("term_a"), col("term_b"))
      .limit(k)
  }

  /** DuckDB oracle for [[topPairs]] over table `documents` — the
    * quadratic within-doc self-join the array-side emission avoids. */
  def oracleSql(v: Int, minCount: Int, k: Int): String =
    s"""WITH pres AS (
       |  SELECT DISTINCT doc_id, term FROM (
       |    SELECT doc_id,
       |           unnest(regexp_extract_all(lower(text), '\\S+')) AS term
       |    FROM documents)),
       |vocab AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS df
       |  FROM pres GROUP BY term
       |  ORDER BY df DESC, term ASC LIMIT $v),
       |pv AS (
       |  SELECT doc_id, term, df FROM pres JOIN vocab USING (term)),
       |pairs AS (
       |  SELECT a.term AS term_a, b.term AS term_b,
       |         CAST(count(*) AS BIGINT) AS n_pair,
       |         a.df AS df_a, b.df AS df_b
       |  FROM pv a JOIN pv b
       |    ON a.doc_id = b.doc_id AND a.term < b.term
       |  GROUP BY 1, 2, 4, 5)
       |SELECT term_a, term_b, n_pair, df_a, df_b,
       |       (1000000 * n_pair * (SELECT count(*) FROM documents))
       |         // (df_a * df_b) AS lift_ppm
       |FROM pairs WHERE n_pair >= $minCount
       |ORDER BY lift_ppm DESC, term_a, term_b LIMIT $k""".stripMargin
}
