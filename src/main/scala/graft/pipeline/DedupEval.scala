package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.oracle.Duck

/** Fuzzy-dedup method calibration — the dedup counterpart of q87's ANN
  * recall report: how much of the TRUE n-gram-Jaccard near-duplicate
  * mass does the cheap simhash Hamming-ball detector capture, banded by
  * true similarity? Running a corpus-wide fuzzy dedup at 100 TB means
  * choosing a detector; this op is the measurement that justifies the
  * choice (and the threshold), produced by composing two operators the
  * engine already trusts: [[SimHash.hammingPairs]] (predictions) and
  * [[MinHashDedup.jaccardPairs]] (labels — exact Jaccard over LSH
  * candidates).
  *
  * Output: one row per true-Jaccard decile band ≥ the label floor,
  * plus band −1 for predicted pairs with no label (their true Jaccard
  * is below the floor or outside the LSH candidate envelope): (band,
  * n_pairs, n_pred). Capture rate per band = n_pred / n_pairs, left as
  * integers — the IEEE-free reporting rule.
  *
  * Label-envelope honesty (the q87 convention): "truth" here is exact
  * Jaccard over LSH-BANDED candidates, so pairs no MinHash band
  * surfaces are absent from every band — the comparison measures the
  * detectors against each other, not against the unknowable all-pairs
  * ground truth; at fixture scale the oracle reproduces the identical
  * envelope, so the rows stay bit-exact.
  *
  * Scale shape: both inputs are bucketed discoveries (never all-pairs);
  * the full-outer join runs over PAIR-sized frames keyed (doc_a,
  * doc_b), and the band rollup is a ≤12-group aggregate. The whole
  * report costs two dedup passes plus a pair-sized exchange.
  */
object DedupEval {

  /** (band, n_pairs, n_pred) — band = floor(10·jaccard) for labeled
    * pairs (10 = exact duplicates), −1 for predicted-only pairs.
    *
    * `sampleRate` < 1 gates the corpus with the deterministic md5 draw
    * (the [[DupClusters.groupSplit]] idiom) BEFORE either detector
    * runs — the deployment grain on a replica-dense corpus, where the
    * full doc-pair expansion is output-bound (q97's 64× answer is
    * 9·10⁹ pairs); detector calibration needs a representative sample,
    * not the full pair mass. */
  def simhashCalibration(docs0: DataFrame, idCol: String, textCol: String,
      labelMin: Double, maxDist: Int = SimHash.DefaultMaxDist,
      sampleRate: Double = 1.0, width: Int = SimHash.Bits): DataFrame = {
    require(sampleRate > 0.0 && sampleRate <= 1.0,
      s"sampleRate must be in (0,1]: $sampleRate")
    // The shared md5-gate idiom (DupClusters.groupSplit / Sampling):
    // floor to a Long threshold, fixed-width hex compare. Granularity
    // is 1/65536 — a rate whose threshold floors to 0 would silently
    // sample NOTHING and report an empty calibration, so it raises
    // loudly instead (the repo's loud-failure convention).
    val threshold = math.floor(sampleRate * 65536).toLong
    require(sampleRate >= 1.0 || threshold > 0,
      s"sampleRate $sampleRate is below the md5 gate's 1/65536 " +
        "granularity: the sample would be empty")
    val docs = if (sampleRate >= 1.0) docs0
    else docs0.filter(
      substring(md5(concat(lit("cal:"), col(idCol).cast("string"))), 1, 4)
        < lit(f"$threshold%04x"))
    // Width defaults to the 32-BIT detector here (not SimHash's 62-bit
    // deployment default): this op CALIBRATES a chosen detector, q104's
    // oracle replays the 32-bit ball, and the width under evaluation
    // should always be explicit at the call site.
    val pred = SimHash.hammingPairs(docs, idCol, textCol, maxDist,
        width = width)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("is_pred"))
    val lab = MinHashDedup.jaccardPairs(docs, idCol, textCol, labelMin)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    lab.join(pred, Seq("doc_a", "doc_b"), "full_outer")
      .select(
        when(col("jaccard").isNull, lit(-1))
          .otherwise(floor(col("jaccard") * 10).cast("int")).as("band"),
        coalesce(col("is_pred"), lit(0L)).as("is_pred"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_pairs"), sum("is_pred").as("n_pred"))
      .orderBy("band")
  }

  /** DuckDB oracle for [[simhashCalibration]] over table `documents`:
    * the q27 label CTEs and a RENAMED copy of the q97 signature CTEs
    * (both chains define `sig`) joined full-outer and banded. */
  def oracleSql(labelMin: Double, maxDist: Int = SimHash.DefaultMaxDist)
      : String = {
    val rh = Duck.rollingHashSql("t")
    s"""${MinHashDedup.ctePrefixSql},
       |ex AS (
       |  SELECT c.doc_a, c.doc_b,
       |    len(list_filter(sa.shingles, x -> list_contains(sb.shingles, x))) AS inter,
       |    len(sa.shingles) AS na, len(sb.shingles) AS nb
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.doc_a
       |  JOIN sh sb ON sb.doc_id = c.doc_b),
       |lab AS (
       |  SELECT doc_a, doc_b, inter / CAST(na + nb - inter AS DOUBLE) AS jaccard
       |  FROM ex WHERE inter / CAST(na + nb - inter AS DOUBLE) >= $labelMin),
       |shs AS (
       |  SELECT doc_id,
       |    list_transform(regexp_extract_all(text, '\\S+'), t -> $rh) AS hashes
       |  FROM documents),
       |ssig AS (
       |  SELECT doc_id,
       |    CAST(list_sum(list_transform(range(0, ${SimHash.Bits}), i ->
       |      CASE WHEN 2 * len(list_filter(hashes, h -> ((h >> i) & 1) = 1)) >= len(hashes)
       |           THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS simhash
       |  FROM shs),
       |pred AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM ssig a JOIN ssig b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxDist),
       |u AS (
       |  SELECT l.jaccard,
       |    CASE WHEN p.doc_a IS NOT NULL THEN 1 ELSE 0 END AS is_pred
       |  FROM lab l FULL OUTER JOIN pred p
       |    ON l.doc_a = p.doc_a AND l.doc_b = p.doc_b)
       |SELECT
       |  CAST(CASE WHEN jaccard IS NULL THEN -1
       |            ELSE floor(jaccard * 10) END AS INT) AS band,
       |  CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(is_pred) AS BIGINT) AS n_pred
       |FROM u GROUP BY 1 ORDER BY band""".stripMargin
  }
}
