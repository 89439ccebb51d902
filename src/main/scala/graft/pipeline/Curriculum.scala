package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.ScalableCumSum

/** Curriculum ordering (Bengio et al., ICML'09): emit a global training
  * order that presents documents easy→hard in `buckets` difficulty
  * stages while shuffling deterministically WITHIN each stage — the
  * "sort by difficulty, shuffle within band" recipe curriculum and
  * length-bucketing loaders both need, as a pure function of the corpus
  * (no RNG state: any rerun on any cluster reproduces the order).
  *
  * Bucketing is exact NTILE semantics — equal-depth bands over the
  * total order (difficulty ASC, doc_id ASC), the first `n mod buckets`
  * bands holding the extra row — computed WITHOUT a global window: the
  * global rank comes from [[ScalableCumSum]] (range-partitioned two-pass
  * prefix sum, O(P)-longs driver collect) and the band index is a
  * closed-form function of (rank, n, buckets). The in-band draw is the
  * [[EpochShuffle]] convention: md5 of the doc id IS the shuffle key.
  * The final position is a second ScalableCumSum pass over
  * (bucket, draw, doc_id).
  *
  * Scale shape: two range-shuffles of a 3-column projection and two
  * O(P) driver collects — never a one-partition `row_number` window,
  * never a per-bucket window (buckets are few: a bucket-partitioned
  * window would funnel 1/buckets of the corpus through single tasks).
  *
  * Reference scope note: kbrowse has no training-order surface — this
  * op extends the engine toward training-data preparation per the
  * build brief.
  */
object Curriculum {

  /** (doc_id, difficulty, bucket, pos): bucket ∈ [1, buckets] by NTILE
    * over difficulty; pos = 1-based global curriculum position, ordered
    * by (bucket, md5 draw, doc_id). */
  def order(docs: DataFrame, idCol: String, difficultyCol: String,
      buckets: Int, numPartitions: Int = 32): DataFrame = {
    require(buckets >= 1, s"buckets must be positive: $buckets")
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      col(difficultyCol).cast("long").as("difficulty"))
      .withColumn("one", lit(1L))
    val ranked = ScalableCumSum.addCumSum(base,
      Seq("difficulty", "doc_id"), "one", "r", numPartitions)
    val n = ranked.agg(count(lit(1)).as("n"))
    // NTILE in closed form from the 0-based rank r: the first
    // `rem = n mod B` buckets hold q+1 = ceil(n/B) rows each. Integer
    // DIV throughout (Column./ is IEEE true division). The ELSE branch
    // divides by q only when some row has r ≥ rem·(q+1), which forces
    // q ≥ 1 — no division by zero reachable.
    val b = buckets.toLong
    val bucketed = ranked.crossJoin(broadcast(n))
      .withColumn("bucket", expr(
        s"""CAST(CASE WHEN r < (n % $b) * (n DIV $b + 1)
           |  THEN r DIV (n DIV $b + 1)
           |  ELSE n % $b + (r - (n % $b) * (n DIV $b + 1)) DIV (n DIV $b)
           |  END + 1 AS INT)""".stripMargin))
      .withColumn("draw",
        md5(concat(lit("c:"), col("doc_id").cast("string"))))
      .select("doc_id", "difficulty", "bucket", "draw", "one")
    ScalableCumSum.addCumSum(bucketed,
        Seq("bucket", "draw", "doc_id"), "one", "p0", numPartitions)
      .select(col("doc_id"), col("difficulty"), col("bucket"),
        (col("p0") + 1).as("pos"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[order]] over table `documents` with
    * `n_chars` as the difficulty signal. */
  def oracleSql(buckets: Int): String =
    s"""WITH b AS (
       |  SELECT doc_id, CAST(n_chars AS BIGINT) AS difficulty,
       |    CAST(ntile($buckets) OVER (ORDER BY n_chars, doc_id) AS INT)
       |      AS bucket,
       |    md5(concat('c:', CAST(doc_id AS VARCHAR))) AS draw
       |  FROM documents)
       |SELECT doc_id, difficulty, bucket,
       |  CAST(row_number() OVER (ORDER BY bucket, draw, doc_id) AS BIGINT)
       |    AS pos
       |FROM b ORDER BY doc_id""".stripMargin
}
