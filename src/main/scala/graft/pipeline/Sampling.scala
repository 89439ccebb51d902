package graft.pipeline

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling: the `n` documents per stratum with
  * the smallest `md5(doc_id)` — a stable pseudo-random draw that is
  * reproducible across runs, cluster sizes and engines (the hash IS the
  * random order, so there is no RNG state to seed or synchronize).
  *
  * Scale shape: a plain `row_number() over (partition by stratum order by
  * md5)` caps parallelism at the stratum count (a handful of languages
  * over 100 TB = a skew wall). Instead, phase 1 prunes map-side with a
  * bounded heap — each input partition forwards at most `n` rows per
  * stratum it contains, so the shuffle moves ≤ n×P candidate rows per
  * stratum, never the corpus — and phase 2 ranks the tiny survivor set
  * with the exact window. The union of per-partition top-n supersets the
  * global top-n, so the result is exact.
  */
object Sampling {

  /** (stratum, doc_id, rn) with rn = 1..n per stratum in md5 order. */
  def stratified(df: DataFrame, strataCol: String, idCol: String, n: Int)
      : DataFrame = {
    require(n > 0, s"sample size must be positive: $n")
    val keyed = df.select(col(strataCol).as("stratum"),
      col(idCol).cast("long").as("doc_id"),
      md5(col(idCol).cast("string")).as("pick"))
    // Ordering is (pick, doc_id) ascending — doc_id breaks md5 ties
    // deterministically; the max-heap evicts the largest = worst.
    heapRank[String](keyed, n, _.getString(2),
        Ordering.Tuple2[String, Long],
        Seq(col("pick"), col("doc_id")))
      .select(col("stratum"), col("doc_id"), col("rn"))
      .orderBy("stratum", "doc_id")
  }

  /** The shared two-phase per-stratum top-n rank (used by [[stratified]]
    * and [[Importance.selectTop]]): phase 1 prunes map-side with a
    * bounded heap — each input partition forwards at most `n` rows per
    * stratum it contains, so the shuffle moves ≤ n×P candidate rows per
    * stratum, never the corpus — and phase 2 ranks the survivor set
    * with the exact window. The union of per-partition top-n supersets
    * the global top-n, so the result is exact.
    *
    * `keyed` must be (stratum, doc_id long, key) in that column order;
    * `worstFirst` must rank the WORST row maximal (the heap evicts its
    * max) consistently with `windowOrder`'s best-first ranking. Returns
    * (stratum, doc_id, key, rn ≤ n), unordered. */
  private[pipeline] def heapRank[K](keyed: DataFrame, n: Int,
      getKey: org.apache.spark.sql.Row => K,
      worstFirst: Ordering[(K, Long)],
      windowOrder: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val spark = keyed.sparkSession
    val schema = keyed.schema
    val pruned = keyed.rdd.mapPartitions { it =>
      val heaps = mutable.HashMap.empty[Any, mutable.PriorityQueue[(K, Long)]]
      it.foreach { r =>
        val heap = heaps.getOrElseUpdate(r.get(0),
          mutable.PriorityQueue.empty(worstFirst))
        heap.enqueue((getKey(r), r.getLong(1)))
        if (heap.size > n) heap.dequeue()
      }
      heaps.iterator.flatMap { case (stratum, heap) =>
        heap.iterator.map { case (key, id) =>
          org.apache.spark.sql.Row(stratum, id, key)
        }
      }
    }
    val w = Window.partitionBy("stratum").orderBy(windowOrder: _*)
    spark.createDataFrame(pruned, schema)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= n)
  }

  /** DuckDB oracle for [[stratified]] over table `documents`, strata =
    * `lang` (the window form — correct, just not the scale shape). */
  def oracleSql(n: Int): String =
    s"""SELECT lang AS stratum, doc_id, rn FROM (
       |  SELECT lang, doc_id,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
       |  FROM documents)
       |WHERE rn <= $n ORDER BY stratum, doc_id""".stripMargin
}
