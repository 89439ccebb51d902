package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-language corpus telemetry: document counts, total characters,
  * and EXACT length percentiles (p10/p50/p90/p99) — the distribution
  * report a curation run publishes before and after each filtering
  * stage (length-filter thresholds are typically set from exactly this
  * table).
  *
  * Percentiles are exact ORDER STATISTICS, not interpolated: the value
  * at 0-based sorted index `floor(p·(n−1))`. Selection never averages,
  * so every reported number is an integer that exists in the data, and
  * oracle parity is trivial (the one float op, `p·(n−1)`, is a single
  * IEEE multiply fed to floor — identical in both engines; equal-value
  * ties make the picked VALUE independent of their ordering).
  *
  * Scale shape: one hash exchange on lang feeds both windows (rank and
  * per-key count share the partitioning — the q29 rule), then a
  * partial/final aggregate. At 100 TB the per-key sort window is a real
  * full-column shuffle into sorted runs (spill-safe, correct, not
  * cheap) — the SAME exact order statistics without any sort or data
  * shuffle are [[graft.ops.ScalableQuantiles.orderStatistics]] (q96):
  * radix selection in a fixed number of scan+aggregate passes, oracle-
  * checked against this query's oracle verbatim. This window form stays
  * registered as the equivalence baseline and the right plan when the
  * report is computed alongside other per-key windows that already pay
  * the exchange. */
object CorpusStats {

  val Percentiles: Seq[(Double, String)] =
    Seq(0.10 -> "p10", 0.50 -> "p50", 0.90 -> "p90", 0.99 -> "p99")

  def lengthReport(docs: DataFrame, langCol: String,
      lenCol: String): DataFrame = {
    val byLang = Window.partitionBy("lang")
    val ranked = docs
      .select(col(langCol).as("lang"), col(lenCol).cast("long").as("len"))
      .withColumn("rn", row_number().over(byLang.orderBy("len")))
      .withColumn("n", count(lit(1)).over(byLang))
    val pCols = Percentiles.map { case (p, name) =>
      max(when(col("rn") === (floor(lit(p) * (col("n") - 1)) + 1).cast("long"),
        col("len"))).as(name)
    }
    val aggCols = Seq(sum("len").as("total_chars")) ++ pCols
    ranked.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), aggCols: _*)
      .orderBy("lang")
  }

  /** DuckDB oracle for [[lengthReport]] over table `documents`. */
  def oracleSql: String = {
    // CAST($p AS DOUBLE) is load-bearing: a bare decimal literal would
    // make DuckDB compute the index in exact DECIMAL while Spark's
    // lit(p) multiplies in double — for percentiles whose double product
    // lands just under an integer (e.g. 0.29 × 100 = 28.999…96) the two
    // floors would disagree by one rank. Forcing double on both sides
    // makes it the same single IEEE multiply.
    val pSelects = Percentiles.map { case (p, name) =>
      s"max(CASE WHEN rn = CAST(floor(CAST($p AS DOUBLE) * (n - 1)) AS BIGINT) + 1 THEN len END) AS $name"
    }.mkString(",\n       |  ")
    s"""WITH r AS (
       |  SELECT lang, n_chars AS len,
       |    row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
       |    count(*) OVER (PARTITION BY lang) AS n
       |  FROM documents)
       |SELECT lang, count(*) AS n_docs,
       |  CAST(sum(len) AS BIGINT) AS total_chars,
       |  $pSelects
       |FROM r GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** Default bound on how many sources may share one gram — which is
    * also the bound on the matrix's side, since a gram common to every
    * source (stopword runs are, at any n) has all of them in its cell.
    * 4096 sources = an 8M-cell matrix, the edge of what a report that
    * humans (or a mixing optimizer) consume can mean. */
  val DefaultMaxSources: Int = 4096

  /** Cross-source content overlap matrix: for every unordered source
    * pair (a < b), how many DISTINCT word `n`-grams the two share — the
    * corpus-provenance report behind mixing and dedup decisions
    * ("how much of snapshot B is already in A?"), sensitive to shared
    * CONTENT even when no whole document is duplicated.
    *
    * Scale shape: grams never cross the plan as text — each doc's grams
    * are 63-bit fingerprints from one codegen'd pass
    * ([[graft.functions.WordGramHashesExpr]]), distinct-ed with
    * map-side combine so the one corpus-scale exchange carries
    * (source, fp) longs. The per-gram source set is then folded ONCE
    * (`collect_set`, bounded by the source count) and pairs are emitted
    * from the sorted set array-side — k(k−1)/2 rows for a gram shared by
    * k sources, never a fp-keyed self-join whose hot grams would square
    * the shuffle. The quadratic emission is capped by the
    * maxCellMembers convention: a gram in more than `maxSources`
    * sources raises a contract error naming the knob, because past that
    * the matrix itself (S² cells) has stopped being a report.
    *
    * Requires [[graft.functions.GraftFunctions.register]] on the
    * session (native gram fingerprints). */
  def overlapMatrix(docs: DataFrame, srcCol: String, textCol: String,
      n: Int, maxSources: Int = DefaultMaxSources): DataFrame = {
    require(n > 0, s"n-gram size must be positive: $n")
    require(maxSources > 1, s"maxSources must exceed 1: $maxSources")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val grams = docs
      .select(col(srcCol).as("source"),
        explode_outer(graft.functions.GraftFunctions.wordGramHashes(
          col(textCol), n)).as("gram_fp"))
      .filter(col("gram_fp").isNotNull)
      .distinct()
    val cells = grams.groupBy("gram_fp")
      .agg(array_sort(collect_set(col("source"))).as("srcs"))
      .filter(size(col("srcs")) > 1)
      .filter(expr(
        s"CASE WHEN size(srcs) > $maxSources THEN CAST(raise_error(CONCAT(" +
          s"'overlap matrix: a gram is shared by ', size(srcs), " +
          s"' sources, past maxSources=$maxSources — at that breadth the " +
          s"S-squared matrix is no longer a consumable report; raise " +
          s"maxSources only with a matching budget for its cells')) " +
          s"AS BOOLEAN) ELSE true END"))
    cells
      .select(explode(expr(
        "flatten(transform(srcs, (a, i) -> " +
          "transform(slice(srcs, i + 2, size(srcs)), " +
          "b -> struct(a AS src_a, b AS src_b))))")).as("p"))
      .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
      .agg(count(lit(1)).as("shared_grams"))
      .orderBy("src_a", "src_b")
  }

  /** The fp-keyed self-join formulation of [[overlapMatrix]] — kept as
    * the equivalence-test mirror (correct, but a hot gram shared by k
    * sources makes the join materialize its k² row pairs through the
    * shuffle instead of emitting k(k−1)/2 array-side). */
  private[graft] def joinOverlapMatrix(docs: DataFrame, srcCol: String,
      textCol: String, n: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val grams = docs
      .select(col(srcCol).as("source"),
        explode_outer(graft.functions.GraftFunctions.wordGramHashes(
          col(textCol), n)).as("gram_fp"))
      .filter(col("gram_fp").isNotNull)
      .distinct()
    grams.as("a").join(grams.as("b"),
        col("a.gram_fp") === col("b.gram_fp") &&
          col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("shared_grams"))
      .orderBy("src_a", "src_b")
  }

  /** DuckDB oracle for [[overlapMatrix]] over `documents` (the join
    * form — correct, just not the scale shape). */
  def overlapOracleSql(n: Int): String =
    s"""WITH toks AS (
       |  SELECT source, regexp_extract_all(lower(text), '\\S+') AS t
       |  FROM documents),
       |grams AS (
       |  SELECT DISTINCT source,
       |    ${graft.oracle.Duck.gramHash63Sql("gram")} AS gram_fp
       |  FROM (
       |    SELECT source,
       |      unnest(list_transform(range(1, greatest(len(t) - ${n - 1}, 0) + 1),
       |        i -> array_to_string(t[i:i+${n - 1}], ' '))) AS gram
       |    FROM toks))
       |SELECT a.source AS src_a, b.source AS src_b,
       |  count(*) AS shared_grams
       |FROM grams a JOIN grams b
       |  ON a.gram_fp = b.gram_fp AND a.source < b.source
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Source-pair Jaccard similarity from k-minimum-values sketches —
    * the BOUNDED-MEMORY companion to [[overlapMatrix]]. The exact
    * matrix distinct-s every gram corpus-wide before counting; at
    * 100 TB the distinct is a full gram-fingerprint exchange. The KMV
    * estimator instead reduces each source to its `k` smallest DISTINCT
    * gram fingerprints — a fixed-size profile a 63-bit hash makes
    * uniform — and estimates every pair's Jaccard from the sketches
    * alone: with `U` = the k smallest values of the union of two
    * sketches, J ≈ |U ∩ A ∩ B| / |U| (Beyer et al.'s k-min estimator,
    * ±O(1/√k)). Everything after the sketch is arithmetic on S·k longs.
    *
    * Estimates are still bit-REPRODUCIBLE: the sketch content is a
    * deterministic function of the data (k smallest distinct values —
    * no RNG), so both engines compute identical sketches, identical
    * integer counts, and one final IEEE division.
    *
    * Scale shape: the prune never distinct-s the corpus — a typed
    * mapPartitions keeps one ≤k TreeSet per source per partition
    * (duplicate-safe: Set add, evict max), so each partition forwards
    * ≤ S·k longs and the ONE exchange carries ≤ S·k·P survivor rows,
    * never the gram stream. The survivor distinct + rank runs on that
    * sketch-sized frame. Pair scoring joins the S-row sketch-array
    * table to itself under `src_a < src_b` — S²/2 rows of 2k longs,
    * driver-free; the [[DefaultMaxSources]]-style cap (`maxSources`,
    * enforced on the materialized S) keeps the matrix a report. */
  def kmvSourceSimilarity(docs: DataFrame, srcCol: String, textCol: String,
      n: Int, k: Int, maxSources: Int = 1024): DataFrame = {
    require(n > 0, s"n-gram size must be positive: $n")
    require(k > 0, s"sketch size must be positive: $k")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val grams = docs.select(col(srcCol).cast("string").as("source"),
        explode_outer(graft.functions.GraftFunctions.wordGramHashes(
          col(textCol), n)).as("gram_fp"))
      .filter(col("gram_fp").isNotNull)
    val arrs = graft.ops.Materialize.barrier(
      kminSketch(grams, k)
        .groupBy("source")
        .agg(array_sort(collect_list("gram_fp")).as("fps")))
    val nSrc = arrs.count()
    require(nSrc <= maxSources,
      s"kmv similarity: $nSrc sources exceed maxSources=$maxSources — " +
        "past that breadth the S-squared pair matrix is no longer a " +
        "consumable report; raise maxSources only with a matching budget")
    val a = arrs.select(col("source").as("src_a"), col("fps").as("fps_a"))
    val b = arrs.select(col("source").as("src_b"), col("fps").as("fps_b"))
    val u = array_sort(array_union(col("fps_a"), col("fps_b")))
    val kUsed = least(size(u), lit(k)).cast("long")
    val shared = size(array_intersect(
      array_intersect(slice(u, 1, k), col("fps_a")), col("fps_b"))).cast("long")
    a.join(b, col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        kUsed.as("k_used"), shared.as("shared_kmin"),
        (shared.cast("double") / kUsed.cast("double")).as("jaccard_est"))
      .orderBy("src_a", "src_b")
  }

  /** The `k` smallest DISTINCT `gram_fp` per `source`, without ever
    * distinct-ing the input: per-partition ≤k TreeSets (a Set, so
    * duplicates cannot crowd out a value that belongs in the global
    * k-min — the [[graft.pipeline.Sampling.heapRank]] prune is NOT
    * reusable here exactly because its heap ranks rows, not values),
    * then exact distinct + rank over the ≤ S·k·P survivors. */
  private[pipeline] def kminSketch(grams: DataFrame, k: Int): DataFrame = {
    val spark = grams.sparkSession
    import spark.implicits._
    val pruned = grams.as[(String, Long)].mapPartitions { it =>
      val sets = scala.collection.mutable.HashMap
        .empty[String, java.util.TreeSet[java.lang.Long]]
      it.foreach { case (src, fp) =>
        val s = sets.getOrElseUpdate(src, new java.util.TreeSet[java.lang.Long]())
        if (s.size < k) { s.add(fp); () }
        else if (fp < s.last && s.add(fp)) { s.pollLast(); () }
      }
      sets.iterator.flatMap { case (src, s) =>
        scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
          .asScala.map(v => (src, v.longValue))
      }
    }.toDF("source", "gram_fp")
    val w = Window.partitionBy("source").orderBy("gram_fp")
    pruned.distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** DuckDB oracle for [[kmvSourceSimilarity]] over `documents` — the
    * sketch via a plain window rank over the distinct grams (correct,
    * just not the bounded-prune shape), then identical list math. */
  def kmvOracleSql(n: Int, k: Int): String =
    s"""WITH toks AS (
       |  SELECT source, regexp_extract_all(lower(text), '\\S+') AS t
       |  FROM documents),
       |grams AS (
       |  SELECT DISTINCT source,
       |    ${graft.oracle.Duck.gramHash63Sql("gram")} AS gram_fp
       |  FROM (
       |    SELECT source,
       |      unnest(list_transform(range(1, greatest(len(t) - ${n - 1}, 0) + 1),
       |        i -> array_to_string(t[i:i+${n - 1}], ' '))) AS gram
       |    FROM toks)),
       |kmin AS (
       |  SELECT source, gram_fp FROM (
       |    SELECT source, gram_fp,
       |      row_number() OVER (PARTITION BY source ORDER BY gram_fp) AS rn
       |    FROM grams) WHERE rn <= $k),
       |sk AS (
       |  SELECT source, list(gram_fp ORDER BY gram_fp) AS fps
       |  FROM kmin GROUP BY source),
       |pairs AS (
       |  SELECT a.source AS src_a, b.source AS src_b,
       |    a.fps AS fps_a, b.fps AS fps_b,
       |    list_sort(list_distinct(list_concat(a.fps, b.fps))) AS u
       |  FROM sk a JOIN sk b ON a.source < b.source),
       |scored AS (
       |  SELECT src_a, src_b,
       |    CAST(least(len(u), $k) AS BIGINT) AS k_used,
       |    CAST(len(list_filter(u[1:$k], x ->
       |      list_contains(fps_a, x) AND list_contains(fps_b, x))) AS BIGINT)
       |      AS shared_kmin
       |  FROM pairs)
       |SELECT src_a, src_b, k_used, shared_kmin,
       |  CAST(shared_kmin AS DOUBLE) / CAST(k_used AS DOUBLE) AS jaccard_est
       |FROM scored ORDER BY src_a, src_b""".stripMargin
}
