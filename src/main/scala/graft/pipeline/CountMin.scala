package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min-sketched term commonness — [[TermCommonness]] (q72) at the
  * scale where the exact vocabulary no longer fits a join: the corpus's
  * token-occurrence counts compress into a fixed-size count-min sketch
  * ([[Slices]] counter arrays of 2^[[SliceBits]] cells indexed by
  * disjoint bit slices of the token's 63-bit fingerprint — the
  * [[BloomDecontam]] layout with counters in place of bits), and every
  * document scores by the average SKETCHED frequency of its tokens.
  * Estimates only ever OVERCOUNT (min over slices ≥ true count, the CMS
  * guarantee) — junk documents full of near-singleton tokens can only
  * look MORE common than they are, so a low-commonness drop under the
  * sketch is always justified under the exact counts too: the
  * one-sided-error property that makes the sketch safe as a drop
  * filter, mirroring Bloom's never-undercount triage semantics.
  *
  * Scale shape: the artifact is 3 × 2^[[SliceBits]] longs (384 KiB at
  * the default) REGARDLESS of corpus size — where q72's exact form must
  * exchange a corpus-growing vocabulary and join it back, this op's
  * scoring pass is ONE map-side scan with ZERO joins and ZERO
  * shuffles before the listing sort: per document, the native
  * fingerprint array folds through an `aggregate` HOF whose step is
  * `min` over three literal-array probes — all codegen'd integer
  * arithmetic. Building the sketch is one (slice, pos) count aggregate
  * (≤ 3·2^[[SliceBits]] result rows to the driver, occurrence stream
  * never collected), a train-time artifact like [[BloomDecontam
  * .packedFilter]] and the q80 codebooks.
  *
  * Determinism: counter updates are integer sums, probes are pure bit
  * arithmetic, the estimate is `least` of three integers — the DuckDB
  * oracle reproduces every count and every estimate bit-exactly.
  */
object CountMin {

  /** Independent hash functions = disjoint fingerprint bit slices. */
  val Slices: Int = 3

  /** log2(counters per slice): 2^14 cells × 8 B × 3 slices = 384 KiB.
    * Real deployments size this by vocabulary (ε ≈ e/width): a 100 M-term
    * vocabulary at ~1% relative overcount wants SliceBits ~24 (~400 MB,
    * still one broadcast artifact); 14 keeps fixture-scale collisions
    * visible so the overcount path is actually exercised by the spec. */
  val SliceBits: Int = 14

  private val mask = (1L << SliceBits) - 1

  /** Build the sketch from the corpus's token OCCURRENCES (lowercased
    * whitespace unigram fingerprints): `sketch(i)(pos)` = number of
    * occurrences whose slice-`i` position is `pos`. */
  def buildSketch(docs: DataFrame, textCol: String): Array[Array[Long]] = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val fps = graft.functions.GraftFunctions.wordGramHashes(col(textCol), 1)
    val sketch = Array.fill(Slices)(new Array[Long](1 << SliceBits))
    docs.select(explode_outer(fps).as("fp"))
      .filter(col("fp").isNotNull)
      .select(explode(array((0 until Slices).map(i =>
        struct(lit(i).as("slice"),
          shiftright(col("fp"), i * SliceBits).bitwiseAND(lit(mask))
            .as("pos"))): _*)).as("sp"))
      .groupBy(col("sp.slice").as("slice"), col("sp.pos").as("pos"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .foreach { r =>
        sketch(r.getInt(0))(r.getLong(1).toInt) = r.getLong(2)
      }
    sketch
  }

  /** The sketched occurrence-count estimate of fingerprint `fp`:
    * `least` over the [[Slices]] literal-array probes — ≥ the true
    * count, codegen'd, join-free. */
  def estimateExpr(fp: Column, sketch: Array[Array[Long]]): Column = {
    require(sketch.length == Slices &&
      sketch.forall(_.length == 1 << SliceBits),
      s"sketch must be $Slices x ${1 << SliceBits} longs")
    least((0 until Slices).map { i =>
      val pos = shiftright(fp, i * SliceBits).bitwiseAND(lit(mask))
      element_at(typedLit(sketch(i).toSeq), (pos + 1).cast("int"))
    }: _*)
  }

  /** (doc_id, n_tokens, sum_est, avg_est) for every document with ≥ 1
    * token: `sum_est` totals the sketched frequency over the doc's token
    * occurrences — [[TermCommonness.score]]'s `sum_term_freq` computed
    * through the fixed-size artifact (≥ it, by the overcount guarantee);
    * one final IEEE division for the average. One scan, no joins. */
  def commonnessReport(docs: DataFrame, idCol: String, textCol: String,
      sketch: Array[Array[Long]]): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val fps = graft.functions.GraftFunctions.wordGramHashes(col(textCol), 1)
    docs.select(col(idCol).cast("long").as("doc_id"), fps.as("fps"))
      .filter(size(col("fps")) > 0)
      .select(col("doc_id"), size(col("fps")).cast("long").as("n_tokens"),
        aggregate(col("fps"), lit(0L),
          (acc, fp) => acc + estimateExpr(fp, sketch)).as("sum_est"))
      .select(col("doc_id"), col("n_tokens"), col("sum_est"),
        (col("sum_est").cast("double") / col("n_tokens").cast("double"))
          .as("avg_est"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[buildSketch]] + [[commonnessReport]] over table
    * `documents` — the sketch rebuilt in SQL (same positions, same
    * counts), estimates via `least` over three position joins (safe as
    * inner joins: every probed position holds at least the probing
    * token's own occurrences). */
  def oracleSql: String = {
    val m = mask
    val pos = (i: Int) => s"(fp >> ${i * SliceBits}) & $m"
    s"""WITH occ0 AS (
       |  SELECT doc_id,
       |         ${graft.oracle.Duck.gramHash63Sql("tok")} AS fp
       |  FROM (
       |    SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS tok
       |    FROM documents)),
       |counters AS (
       |  SELECT slice, pos, CAST(count(*) AS BIGINT) AS c FROM (
       |    SELECT unnest([${(0 until Slices).mkString(", ")}]) AS slice,
       |           unnest([${(0 until Slices).map(pos).mkString(", ")}]) AS pos
       |    FROM occ0)
       |  GROUP BY slice, pos),
       |est AS (
       |  SELECT o.doc_id, least(c0.c, c1.c, c2.c) AS e
       |  FROM occ0 o
       |  JOIN counters c0 ON c0.slice = 0 AND c0.pos = ((o.fp >> 0) & $m)
       |  JOIN counters c1 ON c1.slice = 1 AND c1.pos = ((o.fp >> ${SliceBits}) & $m)
       |  JOIN counters c2 ON c2.slice = 2 AND c2.pos = ((o.fp >> ${2 * SliceBits}) & $m))
       |SELECT doc_id,
       |       CAST(count(*) AS BIGINT) AS n_tokens,
       |       CAST(sum(e) AS BIGINT) AS sum_est,
       |       CAST(CAST(sum(e) AS BIGINT) AS DOUBLE)
       |         / CAST(count(*) AS DOUBLE) AS avg_est
       |FROM est GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }
}
