package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.oracle.Duck

/** SimHash document fingerprinting (near-dup dedup family, SURVEY.md §2.6
  * extension): a 32-bit signature whose Hamming distance approximates
  * token-set distance.
  *
  * For each bit i: count tokens whose `rolling_hash` has bit i set; the
  * signature bit is 1 when ≥ half the tokens do (ties round up, documented
  * convention). Entirely stock higher-order functions over one narrow
  * scan — per-row O(32 × tokens) arithmetic inside whole-stage codegen,
  * no shuffle, reproduced bit-exactly by the DuckDB oracle.
  */
object SimHash {
  val Bits = 32

  /** SimHash of a text column (requires GraftFunctions.register), via the
    * single-pass native expression ([[graft.functions.SimHashExpr]]; the
    * HOF formulation it replaced survives as [[hofSimhash]] for the
    * SimHashSpec equivalence gate). */
  def simhash(textCol: String): Column = GraftFunctions.simhash(col(textCol))

  /** The composed-built-ins formulation [[simhash]] replaced. The
    * token-hash array is bound ONCE per row through a lambda variable
    * (`transform(array(...), hs -> ...)[0]`) — inlining it would re-run
    * the regex tokenization + hashing 64× per row (2 uses × 32 bits). */
  private[graft] def hofSimhash(textCol: String): Column = expr(
    s"""transform(
       |  array(transform(regexp_extract_all($textCol, '\\\\S+', 0), t -> rolling_hash(t))),
       |  hs -> aggregate(
       |    sequence(0, ${Bits - 1}), 0L,
       |    (acc, i) -> acc + IF(
       |      2 * size(filter(hs, h -> (shiftright(h, i) % 2) = 1)) >= size(hs),
       |      shiftleft(1L, i), 0L)))[0]""".stripMargin)

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** doc_id + simhash over a documents table. */
  def signatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs.select(col(idCol).as("doc_id"), simhash(textCol).as("simhash"))
      .orderBy("doc_id")
  }

  /** The signature CTE body shared by [[oracleSql]] and
    * [[hammingPairsOracleSql]]: `hs` (per-doc token hashes) and `sig`
    * (doc_id, simhash). */
  private def sigCteSql: String = {
    val rh = Duck.rollingHashSql("t")
    s"""hs AS (
       |  SELECT doc_id,
       |    list_transform(regexp_extract_all(text, '\\S+'), t -> $rh) AS hashes
       |  FROM documents),
       |sig AS (
       |  SELECT doc_id,
       |    CAST(list_sum(list_transform(range(0, $Bits), i ->
       |      CASE WHEN 2 * len(list_filter(hashes, h -> ((h >> i) & 1) = 1)) >= len(hashes)
       |           THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS simhash
       |  FROM hs)""".stripMargin
  }

  /** DuckDB oracle for [[signatures]] on table `documents`. */
  def oracleSql: String =
    s"WITH $sigCteSql\nSELECT doc_id, simhash FROM sig ORDER BY doc_id"

  // ---------------------------------------------------------------------
  // Hamming-ball near-dup pairs (Manku / Jain / Sarma, WWW'07 — the
  // web-crawl simhash dedup): all pairs within Hamming distance
  // `maxDist`, found by EQUI-joins on block combinations, never an
  // all-pairs scan.
  // ---------------------------------------------------------------------

  /** Default Hamming radius: the WWW'07 operating point for near-dup
    * web pages. */
  val DefaultMaxDist = 3

  /** Default block count. Pigeonhole: a pair with ≤ maxDist differing
    * bits leaves ≥ blocks−maxDist blocks untouched, so keying on every
    * (blocks−maxDist)-subset of blocks guarantees each qualifying pair
    * shares at least one key — recall is EXACT, not probabilistic. */
  val DefaultBlocks = 6

  /** Near-even block bit-widths summing to [[Bits]] (wider blocks
    * first); offsets are the running sums. */
  private[graft] def blockLayout(blocks: Int): (Array[Int], Array[Int]) = {
    val widths = Array.tabulate(blocks)(i =>
      Bits / blocks + (if (i < Bits % blocks) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _).dropRight(1)
    (widths, offsets)
  }

  /** All (blocks−maxDist)-subsets of block indices in lexicographic
    * order — the key tables; order defines the first-qualifying-combo
    * uniqueness rule. */
  private[graft] def combos(blocks: Int, maxDist: Int): Array[Array[Int]] =
    (0 until blocks).combinations(blocks - maxDist).map(_.toArray).toArray

  /** Per-combo XOR masks: combo c qualifies for a pair iff
    * `(sigA ^ sigB) & mask(c) == 0` (all the combo's blocks agree). */
  private def comboMasks(blocks: Int, maxDist: Int): Array[Long] = {
    val (widths, offsets) = blockLayout(blocks)
    combos(blocks, maxDist).map(_.map(b =>
      ((1L << widths(b)) - 1) << offsets(b)).reduce(_ | _))
  }

  /** All document pairs within Hamming distance `maxDist` of each other
    * on the 32-bit simhash — `(doc_a < doc_b, hamming)`.
    *
    * Scale shape (the reason this is not a self-join on nothing): each
    * doc emits one slim row (combo, key, id, sig — ~28 B) per block
    * combination; pairs can only form inside an equal-(combo, key)
    * cell, and the per-cell scan is quadratic ONLY in cell population,
    * which the key width bounds: with the defaults the key carries
    * 15–16 signature bits, so random cells hold ~n/2^15 docs, and
    * dup-dense cells (identical signatures) hit the same
    * `spark.graft.maxCellMembers` loud-failure contract as the MinHash
    * family — run exact dedup (q20) first. At 100 TB the published
    * design widens the fingerprint (64-bit simhash → 32-bit combo
    * keys); the combinatorics here are width-agnostic.
    *
    * Exactness: pigeonhole guarantees every true pair shares ≥ 1 combo
    * key (see [[DefaultBlocks]]); the in-cell `hamming ≤ maxDist` check
    * removes false candidates; and each pair is emitted from its FIRST
    * qualifying combo only (checked from the two signatures both rows
    * carry, the [[MinHashDedup.candidatePairs]] first-agreeing-band
    * rule), so the output is unique without a dedup shuffle. */
  def hammingPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = DefaultMaxDist, blocks: Int = DefaultBlocks): DataFrame =
    hammingPairsFromSignatures(
      signatures(docs, idCol, textCol), maxDist, blocks)

  /** [[hammingPairs]] over a precomputed `(doc_id, simhash)` table —
    * the deployment entry point when signatures persist as a sidecar. */
  def hammingPairsFromSignatures(sig: DataFrame,
      maxDist: Int = DefaultMaxDist, blocks: Int = DefaultBlocks): DataFrame = {
    require(blocks > maxDist && maxDist >= 0,
      s"need blocks > maxDist >= 0, got blocks=$blocks maxDist=$maxDist")
    val spark = sig.sparkSession
    import spark.implicits._
    val (widths, offsets) = blockLayout(blocks)
    val cs = combos(blocks, maxDist)
    val masks = comboMasks(blocks, maxDist)
    // One struct per combo: key = the combo's block values concatenated
    // (pure shift/mask arithmetic, codegen'd; no hashing — the key IS
    // the bits, so cell-key collisions cannot exist).
    val emitSql = cs.zipWithIndex.map { case (c, ci) =>
      val key = c.map(b => s"(shiftright(simhash, ${offsets(b)}) & ${(1L << widths(b)) - 1}L)")
        .zip(c.scanRight(0)((b, acc) => acc + widths(b)).drop(1))
        .map { case (v, sh) => s"shiftleft($v, $sh)" }.mkString(" | ")
      s"struct($ci AS combo, CAST($key AS BIGINT) AS ckey)"
    }.mkString("array(", ", ", ")")
    val cells = sig.select(col("doc_id"), col("simhash"),
        explode(expr(emitSql)).as("e"))
      .select(col("e.combo").as("combo"), col("e.ckey").as("ckey"),
        col("doc_id"), col("simhash"))
    val bound = spark.conf
      .get("spark.graft.maxCellMembers", MinHashDedup.DefaultMaxCellMembers.toString).toLong
    // Singleton prune + the loud hot-cell contract, riding the same
    // count aggregate (the MinHash hotCellMembers pattern).
    val hot = cells.groupBy("combo", "ckey").agg(count(lit(1)).as("n"))
      .filter(expr(
        s"CASE WHEN n > ${bound}L THEN CAST(raise_error(CONCAT(" +
          s"'simhash hot cell of ', n, ' members exceeds " +
          s"spark.graft.maxCellMembers=$bound: a cell this size means " +
          s"near-identical documents at mass scale — run exact dedup " +
          s"(q20) first, or widen the fingerprint so combo keys carry " +
          s"more bits')) AS BOOLEAN) ELSE n >= 2 END"))
      .select("combo", "ckey")
    cells.join(hot, Seq("combo", "ckey"))
      .select(col("combo"), col("ckey"), col("doc_id"), col("simhash"))
      .as[(Int, Long, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroups { (key: (Int, Long), it: Iterator[(Int, Long, Long, Long)]) =>
        val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
        val sigs = scala.collection.mutable.ArrayBuffer.empty[Long]
        it.foreach { r => ids += r._3; sigs += r._4 }
        val n = ids.length
        val order = Array.range(0, n).sortBy(ids(_))
        val out = Seq.newBuilder[(Long, Long, Long)]
        var oi = 0
        while (oi < n) {
          val i = order(oi)
          var oj = oi + 1
          while (oj < n) {
            val j = order(oj)
            val x = sigs(i) ^ sigs(j)
            if (java.lang.Long.bitCount(x) <= maxDist) {
              // first qualifying combo == this cell's combo → emit once
              var first = -1
              var c = 0
              while (first < 0 && c < masks.length) {
                if ((x & masks(c)) == 0L) first = c else c += 1
              }
              if (first == key._1)
                out += ((ids(i), ids(j), java.lang.Long.bitCount(x).toLong))
            }
            oj += 1
          }
          oi += 1
        }
        out.result().iterator
      }
      .toDF("doc_a", "doc_b", "hamming")
  }

  /** DuckDB oracle for [[hammingPairs]] on table `documents` — the
    * deliberately quadratic reference shape (fine at oracle scale;
    * the operator's point is avoiding it). */
  def hammingPairsOracleSql(maxDist: Int = DefaultMaxDist): String =
    s"""WITH $sigCteSql
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxDist
       |ORDER BY doc_a, doc_b""".stripMargin
}
