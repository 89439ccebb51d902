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

  /** Bit width of [[signatures62]] (declared beside [[Bits]]:
    * [[DefaultWidth]] below reads it at object init, and a forward
    * reference would silently initialize to 0). */
  val WideBits = 62

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

  /** Near-even block bit-widths summing to `bits` (wider blocks
    * first); offsets are the running sums. */
  private[graft] def blockLayout(bits: Int, blocks: Int): (Array[Int], Array[Int]) = {
    val widths = Array.tabulate(blocks)(i =>
      bits / blocks + (if (i < bits % blocks) 1 else 0))
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
  private def comboMasks(bits: Int, blocks: Int, maxDist: Int): Array[Long] = {
    val (widths, offsets) = blockLayout(bits, blocks)
    combos(blocks, maxDist).map(_.map(b =>
      ((1L << widths(b)) - 1) << offsets(b)).reduce(_ | _))
  }

  /** Deployment-default fingerprint width (VERDICT r14 item 5): the
    * 62-bit form. The 32-bit form relies on signature collapse to keep
    * cells under the cap (the first cut's 132k-member cell raise,
    * SCALING.md); the wide form is strictly sharper — measured 29×
    * fewer false candidate pairs at 64× with cells orders of magnitude
    * under the cap — so width is a parameter and 62 is what a 100 TB
    * deployment should run. 32 stays available (and q97/q104 register
    * it) because its oracle replays that exact ball. */
  val DefaultWidth = WideBits

  /** All document pairs within Hamming distance `maxDist` of each other
    * on the `width`-bit simhash — `(doc_a < doc_b, hamming)`. `width`
    * picks the fingerprint family: 32 ([[signatures]]) or 62
    * ([[signatures62]], the [[DefaultWidth]]); note the two widths
    * measure DIFFERENT Hamming balls (different vote bits), so they are
    * distinct detectors, not interchangeable settings of one.
    *
    * Two-level scale shape: identical signatures collapse FIRST, so the
    * banding/cell machinery ([[hammingSigPairs]]) runs over DISTINCT
    * fingerprints — its quadratic cell scans are bounded by signature
    * ENTROPY, not corpus size (a dup-dense corpus has few distinct
    * sigs; the first cut banded documents directly and the 64× probe's
    * hottest cell held 132k rows where the distinct-sig form holds the
    * cell's distinct values only). Doc-level pairs then come from
    * joining the members table onto the sig-pair frame — output-sized
    * work, which is the irreducible cost of materializing the true
    * answer (on a replica-dense corpus the answer itself is quadratic
    * in cluster sizes; the sig-pair form with multiplicities is the
    * product that stays small, which is why it is exposed separately).
    *
    * Exactness: pigeonhole guarantees every true pair shares ≥ 1 combo
    * key (see [[DefaultBlocks]]); the in-cell `hamming ≤ maxDist` check
    * removes false candidates; each DISTINCT-sig pair is emitted from
    * its FIRST qualifying combo only (the
    * [[MinHashDedup.candidatePairs]] first-agreeing-band rule), and
    * every document belongs to exactly one signature group, so the
    * doc-pair expansion is unique without any dedup shuffle. */
  def hammingPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = DefaultMaxDist, blocks: Int = DefaultBlocks,
      width: Int = DefaultWidth): DataFrame = width match {
    case Bits => hammingPairsFromSignatures(
      signatures(docs, idCol, textCol), maxDist, blocks, Bits)
    case WideBits => hammingPairsFromSignatures(
      signatures62(docs, idCol, textCol), maxDist, blocks, WideBits)
    case other => sys.error(
      s"hammingPairs: width must be $Bits or $WideBits, got $other")
  }

  /** [[hammingPairs]] over a precomputed `(doc_id, simhash)` table —
    * the deployment entry point when signatures persist as a sidecar. */
  def hammingPairsFromSignatures(sig: DataFrame,
      maxDist: Int = DefaultMaxDist, blocks: Int = DefaultBlocks,
      bits: Int = Bits): DataFrame = {
    // BARRIER, not a lazy register (r21): members feeds the sig-group
    // aggregate AND both sides of the doc expansion join — the join's
    // exchanges launch concurrently, and racing the unfilled cache
    // re-ran the whole signature subtree per side (profiled at sf0.1:
    // two identical 0.86 s stages back to back in q104/q97).
    val members = graft.ops.Materialize.barrier(
      sig.select(col("doc_id"), col("simhash")))
    // sigPairs feeds BOTH union branches below (cross + self) — without
    // its own barrier the whole combo-cell explode + quadratic cell
    // scan ran twice, once per branch (profiled at sf0.1: two identical
    // 0.5–0.7 s stage pairs in q97/q104). The frame is entropy-bounded
    // (distinct-sig pairs), so the cache is small by contract.
    val sigPairs = graft.ops.Materialize.barrier(hammingSigPairs(
      members.groupBy("simhash").agg(count(lit(1)).as("n")),
      maxDist, blocks, bits))
    // Doc expansion — ONE two-join pass over the whole sig-pair frame
    // (r21: the cross/self split ran FOUR member joins and a union;
    // the unified filter below keeps the identical row set with two).
    // Each unordered doc pair meets exactly once: cross rows
    // (sig_a < sig_b, one row per sig pair; one signature per doc)
    // pair each sig_a member with each sig_b member once, orientation
    // fixed by least/greatest; the self row (sig_a = sig_b, the m ≥ 2
    // groups' distance-0 pairs) expands to m×m combos of which
    // `id_a < id_b` keeps each unordered pair once — and for those
    // rows least/greatest is the identity. AQE sizes both joins — the
    // sig-pair frame is entropy-bounded and usually broadcasts.
    sigPairs
      .join(members.select(col("simhash").as("sig_a"), col("doc_id").as("id_a")), "sig_a")
      .join(members.select(col("simhash").as("sig_b"), col("doc_id").as("id_b")), "sig_b")
      .filter(col("sig_a") =!= col("sig_b") || col("id_a") < col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"), col("hamming"))
  }

  /** The signature-group form — the product that stays small on
    * dup-dense corpora: `(sig_a ≤ sig_b, hamming, n_a, n_b)` for every
    * DISTINCT signature pair within `maxDist` (including the
    * self row (s, s, 0, m, m) for groups with m ≥ 2 members, which
    * stands for the group's C(m,2) identical-fingerprint doc pairs).
    * `n_a·n_b` (or C(m,2)) is the doc-pair multiplicity, so cluster
    * mass is readable without materializing the quadratic expansion.
    *
    * Input `sigGroups` must be `(simhash, n)` — one row per distinct
    * signature with its member count. Each distinct sig emits one slim
    * row per block combination; pairs form only inside equal-
    * (combo, key) cells; the per-cell quadratic scan is over distinct
    * signatures in the cell, capped by the shared
    * `spark.graft.maxCellMembers` loud-failure contract (a breach now
    * means the KEY WIDTH is exhausted — widen the fingerprint — rather
    * than "the corpus has duplicates", which the sig-collapse absorbs
    * structurally). */
  def hammingSigPairs(sigGroups: DataFrame,
      maxDist: Int = DefaultMaxDist, blocks: Int = DefaultBlocks,
      bits: Int = Bits): DataFrame = {
    require(blocks > maxDist && maxDist >= 0,
      s"need blocks > maxDist >= 0, got blocks=$blocks maxDist=$maxDist")
    val spark = sigGroups.sparkSession
    import spark.implicits._
    val (widths, offsets) = blockLayout(bits, blocks)
    val cs = combos(blocks, maxDist)
    val masks = comboMasks(bits, blocks, maxDist)
    // One struct per combo: key = the combo's block values concatenated
    // (pure shift/mask arithmetic, codegen'd; no hashing — the key IS
    // the bits, so cell-key collisions cannot exist).
    val emitSql = cs.zipWithIndex.map { case (c, ci) =>
      val key = c.map(b => s"(shiftright(simhash, ${offsets(b)}) & ${(1L << widths(b)) - 1}L)")
        .zip(c.scanRight(0)((b, acc) => acc + widths(b)).drop(1))
        .map { case (v, sh) => s"shiftleft($v, $sh)" }.mkString(" | ")
      s"struct($ci AS combo, CAST($key AS BIGINT) AS ckey)"
    }.mkString("array(", ", ", ")")
    // Same barrier rationale: distinctSigs feeds the combo-cell explode
    // AND the self-pair union, which execute as concurrent branches of
    // the final job.
    val distinctSigs = graft.ops.Materialize.barrier(
      sigGroups.select(col("simhash").cast("long").as("simhash"),
        col("n").cast("long").as("n")))
    val cells = distinctSigs.select(col("simhash"), col("n"),
        explode_outer(expr(emitSql)).as("e"))
      .filter(col("e").isNotNull)
      .select(col("e.combo").as("combo"), col("e.ckey").as("ckey"),
        col("simhash"), col("n"))
    val bound = spark.conf
      .get("spark.graft.maxCellMembers", MinHashDedup.DefaultMaxCellMembers.toString).toLong
    // Singleton prune + the loud hot-cell contract, riding the same
    // count aggregate (the MinHash hotCellMembers pattern). Counts are
    // DISTINCT SIGNATURES per cell.
    val hot = cells.groupBy("combo", "ckey").agg(count(lit(1)).as("cn"))
      .filter(expr(
        s"CASE WHEN cn > ${bound}L THEN CAST(raise_error(CONCAT(" +
          s"'simhash hot cell of ', cn, ' DISTINCT signatures exceeds " +
          s"spark.graft.maxCellMembers=$bound: identical signatures are " +
          s"already collapsed, so a cell this size means the combo key " +
          s"width is exhausted for this corpus — widen the fingerprint " +
          s"so combo keys carry more bits')) AS " +
          s"BOOLEAN) ELSE cn >= 2 END"))
      .select("combo", "ckey")
    // Quadratic cell scan per (combo, ckey) group. Shaped as an
    // EXPLICIT repartition (spark.sql.shuffle.partitions — the
    // deployment's width knob) + in-partition sort + a streaming
    // group-run scan rather than groupByKey.flatMapGroups (r21): the
    // cell rows are BYTE-tiny (a few KB at fixture scale) while the
    // per-cell work is quadratic in distinct signatures, so AQE's
    // byte-based coalescing merged the whole scan into ONE task
    // (profiled: a 1.0 s single-task stage under 7 KB of shuffle
    // input). The explicit width pins the compute's parallelism to
    // the session's shuffle setting; the shuffle + sort cost is the
    // same one flatMapGroups paid.
    // "auto" is a legal value on some distros (ADVICE r21): fall back
    // to the cluster default parallelism when the conf is non-numeric.
    val shuffleN = scala.util.Try(
        spark.conf.get("spark.sql.shuffle.partitions").toInt)
      .getOrElse(spark.sparkContext.defaultParallelism)
    def cellCross(combo: Int,
        sigs: scala.collection.mutable.ArrayBuffer[Long],
        ns: scala.collection.mutable.ArrayBuffer[Long])
        : Iterator[(Long, Long, Long, Long, Long)] = {
      val n = sigs.length
      val order = Array.range(0, n).sortBy(sigs(_))
      val out = Seq.newBuilder[(Long, Long, Long, Long, Long)]
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
            if (first == combo)
              out += ((sigs(i), sigs(j),
                java.lang.Long.bitCount(x).toLong, ns(i), ns(j)))
          }
          oj += 1
        }
        oi += 1
      }
      out.result().iterator
    }
    val cross = cells.join(hot, Seq("combo", "ckey"))
      .select(col("combo"), col("ckey"), col("simhash"), col("n"))
      .as[(Int, Long, Long, Long)]
      .repartition(shuffleN, col("combo"), col("ckey"))
      .sortWithinPartitions(col("combo"), col("ckey"))
      .mapPartitions { it =>
        val b = it.buffered
        new Iterator[Iterator[(Long, Long, Long, Long, Long)]] {
          def hasNext: Boolean = b.hasNext
          def next(): Iterator[(Long, Long, Long, Long, Long)] = {
            val (combo, ckey) = (b.head._1, b.head._2)
            val sigs = scala.collection.mutable.ArrayBuffer.empty[Long]
            val ns = scala.collection.mutable.ArrayBuffer.empty[Long]
            while (b.hasNext && b.head._1 == combo && b.head._2 == ckey) {
              val r = b.next(); sigs += r._3; ns += r._4
            }
            cellCross(combo, sigs, ns)
          }
        }.flatten
      }
      .toDF("sig_a", "sig_b", "hamming", "n_a", "n_b")
    val self = distinctSigs.filter(col("n") >= 2)
      .select(col("simhash").as("sig_a"), col("simhash").as("sig_b"),
        lit(0L).as("hamming"), col("n").as("n_a"), col("n").as("n_b"))
    cross.unionAll(self)
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

  // ---------------------------------------------------------------------
  // Wide (62-bit) fingerprint — the "widen the fingerprint" path of the
  // hot-cell contract, exercised rather than documented: two independent
  // polynomial simhashes (multipliers 31 and 37) truncate to 31 bits
  // each and concatenate, so combo keys carry ~31 signature bits
  // (2^15× more key space than the 32-bit default) and stay positive in
  // a BIGINT for both engines.
  // ---------------------------------------------------------------------

  /** doc_id + 62-bit wide simhash over a documents table. */
  def signatures62(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs.select(col(idCol).as("doc_id"),
      (GraftFunctions.simhash(col(textCol)).bitwiseAND(lit(0x7FFFFFFFL))
        .bitwiseOR(shiftleft(
          GraftFunctions.simhash37(col(textCol)).bitwiseAND(lit(0x7FFFFFFFL)),
          31))).as("simhash"))
  }

  /** [[hammingPairs]] on the wide fingerprint — same combinatorics,
    * 31-bit combo keys. Note the Hamming BALL differs from the 32-bit
    * form's (it is measured over different vote bits): wider keys buy
    * both cell headroom AND discrimination (unrelated docs that collide
    * in 32 bits separate in 62), which is why the two are distinct
    * registered queries rather than interchangeable settings. */
  def hammingPairsWide(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = DefaultMaxDist, blocks: Int = DefaultBlocks): DataFrame =
    hammingPairs(docs, idCol, textCol, maxDist, blocks, width = WideBits)

  /** The wide-signature CTE (`sig` = doc_id, 62-bit simhash). */
  private def sig62CteSql: String = {
    def half(mult: Int, name: String): String = {
      val rh = Duck.rollingHashSql("t", mult)
      s"""$name AS (
         |  SELECT doc_id,
         |    CAST(list_sum(list_transform(range(0, 31), i ->
         |      CASE WHEN 2 * len(list_filter(hashes, h -> ((h >> i) & 1) = 1)) >= len(hashes)
         |           THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS s
         |  FROM (
         |    SELECT doc_id,
         |      list_transform(regexp_extract_all(text, '\\S+'), t -> $rh) AS hashes
         |    FROM documents))""".stripMargin
    }
    s"""${half(31, "lo")},
       |${half(37, "hi")},
       |sig AS (
       |  SELECT doc_id, lo.s | (hi.s << 31) AS simhash
       |  FROM lo JOIN hi USING (doc_id))""".stripMargin
  }

  /** DuckDB oracle for [[hammingPairsWide]] on table `documents`. */
  def hammingPairsWideOracleSql(maxDist: Int = DefaultMaxDist): String =
    s"""WITH $sig62CteSql
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxDist
       |ORDER BY doc_a, doc_b""".stripMargin

  /** DuckDB oracle for [[hammingSigPairs]] over the `documents`
    * signature groups — quadratic over DISTINCT signatures. */
  def hammingSigPairsOracleSql(maxDist: Int = DefaultMaxDist): String =
    s"""WITH $sigCteSql,
       |groups AS (
       |  SELECT simhash, CAST(count(*) AS BIGINT) AS n
       |  FROM sig GROUP BY simhash)
       |SELECT * FROM (
       |  SELECT a.simhash AS sig_a, b.simhash AS sig_b,
       |    CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming,
       |    a.n AS n_a, b.n AS n_b
       |  FROM groups a JOIN groups b ON a.simhash < b.simhash
       |  WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxDist
       |  UNION ALL
       |  SELECT simhash, simhash, CAST(0 AS BIGINT), n, n
       |  FROM groups WHERE n >= 2)
       |ORDER BY sig_a, sig_b""".stripMargin
}
