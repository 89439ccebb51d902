package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.oracle.Duck

/** MinHash + LSH-banded near-duplicate detection over a document corpus —
  * the scale path for fuzzy dedup in a training-data pipeline.
  *
  * Pipeline (all stock codegen'd higher-order functions, one narrow pass
  * per doc, one shuffle for the band join):
  *
  *   1. shingle: distinct `rolling_hash` of every `ShingleK`-char window —
  *      a per-row `transform`, no explode, no shuffle;
  *   2. signature: `NumHashes` permutation-mins `(a_j*s + b_j) mod P` —
  *      per-row arithmetic on the shingle array;
  *   3. banding: `Bands` keys of `RowsPerBand` signature slots; candidate
  *      pairs are generated ONLY within equal (band, key) buckets — the
  *      self-join shuffles on the band key, never the quadratic all-pairs;
  *   4. estimate: fraction of agreeing signature slots, thresholded.
  *
  * At 100 TB the cost is dominated by the band-key shuffle, which is
  * |docs|×Bands rows of (id, 4 longs) — not |docs|² — and skew only occurs
  * where true near-duplicate clusters exist (AQE splits those buckets).
  *
  * All arithmetic is 64-bit-overflow-free (`a_j < 1e9`, shingle < 2^32 ⇒
  * product < 2^62), so the DuckDB oracle reproduces every signature
  * bit-exactly ([[oracleSql]]).
  */
object MinHashDedup {
  // Parameters live with the native expression; the oracle renders the
  // same constants.
  val ShingleK: Int = graft.functions.MinHashSigExpr.ShingleK
  val NumHashes: Int = graft.functions.MinHashSigExpr.NumHashes
  val Bands: Int = graft.functions.SigCompare.Bands
  val RowsPerBand: Int = graft.functions.SigCompare.RowsPerBand
  val P: Long = graft.functions.MinHashSigExpr.P
  val A: IndexedSeq[Long] = graft.functions.MinHashSigExpr.A.toIndexedSeq
  val B: IndexedSeq[Long] = graft.functions.MinHashSigExpr.B.toIndexedSeq

  /** doc_id + distinct shingle-hash set (SORTED array of ints — the
    * bijective 32-bit wrap of the rolling hashes, halving the join
    * payload), via the single-pass native expression
    * ([[graft.functions.ShingleSetExpr]]; the HOF long-array formulation
    * it replaced survives as [[hofShingled]] for the equivalence gate). */
  def shingled(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs
      .filter(length(col(textCol)) >= ShingleK)
      .select(col(idCol).as("doc_id"),
        GraftFunctions.shingleSet(col(textCol)).as("shingles"))
  }

  /** The composed-built-ins formulation [[shingled]] replaced (char
    * windows — PipelineSpec pins native ≡ HOF on the ASCII fixture). */
  private[graft] def hofShingled(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs
      .filter(length(col(textCol)) >= ShingleK)
      .select(col(idCol).as("doc_id"), expr(
        s"array_distinct(transform(sequence(1, char_length($textCol) - ${ShingleK - 1}), " +
          s"i -> rolling_hash(substring($textCol, i, $ShingleK))))").as("shingles"))
  }

  /** doc_id + minhash signature (array of NumHashes longs), via the
    * single-pass native expression ([[graft.functions.MinHashSigExpr]]);
    * numerically identical to mapping `(s*a_j + b_j) % P` over the
    * distinct shingle set and taking minima. */
  def signatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs
      .filter(length(col(textCol)) >= ShingleK)
      .select(col(idCol).as("doc_id"),
        GraftFunctions.minhashSig(col(textCol)).as("sig"))
  }

  /** Banded candidate pairs (doc_a < doc_b, est_sim) from a signature
    * table: the LSH blocking step — pairs come only from equal
    * (band, key) buckets.
    *
    * Each pair is emitted from its FIRST agreeing band only: the join
    * carries the full signature and requires every earlier band to
    * DISAGREE, so the output is unique by construction and the
    * deduplicating shuffle of the raw pair stream disappears. That
    * stream is where duplication explodes: members of a true near-dup
    * cluster agree on ALL bands, so the naive join emits every cluster
    * pair `Bands` times — the 64×-corpus probe (SCALING.md) measured
    * 46M raw rows distinct-shuffled down to 11.6M; the first-band rule
    * emits the 11.6M directly. Cost: `NumHashes` longs ride the small
    * banding shuffle instead of `RowsPerBand`.
    *
    * `est_sim` (fraction of agreeing signature slots) is computed HERE,
    * in the join's output projection, as 16 scalar equality terms: both
    * full signatures are already in hand for the first-band condition,
    * so estimating costs no allocation and no extra operator — where
    * joining the signature table back onto the pair stream (the previous
    * shape) shuffled two 128-byte signature payloads per 11.6M-row join,
    * twice. */
  def candidatePairs(sig: DataFrame): DataFrame = {
    val spark = sig.sparkSession
    import spark.implicits._
    // Grouped-cell emission (round 7): the band self-join (kept as
    // [[joinCandidatePairs]], equivalence-pinned) produced one joined
    // row per (pair, agreeing band) BEFORE the first-band filter — a
    // dup-dense cluster agrees on ALL bands, so the 64× probe's 11.6M
    // unique pairs surfaced as ~160M joined rows, each paying the
    // generated consume path plus two native sig calls. Here each hot
    // (band, bucket) cell gathers its members' signatures once (~130 B
    // each, ≤ Bands memberships per doc) and a primitive loop emits
    // exactly the first-band pairs — the uniqueness rule costs an
    // early-exit signature scan instead of a 14×-overproduced join.
    //
    // Correctness mirrors jaccardPairs' grouped verify: singleton
    // buckets are pruned before the gather; the hashed cell key is
    // collision-safe because band membership is re-verified from the
    // signatures in the loop (firstAgreeingBand == this cell's band
    // implies THIS band's slices agree); est_sim is the same
    // agree-count / NumHashes single IEEE division.
    val pairs = hotCellMembers(sig)
      .select(col("band"), col("cell"), col("doc_id"), col("sig"))
      .as[(Int, Long, Long, Array[Long])]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroups { (key: (Int, Long), it: Iterator[(Int, Long, Long, Array[Long])]) =>
        val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
        val sigs = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
        it.foreach { case (_, _, id, sg) => ids += id; sigs += sg }
        cellPairScan(ids)(
          (i, j) => firstAgreeingBand(sigs(i), sigs(j)) == key._1,
          (i, j) => agreeFraction(sigs(i), sigs(j)), _ => true)
      }
      .toDF("doc_a", "doc_b", "est_sim")
    // Rows are already unique (first-band rule); this distinct is the
    // STATS BARRIER the join form carried: the object-boundary output
    // has no usable stats, and without an aggregate node downstream
    // joins have been measured (64× probe, round 6) to BROADCAST the
    // whole banding subtree and rebuild it once per consumer. The
    // exchange carries the unique pairs once — ~25 B/row.
    pairs.distinct()
  }

  /** The band self-join formulation [[candidatePairs]] replaced — kept
    * as the equivalence-test mirror (PipelineSpec pins identical pairs
    * and est_sim bits on the dup-dense fixture). */
  private[graft] def joinCandidatePairs(sig: DataFrame): DataFrame = {
    val bands = sig.select(col("doc_id"), col("sig"),
        explode(expr(s"transform(sequence(0, ${Bands - 1}), " +
          s"b -> struct(b AS band, slice(sig, b * $RowsPerBand + 1, $RowsPerBand) AS bkey))")).as("bd"))
      .select(col("doc_id"), col("sig"), col("bd.band").as("band"), col("bd.bkey").as("bkey"))
    // For the joined band b: no earlier band b' may agree — one mask
    // test over the native sig_band_mask call; both comparison
    // primitives are SINGLE STATIC CALLS (the JIT huge-method lesson,
    // see SigCompareExpr).
    val firstBandOnly =
      expr("(sig_band_mask(l.sig, r.sig) & (shiftleft(1, l.band) - 1)) = 0")
    bands.as("l").join(bands.as("r"),
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
          col("l.doc_id") < col("r.doc_id") && firstBandOnly)
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        expr(s"sig_agree_count(l.sig, r.sig) / CAST($NumHashes AS DOUBLE)")
          .as("est_sim"))
      .distinct()
  }

  /** Near-duplicate pairs (doc_a < doc_b) with estimated Jaccard ≥ minSim.
    * The signature table is cached for the query's lifetime: it is the
    * REDUCED representation (16 longs/doc, ~200 bytes) feeding both sides
    * of the banding self-join — caching it avoids re-shingling the corpus
    * per branch, and at 100 TB of raw text the signatures are still only
    * ~GBs. est_sim rides out of the band join itself (see
    * [[candidatePairs]]), so no further joins touch the pair stream. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      minSim: Double): DataFrame = {
    // No barrier: candidatePairs consumes sig through ONE subtree (the
    // banding explode), so the cache fills on first use — registered so
    // session owners can release it (graft.ops.Materialize, r8 item 1).
    val sig = graft.ops.Materialize.register(signatures(docs, idCol, textCol))
    candidatePairs(sig)
      .filter(col("est_sim") >= minSim)
      .orderBy("doc_a", "doc_b")
  }

  /** LSH-blocked TRUE n-gram Jaccard: banded candidates verified against
    * the exact shingle sets (the verify stage of a production dedup
    * pipeline — estimate blocks, exact similarity decides).
    *
    * Only CANDIDATE documents are shingled (left-semi pushdown): at 100 TB
    * the full corpus flows through the cheap single-pass signature, and
    * the expensive exact shingle materialization touches just the few
    * docs that banded into a shared bucket. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      minJac: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // The verify output is REGISTERED (lazy, pair-sized) before the
    // presentation orderBy: a global sort over an object-boundary
    // operator runs the upstream TWICE — the range-partitioner sampling
    // job and the real exchange each re-read the gathered cells and
    // re-run the quadratic verify (measured at the 64× probe: two
    // back-to-back 1.29 GB-read stages, ~1.6 s of duplicated scan
    // work). The cache fills under the sampling job (one consumer
    // subtree, no concurrent-branch race) and the exchange reads it.
    // The sibling scorers are protected by their distinct() already.
    graft.ops.Materialize.register(
      scoredCellGroups[(Long, Long, Double)](hotShingledCells(docs, idCol, textCol)) {
        (band, _, ids, sigs, sets) =>
          cellPairScan(ids)(
            (i, j) => firstAgreeingBand(sigs(i), sigs(j)) == band,
            { (i, j) =>
              val inter = sortedIntersect(sets(i), sets(j))
              inter / (sets(i).length + sets(j).length - inter).toDouble
            }, _ >= minJac)
      }.toDF("doc_a", "doc_b", "jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Asymmetric CONTAINMENT over the same LSH-candidate pairs:
    * `|A∩B| / min(|A|, |B|)` — near 1.0 when the smaller document's
    * shingles sit inside the larger (quote inclusion, page subsumption,
    * article + boilerplate wrapper), a relation symmetric Jaccard
    * under-reports exactly when the size ratio is largest. Output
    * carries both set sizes so the consumer knows WHICH side is the
    * contained one.
    *
    * Honest scope note: candidates here come from symmetric MinHash
    * banding, whose est-Jaccard recall DROPS as sizes diverge (a tiny
    * quote inside a huge page rarely bands) — this reports containment
    * among near-dup candidates with bounded compute. Indexing the
    * small-inside-large case needs a different candidate generator, not
    * a different verifier: [[stratifiedContainmentPairs]] feeds the same
    * verify stage from size-stratified sampled-shingle cells. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      minCont: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Registered before the presentation orderBy for the same
    // double-verify reason as [[jaccardPairs]].
    graft.ops.Materialize.register(
      scoredCellGroups[(Long, Long, Long, Long, Double)](hotShingledCells(docs, idCol, textCol)) {
        (band, _, ids, sigs, sets) =>
          // Per-cell id → set size, attached after the shared scan (cells
          // are maxCellMembers-bounded, so the map is task-local small).
          val size = ids.iterator.zip(sets.iterator.map(_.length)).toMap
          cellPairScan(ids)(
            (i, j) => firstAgreeingBand(sigs(i), sigs(j)) == band,
            { (i, j) =>
              val inter = sortedIntersect(sets(i), sets(j))
              inter / math.min(sets(i).length, sets(j).length).toDouble
            }, _ >= minCont).map { case (a, b, c) =>
            (a, b, size(a).toLong, size(b).toLong, c)
          }
      }.toDF("doc_a", "doc_b", "n_a", "n_b", "containment"))
      .orderBy("doc_a", "doc_b")
  }

  /** Expected sampled shingles per document at its own stratum's level —
    * the recall knob of [[stratifiedContainmentPairs]]: a fully
    * contained document misses only if NONE of its ~SampleTarget..2×
    * level-sampled shingles survive, ≈ e^-SampleTarget ≈ 0.03%. */
  val SampleTarget: Int = 8

  /** DEFAULT largest stratum gap the stratified index covers — size
    * ratios up to ~2^(StrataSpan+1). Emission per document is ≤
    * ~2·SampleTarget·2^min(span, t) slim rows REGARDLESS of document
    * size (the geometric level sum telescopes), so the cost model of the
    * span knob is: widening the span by one level DOUBLES the per-unit
    * emission bound, paid ONLY by documents whose own stratum t exceeds
    * the span (the big side samples down to its floor level; small
    * documents already emit everything above their stratum). Every
    * stratified entry point takes `span` as a parameter (VERDICT r11
    * item 2 — a 100-shingle quote inside a multi-megabyte page needs
    * span ≈ log2 of the size ratio); this default keeps q62/q65/q67's
    * published semantics. Pairs beyond the configured span remain the
    * documented out-of-scope case. */
  val StrataSpan: Int = 6

  /** Stop-shingle bound: a sampled shingle indexed by more than this
    * many documents is boilerplate, not subsumption evidence (a
    * common 8-char window — " the and " — would otherwise turn its cell
    * into an all-pairs scan). Cells past the bound are DROPPED, the
    * standard prefix-filtering move; deterministic, and mirrored by the
    * oracle's HAVING, so both engines drop identically. This also caps
    * the per-cell quadratic scan at MaxKeyDf members, which is why the
    * stratified path needs no maxCellMembers-style raise. */
  val MaxKeyDf: Int = 64

  /** Size-stratified containment discovery — the candidate generator for
    * the small-inside-large subsumption case that [[containmentPairs]]'s
    * symmetric bands systematically miss (a 60-char quote inside a
    * 3500-char page has est-Jaccard ≈ 0.02: no band ever agrees).
    *
    * Universe-sampling inverted index (the LSH-Ensemble idea — Zhu et
    * al., VLDB'16 — reduced to deterministic trailing-zero sampling):
    *
    *   1. stratum t = ⌊log2(max(windowCount div SampleTarget, 1))⌋, from
    *      the scan-cheap window count (length − K + 1) rather than the
    *      distinct set size — the two agree within a stratum for natural
    *      text, and scoring still uses exact distinct sets;
    *   2. every document emits each shingle whose trailing-zero count z
    *      reaches some ACTIVE level in [t − StrataSpan, t] ONCE, keyed
    *      by the shingle value alone — ~SampleTarget·2^min(StrataSpan,t)
    *      slim rows per document in ONE filter pass. (The round-11 first
    *      cut emitted one row per (level, shingle); the level dimension
    *      is redundant — a pair's level eligibility is decidable in-cell
    *      from z, which the KEY itself carries, and the member strata —
    *      and the per-level HOF passes were the measured 64× bottleneck:
    *      42M rows / 13 s of emission collapse to ~21M / one pass.)
    *      Active = levels that are some document's stratum (one cheap
    *      length-only aggregate, ≤64 values — the bounded-driver-
    *      metadata convention), so a corpus with no tiny documents
    *      never pays the dense low levels;
    *   3. a pair sharing a hot cell is eligible iff z ≥ min(t_a, t_b)
    *      (the shingle is sampled at the smaller side's probe level —
    *      where that side has ~SampleTarget sampled shingles) and the
    *      stratum gap is ≤ StrataSpan; it verifies once per common
    *      qualifying shingle (~2·SampleTarget worst case), collapsed by
    *      a bit-exact `distinct`;
    *   4. the verify stage is [[scoredCellGroups]] — the SAME grouped
    *      gather and `inter / min` scoring as [[containmentPairs]], so
    *      the two measures can never diverge on a shared pair.
    *
    * If A ⊆ B with a stratum gap ≤ StrataSpan, they collide unless none
    * of A's ~SampleTarget level-sampled shingles exists (≈ e^-8); the
    * symmetric generator's miss probability at the same size ratio is
    * ~1 − (1 − (|A|/|B|)^RowsPerBand)^Bands ≈ 1. Gaps past StrataSpan
    * and shingles dropped by [[MaxKeyDf]] are the documented recall
    * bounds. Scale shape: slim (key, id, t) rows only through the index
    * shuffle — exact shingle sets ship once per HOT cell membership,
    * merge-joined, never broadcast. */
  def stratifiedContainmentPairs(docs: DataFrame, idCol: String,
      textCol: String, minCont: Double, span: Int = StrataSpan): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    stratifiedCells(docs, idCol, textCol, span) match {
      case None =>
        spark.range(0).select(col("id").as("doc_a"),
          col("id").as("doc_b"), col("id").as("n_a"), col("id").as("n_b"),
          col("id").cast("double").as("containment"))
      case Some(cells) =>
        scoredCellGroups[(Long, Long, Long, Long, Double)](cells) {
          (_, skey, ids, strata, sets) =>
            // The cell key IS the sampled shingle: its trailing zeros
            // decide which probe levels it serves.
            val z = java.lang.Long.numberOfTrailingZeros(skey)
            val size = ids.iterator.zip(sets.iterator.map(_.length)).toMap
            cellPairScan(ids)(
              // Probe-level gate: the shingle must be sampled at the
              // smaller side's stratum (z ≥ min t — strata ride the aux
              // slot) and the pair must be within the indexed span.
              { (i, j) =>
                val (ti, tj) = (strata(i)(0), strata(j)(0))
                z >= math.min(ti, tj) && math.abs(ti - tj) <= span
              },
              { (i, j) =>
                val inter = sortedIntersect(sets(i), sets(j))
                inter / math.min(sets(i).length, sets(j).length).toDouble
              }, _ >= minCont).map { case (a, b, c) =>
              (a, b, size(a).toLong, size(b).toLong, c)
            }
        }.toDF("doc_a", "doc_b", "n_a", "n_b", "containment")
          // A pair verifies once per shared canonical-level cell (≤ ~2×
          // SampleTarget); scores are bit-identical (same sets, same IEEE
          // ops), so distinct collapses them exactly — and doubles as the
          // stats barrier the band path gets from its candidate distinct.
          .distinct()
          .orderBy("doc_a", "doc_b")
    }
  }

  /** Cross-side containment of an ingest INCREMENT against the canonical
    * CORPUS — [[stratifiedContainmentPairs]]'s index applied the
    * [[graft.pipeline.IncrementalDedup]] way: every reported pair has
    * one increment side and one corpus side, never corpus×corpus (the
    * admission question is "does the new document subsume / get
    * subsumed by something we already hold", not "re-scan the corpus
    * against itself"). Both directions of containment are covered —
    * a new quote inside a held page AND a new page swallowing a held
    * quote — because eligibility is the same z ≥ min(t_inc, t_corp)
    * probe-level gate within [[StrataSpan]].
    *
    * Ids must be globally unique across the two frames (they key the
    * shared payload attach). Active levels and the stop-shingle DF
    * bound are computed over the UNION of both sides — a boilerplate
    * shingle is boilerplate regardless of which side carries it. At
    * deployment the corpus-side emission is a STORED sidecar (the q56
    * convention — [[CorpusWriter.writeStratifiedIndex]]); this
    * fixture-bound form recomputes it from text, overstating
    * steady-state cost by the corpus pass (recorded in SCALING.md). The
    * stored-reading overload below is the deployment shape (q67) and is
    * bit-equal by construction: the superset-then-filter identity in its
    * scaladoc reduces its corpus emission to exactly this one.
    *
    * Output: (inc_id, corp_id, n_inc, n_corp, containment) — both set
    * sizes ride along so the consumer knows which side is contained. */
  def incrementalContainmentPairs(corpus: DataFrame, increment: DataFrame,
      idCol: String, textCol: String, minCont: Double,
      span: Int = StrataSpan): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    GraftFunctions.register(spark)
    // ONE barrier on the union's text-decode + shingle pass (r22, same
    // shape as [[stratifiedCells]]); side rides the frame:
    // 1 = increment, 0 = corpus.
    val sh = graft.ops.Materialize.barrier(
      shingledStrata(corpus, idCol, textCol).withColumn("side", lit(0))
        .unionAll(shingledStrata(increment, idCol, textCol)
          .withColumn("side", lit(1))))
    // Active levels over the UNION, read off the cache — not a
    // text-scanning collect per side.
    val active = sh.select(col("t")).distinct().as[Int].collect().sorted
    if (active.isEmpty) return emptyCross(spark)
    val mem = emissionFrom(sh, active, span)
    // Hot cells need a possible cross-side pair: 2..MaxKeyDf members
    // TOTAL (the stop-shingle bound is side-agnostic), at least one
    // member from EACH side, and a possible probe (some member's own
    // stratum sampled here) — all riding one count aggregate.
    val hot = mem.groupBy("skey")
      .agg(count(lit(1)).as("df"),
        sum(col("side")).as("incs"),
        sum(when(expr("(skey & (shiftleft(CAST(1 AS BIGINT), t) - 1)) = 0"),
          1L).otherwise(0L)).as("probes"))
      .filter(col("df") >= 2 && col("df") <= MaxKeyDf &&
        col("incs") >= 1 && col("incs") < col("df") && col("probes") >= 1)
      .select("skey")
    // Barriered (r22 second wave): hotMem feeds TWO consumers (hotIds
    // and the cells join) — unmaterialized, each re-ran the whole
    // mem → hot-aggregate → join subtree from the shingle cache (the
    // 64× profile showed the hot aggregate's map pass and its exchange
    // byte-identical twice). Same rationale as the stored-sidecar
    // overload's barrier below; hot-cell memberships are bounded
    // (≤ MaxKeyDf per cell).
    val hotMem = graft.ops.Materialize.barrier(mem.join(hot, Seq("skey")))
    val hotIds = hotMem.select(col("doc_id")).distinct()
    val payload = sh
      .join(hotIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("shingles")).hint("merge")
    val cells = hotMem.join(payload, "doc_id")
      .select(lit(0).as("kind"), col("skey").as("cell"), col("doc_id"),
        array(col("t").cast("long"), col("side").cast("long")).as("aux"),
        col("shingles"))
      .as[(Int, Long, Long, Array[Long], Array[Int])]
    crossScored(cells, minCont, span)
  }

  /** The STORED-SIDECAR overload — q65's documented steady-state
    * deployment shape as an exercised code path (VERDICT r11 item 1):
    * the corpus side contributes only through the
    * [[CorpusWriter.writeStratifiedIndex]] tables, never through a text
    * pass.
    *
    * Bit-equality with the text form is by construction, not by
    * convention: the stored `_mem` table holds the FLOOR-LEVEL superset
    * — every shingle with trailing zeros ≥ max(t − span, 0), an
    * active-level-independent bound — and this reader filters it with
    * the SAME exists-an-active-level predicate [[emissionFrom]]
    * evaluates inline. Any active level a in [max(t−span,0), t] implies
    * z ≥ a ≥ max(t−span,0), so the filtered scan reproduces the text
    * form's corpus emission row for row (the active set is the union of
    * the stored corpus strata and the increment's — an increment
    * carrying a NEW stratum activates corpus shingles the corpus-only
    * view would not, which is why the superset must be stored, not the
    * filtered emission).
    *
    * Scale shape (the reason the sidecar exists): the corpus never
    * re-shingles and never SHUFFLES —
    *  - per-side cell aggregates replace the union aggregate: the
    *    corpus's runs EXCHANGE-FREE on the skey-bucketed `_mem` scan
    *    (the q56 bucketed-sidecar convention), the increment's is
    *    increment-sized;
    *  - a hot cell needs ≥1 member from EACH side, so hot = the INNER
    *    join of the two aggregates — bounded by the increment's cell
    *    count, broadcast both ways (df ≥ 2, incs ≥ 1, incs < df are
    *    implied by both sides being present; df ≤ MaxKeyDf and the
    *    probe bound stay explicit);
    *  - exact shingle payloads come from the stored `_payload` table
    *    semi-joined to the hot ids (broadcast — scan-side prune, no
    *    corpus shuffle), unioned with the increment's own shingling.
    * The recurring cost is the increment's emission + the broadcast
    * probe joins + two bucketed corpus SCANS (no text decode, no
    * exchange) — SCALING.md carries the measured probe-vs-full-pass
    * row. */
  def incrementalContainmentPairs(spark: org.apache.spark.sql.SparkSession,
      sidecarTable: String, increment: DataFrame, idCol: String,
      textCol: String, minCont: Double, span: Int): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    // ONE driver action for the whole admission preamble (r22, VERDICT
    // r21 #1b): the meta row, the stored corpus strata and the
    // increment's own strata previously cost three sequential collects
    // (~3 jobs of fixed latency per probe); the three frames are all
    // bounded driver metadata (1 row / ≤64 levels), so one row carrying
    // meta × sorted-distinct active levels reads them together.
    // The increment's one text-decode + shingle pass, shared (r22) by
    // the strata probe below, the index emission, and the payload's
    // increment arm. Lazy register: the metadata collect is its first
    // (single-subtree) consumer and fills the cache.
    val shInc = graft.ops.Materialize.register(
      shingledStrata(increment, idCol, textCol))
    val metaRows = spark.table(s"${sidecarTable}_meta")
      .crossJoin(
        spark.table(s"${sidecarTable}_levels").select(col("t"))
          .unionAll(shInc.select(col("t")))
          .distinct()
          .agg(sort_array(collect_list(col("t"))).as("lv")))
      .collect()
    require(metaRows.length == 1,
      s"malformed sidecar meta: ${metaRows.length} rows")
    val meta = metaRows(0)
    val storedSpan = meta.getAs[Int]("strata_span")
    require(storedSpan == span && meta.getAs[Int]("shingle_k") == ShingleK &&
      meta.getAs[Int]("sample_target") == SampleTarget &&
      meta.getAs[Int]("max_key_df") == MaxKeyDf,
      s"sidecar $sidecarTable was written under different index constants " +
        s"(span=$storedSpan vs $span): rebuild it with writeStratifiedIndex")
    val active = meta.getAs[scala.collection.Seq[Int]]("lv").toArray
    if (active.isEmpty) return emptyCross(spark)
    // The superset→filter identity (scaladoc): stored floor-level rows
    // filtered by the text form's exact keep predicate.
    val corpMem = spark.table(s"${sidecarTable}_mem")
      .filter(expr(activeKeepSql("skey", "t", active, span)))
    // Derived from the shInc cache with pure-codegen explode+filter
    // work — no cache of its own (the eager emission barrier this
    // replaces was pure admission latency; its two consumers each
    // re-derive from the filled cache instead).
    val incMem = emissionFrom(shInc, active, span)
    def cellAgg(mem: DataFrame): DataFrame = mem.groupBy("skey")
      .agg(count(lit(1)).as("df"),
        sum(when(expr("(skey & (shiftleft(CAST(1 AS BIGINT), t) - 1)) = 0"),
          1L).otherwise(0L)).as("probes"))
    // Hot = inner join of the per-side aggregates (both sides present ⇒
    // df ≥ 2, incs ≥ 1, incs < df), bounded by the increment's cells.
    // Barriered: `hot` and `hotMem` each feed TWO consumers, and an
    // uncached subtree would re-run its bucketed `_mem` scan per branch
    // (measured 8 scans per admission at sf0.1) — cached, the corpus
    // side costs exactly the scaladoc's two bucketed scans: one under
    // the cell aggregate, one under the hot-membership gather. Both
    // frames are small by contract (≤ increment cells, × MaxKeyDf).
    val hot = graft.ops.Materialize.barrier(
      cellAgg(corpMem).select(col("skey"), col("df").as("df0"), col("probes").as("pr0"))
        .join(cellAgg(incMem).select(col("skey"), col("df").as("df1"), col("probes").as("pr1")),
          Seq("skey"))
        .filter(col("df0") + col("df1") <= MaxKeyDf &&
          col("pr0") + col("pr1") >= 1)
        .select("skey"))
    val hotMem = graft.ops.Materialize.barrier(
      corpMem.join(broadcast(hot), Seq("skey")).withColumn("side", lit(0))
        .unionAll(incMem.join(broadcast(hot), Seq("skey")).withColumn("side", lit(1))))
    val hotIds = broadcast(hotMem.select(col("doc_id")).distinct())
    // array_compact: parquet round-trips array<int> with nullable
    // elements; compact is a data no-op restoring the non-null element
    // type (the IncrementalDedup sig convention).
    val payload = spark.table(s"${sidecarTable}_payload")
      .select(col("doc_id"), array_compact(col("shingles")).as("shingles"))
      .join(hotIds, Seq("doc_id"), "left_semi")
      .unionAll(shInc
        .join(hotIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("shingles")))
      .hint("merge")
    val cells = hotMem.join(payload, "doc_id")
      .select(lit(0).as("kind"), col("skey").as("cell"), col("doc_id"),
        array(col("t").cast("long"), col("side").cast("long")).as("aux"),
        col("shingles"))
      .as[(Int, Long, Long, Array[Long], Array[Int])]
    crossScored(cells, minCont, span)
  }

  /** Typed empty (inc_id, corp_id, n_inc, n_corp, containment) frame. */
  private def emptyCross(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.range(0).select(col("id").as("inc_id"),
      col("id").as("corp_id"), col("id").as("n_inc"), col("id").as("n_corp"),
      col("id").cast("double").as("containment"))

  /** The shared two-sided verify: in-cell probe-level + span + cross-side
    * gates, `inter / min` scoring, (inc, corp) ordering — ONE body for
    * the text form and the sidecar form, so the two can never diverge on
    * a shared cell. */
  private def crossScored(
      cells: org.apache.spark.sql.Dataset[(Int, Long, Long, Array[Long], Array[Int])],
      minCont: Double, span: Int): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    scoredCellGroups[(Long, Long, Long, Long, Double)](cells) {
      (_, skey, ids, aux, sets) =>
        val z = java.lang.Long.numberOfTrailingZeros(skey)
        val size = ids.iterator.zip(sets.iterator.map(_.length)).toMap
        val side = ids.iterator.zip(aux.iterator.map(_(1))).toMap
        cellPairScan(ids)(
          { (i, j) =>
            val (ti, tj) = (aux(i)(0), aux(j)(0))
            aux(i)(1) != aux(j)(1) &&
              z >= math.min(ti, tj) && math.abs(ti - tj) <= span
          },
          { (i, j) =>
            val inter = sortedIntersect(sets(i), sets(j))
            inter / math.min(sets(i).length, sets(j).length).toDouble
          }, _ >= minCont).map { case (a, b, c) =>
          val (inc, corp) = if (side(a) == 1L) (a, b) else (b, a)
          (inc, corp, size(inc).toLong, size(corp).toLong, c)
        }
    }.toDF("inc_id", "corp_id", "n_inc", "n_corp", "containment")
      .distinct()
      .orderBy("inc_id", "corp_id")
  }

  /** DuckDB oracle for [[incrementalContainmentPairs]] on table
    * `documents`, increment = rows satisfying `incPredSql` (the q56
    * fixture convention) — same CTEs as [[stratifiedOracleSql]] with the
    * side flag threaded through the hot filter and the cross-side
    * candidate gate. */
  def incrementalContainmentOracleSql(incPredSql: String,
      minCont: Double): String = {
    val sh = Duck.rollingHashSql(s"substr(text, i::INT, $ShingleK)")
    s"""WITH sh AS (
       |  SELECT doc_id, CASE WHEN $incPredSql THEN 1 ELSE 0 END AS side,
       |    list_distinct(list_transform(
       |    range(1, length(text) - ${ShingleK - 2}), i -> $sh)) AS shingles,
       |    (length(bin(greatest((length(text) - ${ShingleK - 1}) // $SampleTarget, 1))) - 1) AS t
       |  FROM documents WHERE length(text) >= $ShingleK),
       |act AS (SELECT DISTINCT t AS l FROM sh),
       |mem AS (
       |  SELECT DISTINCT doc_id, side, t, skey FROM (
       |    SELECT s.doc_id, s.side, s.t,
       |      unnest(list_filter(s.shingles, x -> (x & ((1::BIGINT << a.l) - 1)) = 0)) AS skey
       |    FROM sh s JOIN act a ON a.l BETWEEN greatest(s.t - $StrataSpan, 0) AND s.t)),
       |hot AS (SELECT skey FROM mem GROUP BY skey
       |        HAVING count(*) BETWEEN 2 AND $MaxKeyDf
       |           AND sum(side) >= 1 AND sum(side) < count(*)
       |           AND sum(CASE WHEN (skey & ((1::BIGINT << t) - 1)) = 0
       |                        THEN 1 ELSE 0 END) >= 1),
       |cand AS (
       |  SELECT DISTINCT i.doc_id AS inc_id, c.doc_id AS corp_id
       |  FROM mem i JOIN hot h ON i.skey = h.skey
       |       JOIN mem c ON c.skey = h.skey
       |  WHERE i.side = 1 AND c.side = 0
       |    AND abs(i.t - c.t) <= $StrataSpan
       |    AND (h.skey & ((1::BIGINT << least(i.t, c.t)) - 1)) = 0),
       |ex AS (
       |  SELECT cd.inc_id, cd.corp_id,
       |    len(list_filter(si.shingles, x -> list_contains(sc.shingles, x))) AS inter,
       |    len(si.shingles) AS ni, len(sc.shingles) AS nc
       |  FROM cand cd
       |  JOIN sh si ON si.doc_id = cd.inc_id
       |  JOIN sh sc ON sc.doc_id = cd.corp_id)
       |SELECT inc_id, corp_id, ni AS n_inc, nc AS n_corp,
       |  inter / CAST(least(ni, nc) AS DOUBLE) AS containment
       |FROM ex WHERE inter / CAST(least(ni, nc) AS DOUBLE) >= $minCont
       |ORDER BY inc_id, corp_id""".stripMargin
  }

  /** Stratum SQL for one text column — the scan-cheap log2 window-count
    * bucket (see [[stratifiedContainmentPairs]] step 1). */
  private def stratumSqlFor(textCol: String): String =
    s"CAST(length(bin(greatest((length($textCol) - ${ShingleK - 1}) div " +
      s"$SampleTarget, 1))) - 1 AS INT)"

  /** The exists-an-active-level keep predicate, reduced to ONE mask
    * test (r22, guide §4 "eliminate non-codegen expressions in the hot
    * path"): `(key & (2^a − 1)) = 0` is monotone in `a` (it says
    * trailing_zeros(key) ≥ a), so
    *   ∃ active a ∈ [max(t−span,0), t] with tz(key) ≥ a
    *   ⇔ tz(key) ≥ min(active ∩ [max(t−span,0), t]),
    * and the whole disjunction collapses to `(key & minQualMask(t)) = 0`
    * where the mask depends only on the ROW's stratum. [[minQualMaskSql]]
    * enumerates every possible stratum 0..63 as a CASE (NULL — i.e.
    * drop, exactly the old all-disjuncts-false outcome — when no active
    * level falls in the window). The r21 form evaluated the full
    * |active|-way disjunction per shingle ELEMENT inside the
    * (interpreted, non-codegen) higher-order filter — measured at the
    * 64× probe as a 15.1 s emission barrier that this rewrite takes to
    * ~1 s. ONE rendering shared by the inline emission filter and the
    * sidecar reader's superset filter, so the two can never disagree on
    * which shingles qualify. */
  private def activeKeepSql(keyRef: String, tRef: String,
      active: Array[Int], span: Int): String =
    s"($keyRef & ${minQualMaskSql(tRef, active, span)}) = 0"

  /** `2^(min active level in [max(t−span,0), t]) − 1` as a CASE over
    * every possible stratum value, NULL when the window holds no active
    * level (a null mask nulls the keep comparison, which filters drop —
    * the old predicate's false). Strata are log2 buckets of a long, so
    * 0..63 is total. */
  private def minQualMaskSql(tRef: String,
      active: Array[Int], span: Int): String = {
    val whens = (0 to 63).flatMap { tv =>
      val floor = math.max(tv - span, 0)
      val qual = active.filter(a => a >= floor && a <= tv)
      if (qual.isEmpty) None
      else Some(s"WHEN $tv THEN ${(1L << qual.min) - 1}L")
    }.mkString(" ")
    s"(CASE $tRef $whens END)"
  }

  /** The corpus's (doc_id, shingles, t) frame — the ONE expensive
    * text-decode + shingle pass of the stratified family, factored out
    * so callers can cache it once and derive the index emission, the
    * active-level set AND the verify payload from the same cache (r22:
    * the emission-row barrier it replaces serialized ~21M slim rows per
    * 64× run, measured as the family's dominant stage; this frame is
    * corpus-row-count sized and the downstream derivations are pure
    * codegen). */
  private def shingledStrata(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs.filter(length(col(textCol)) >= ShingleK)
      .select(col(idCol).as("doc_id"),
        GraftFunctions.shingleSet(col(textCol)).as("shingles"),
        expr(stratumSqlFor(textCol)).as("t"))
  }

  /** The slim index emission derived from a [[shingledStrata]]-shaped
    * frame (extra columns — e.g. the incremental form's `side` flag —
    * ride through): the row's minimal qualifying mask is PROJECTED once
    * per row (inlining the CASE into a per-element position would
    * re-evaluate it per shingle — the r21 trigram-fold lesson), then
    * explode FIRST and filter as a plain WHERE so Generate + Filter +
    * Project all run inside whole-stage codegen — the higher-order
    * lambda formulations this replaces were interpreted per element
    * (measured at the 64× probe: 6.6–15.1 s in this pass; this shape
    * ~1 s). The Int-side mask test is exact: bitwise AND is
    * sign-agnostic and an unsigned 32-bit shingle has no higher bits,
    * so (s & mask₃₂) = 0 on the raw Int equals the unsigned test. */
  private def emissionFrom(sh: DataFrame, active: Array[Int],
      span: Int): DataFrame = {
    val extras = sh.columns.filterNot(Set("doc_id", "shingles", "t"))
      .map(col).toSeq
    sh.select(Seq(col("doc_id"), col("t"),
        expr(s"CAST(${minQualMaskSql("t", active, span)} & 4294967295L AS INT)")
          .as("__mqi"),
        explode_outer(col("shingles")).as("s")) ++ extras: _*)
      .filter(expr("(s & __mqi) = 0"))
      .select(Seq(col("doc_id"), col("t"),
        expr("CAST(s AS BIGINT) & 4294967295L").as("skey")) ++ extras: _*)
  }

  /** The ACTIVE-LEVEL-INDEPENDENT floor emission — every shingle with
    * trailing zeros ≥ max(t − span, 0): the stored-sidecar superset
    * ([[CorpusWriter.writeStratifiedIndex]]). For any active set, the
    * reader's [[activeKeepSql]] filter over these rows equals
    * [[emissionFrom]] exactly (an active a in [max(t−span,0), t]
    * forces z ≥ a ≥ the floor), which is the q67 bit-equality
    * argument. Same (doc_id, t, skey) shape. */
  private[pipeline] def floorEmission(docs: DataFrame, idCol: String,
      textCol: String, span: Int): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs.filter(length(col(textCol)) >= ShingleK)
      .select(col(idCol).as("doc_id"),
        GraftFunctions.shingleSet(col(textCol)).as("shingles"),
        expr(stratumSqlFor(textCol)).as("t"))
      // Floor mask bound once per row, filter-first on the raw Int
      // (same bind-once + survivors-only rules as [[emissionFrom]] —
      // the landing write is a corpus-scale pass).
      .select(col("doc_id"), col("shingles"), col("t"),
        expr("CAST((shiftleft(CAST(1 AS BIGINT), greatest(t - " + span +
          ", 0)) - 1) & 4294967295L AS INT)").as("__mfi"))
      // explode_outer: the non-outer generate's inferred filter would
      // re-run shingle_set per row in the (uncached) landing pass; the
      // mask filter below already drops the outer form's null rows.
      .select(col("doc_id"), col("t"), col("__mfi"),
        explode_outer(col("shingles")).as("s"))
      .filter(expr("(s & __mfi) = 0"))
      .select(col("doc_id"), col("t"),
        expr("CAST(s AS BIGINT) & 4294967295L").as("skey"))
  }

  /** Corpus strata + doc-level shingle payloads for the sidecar writer:
    * (`levels`, `payload`) — the other two stored tables. */
  private[pipeline] def sidecarAuxFrames(docs: DataFrame, idCol: String,
      textCol: String): (DataFrame, DataFrame) = {
    GraftFunctions.register(docs.sparkSession)
    val levels = docs.filter(length(col(textCol)) >= ShingleK)
      .select(expr(stratumSqlFor(textCol)).as("t")).distinct()
    (levels, shingled(docs, idCol, textCol))
  }

  /** The stratified index + gather: (0, shingle-key, doc_id, [stratum],
    * shingles) memberships of HOT (2..MaxKeyDf members, ≥1 possible
    * probe) sampled-shingle cells, [[scoredCellGroups]]-shaped. Keys are
    * the UNSIGNED 32-bit shingle values (low 32 bits of the rolling
    * hash), so the oracle's [0, 2^32) values match them verbatim and
    * trailing zeros read the sampling level directly. `None` on an
    * empty corpus (no strata to index). */
  private def stratifiedCells(docs: DataFrame, idCol: String,
      textCol: String, span: Int): Option[org.apache.spark.sql.Dataset[(Int, Long, Long, Array[Long], Array[Int])]] = {
    val spark = docs.sparkSession
    import spark.implicits._
    GraftFunctions.register(spark)
    // ONE barrier on the text-decode + shingle pass (r22): the active
    // levels, the index emission (twice — hot-cell aggregate and
    // membership join) and the verify payload all derive from this
    // cache with pure-codegen work, where the previous shape barriered
    // the exploded emission (an ~21M-row cache write per 64× run) AND
    // re-shingled the hot docs for the payload AND text-scanned once
    // more for the active levels.
    val sh = graft.ops.Materialize.barrier(
      shingledStrata(docs, idCol, textCol))
    val active = sh.select(col("t")).distinct().as[Int].collect().sorted
    if (active.isEmpty) return None
    val mem = emissionFrom(sh, active, span)
    // Hot cells: ≥2 members (a pair exists), ≤ MaxKeyDf (stop-shingle
    // drop), and ≥1 member that can PROBE through this shingle (its own
    // stratum sampled here: skey mod 2^t = 0) — a cell of pure hosts can
    // gate no pair, since eligibility needs z ≥ the smaller stratum.
    val hot = mem.groupBy("skey")
      .agg(count(lit(1)).as("df"),
        sum(when(expr("(skey & (shiftleft(CAST(1 AS BIGINT), t) - 1)) = 0"),
          1L).otherwise(0L)).as("probes"))
      .filter(col("df") >= 2 && col("df") <= MaxKeyDf && col("probes") >= 1)
      .select("skey")
    // Barriered (r22 second wave, the incrementalContainmentPairs
    // rationale): hotMem feeds hotIds AND the cells join —
    // unmaterialized, the mem → hot → join subtree ran twice from the
    // shingle cache.
    val hotMem = graft.ops.Materialize.barrier(mem.join(hot, Seq("skey")))
    val hotIds = hotMem.select(col("doc_id")).distinct()
    // Exact sets ship once per hot membership; merge hint for the same
    // reason as the band path — the semi-joined payload has no honest
    // size estimate and both sides are corpus-sized at scale.
    val payload = sh
      .join(hotIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("shingles")).hint("merge")
    Some(hotMem.join(payload, "doc_id")
      .select(lit(0).as("kind"), col("skey").as("cell"), col("doc_id"),
        array(col("t").cast("long")).as("aux"), col("shingles"))
      .as[(Int, Long, Long, Array[Long], Array[Int])])
  }

  /** The shared verify-stage skeleton ([[jaccardPairs]],
    * [[containmentPairs]] and [[stratifiedContainmentPairs]] are each
    * just a cell frame + scorer plugged in here): group the cell
    * payloads, gather each cell's parallel (id, aux, shingle-set)
    * buffers once, and hand them to `scorer` — ONE copy of the gather
    * loop, so a gather fix can never diverge the measures. `cells` rows
    * are (cellKind, cellKey, doc_id, aux, shingles): the band generator
    * puts the band index in cellKind, the hashed bucket in cellKey and
    * the signature in aux; the stratified generator puts the sampled
    * shingle value in cellKey (its trailing zeros carry the level) and
    * the member's stratum in aux. */
  private def scoredCellGroups[T: org.apache.spark.sql.Encoder](
      cells: org.apache.spark.sql.Dataset[(Int, Long, Long, Array[Long], Array[Int])])(
      scorer: (Int, Long, scala.collection.mutable.ArrayBuffer[Long],
        scala.collection.mutable.ArrayBuffer[Array[Long]],
        scala.collection.mutable.ArrayBuffer[Array[Int]]) => Iterator[T])
      : org.apache.spark.sql.Dataset[T] = {
    val spark = cells.sparkSession
    import spark.implicits._
    cells
      .groupByKey(r => (r._1, r._2))
      .flatMapGroups { (key: (Int, Long), it: Iterator[(Int, Long, Long, Array[Long], Array[Int])]) =>
        val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
        val sigs = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
        val sets = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
        it.foreach { case (_, _, id, sg, sh) => ids += id; sigs += sg; sets += sh }
        scorer(key._1, key._2, ids, sigs, sets)
      }
  }

  /** The shared verify-stage gather: hot-cell memberships with each
    * member's signature AND exact shingle set, grouped-cell shaped. */
  private def hotShingledCells(docs: DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.Dataset[(Int, Long, Long, Array[Long], Array[Int])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Grouped-cell verify (round 7): the pair-join formulation (kept as
    // [[joinJaccardPairs]], equivalence-pinned) shipped BOTH exact
    // shingle sets on every candidate pair row — on a dup-dense corpus a
    // doc belongs to ~|cluster| pairs, so its ~KB set crossed the
    // exchange once per pair (the 64× probe's 11.6M pairs → ~23 GB of
    // set payload, 25s). Here each doc's payload ships once per HOT
    // (band, bucket) cell it occupies — at most `Bands` times, however
    // dup-dense the cluster — and the all-pairs scan runs in primitive
    // loops inside flatMapGroups (the q26/q49 shape, applied to the
    // verify stage).
    //
    // Semantics are the join form's exactly:
    //  - singleton buckets are pruned before any payload moves (the
    //    count aggregate also serves as the stats barrier the candidate
    //    distinct() provided);
    //  - the cell grouping key is a HASH of (band, bucket-slice); a
    //    collision merely co-groups two real buckets — membership of a
    //    pair's band is re-verified from the signatures inside the
    //    loop, so spurious co-grouping cannot create a pair;
    //  - a pair is verified only in its FIRST agreeing band's cell
    //    (same uniqueness rule as candidatePairs), checked by a
    //    primitive scan of the two signatures;
    //  - the Jaccard division is the same single IEEE op on the same
    //    sorted-merge intersection count.
    val sig = graft.ops.Materialize.register(signatures(docs, idCol, textCol))
    // Signatures RIDE the membership frame (one copy per hot membership,
    // the same bytes the gather ships anyway), so the signature cache
    // can be released at the barrier below — the returned plan reads
    // only hotMembers. hotMembers itself persists with query-lifetime
    // intent (the [[lifted]]/[[nearDupPairs]] convention, registered for
    // session-owner release): it feeds the hot-doc semi-join AND the
    // gather, and the barrier both materializes it and stops concurrent
    // downstream branches from racing the banding pipeline. Footprint:
    // ≤ Bands signature copies per doc (vs 1× for the slim sig cache) —
    // still bounded by Bands × the REDUCED representation, far below raw
    // text; MEMORY_AND_DISK makes pressure spill instead of forcing a
    // banding recompute.
    val hotMembers = graft.ops.Materialize.barrier(hotCellMembers(sig))
    graft.ops.Materialize.release(Seq(sig))
    val hotIds = hotMembers.select(col("doc_id")).distinct()
    // The merge hint is load-bearing: the semi-joined shingle frame has
    // no honest size estimate, and Catalyst was measured (64× probe) to
    // BROADCAST it — shipping every hot doc's shingle set to every task
    // and rebuilding the semi-join subtree inside the broadcast build
    // (12s → 26s). Both sides are corpus-sized at scale, so a shuffle
    // merge join is the only correct strategy regardless of estimates.
    val payload = shingled(
      docs.join(hotIds.withColumnRenamed("doc_id", idCol), Seq(idCol), "left_semi"),
      idCol, textCol).hint("merge")
    hotMembers.join(payload, "doc_id")
      .select(col("band"), col("cell"), col("doc_id"), col("sig"), col("shingles"))
      .as[(Int, Long, Long, Array[Long], Array[Int])]
  }

  /** Default ceiling on one (band, bucket) cell's membership — the
    * in-plan guard for the degenerate-cell straggler (SCALING.md
    * caveat): `groupByKey` concentrates each hot cell in ONE task and
    * AQE cannot split a single key, so a malformed corpus (millions of
    * identical or empty documents collapse to one signature → one cell)
    * would silently hang a task in the quadratic scan. Past the bound
    * the job fails with a readable contract error naming the mitigation
    * instead — the Decontam `maxEvalGrams` / [[Clustering
    * .MaxCentroidCells]] convention. 2¹⁶ members ≈ 2×10⁹ pair probes in
    * one task — already hours past any healthy cell (true near-dup
    * clusters are orders of magnitude smaller; the adversarial 64×
    * probe's largest is 64). Override per-session with
    * `spark.graft.maxCellMembers`. */
  val DefaultMaxCellMembers: Long = 1L << 16

  /** Hot-cell membership frame `(band, cell, doc_id, sig)` shared by
    * [[candidatePairs]] and [[jaccardPairs]] — ONE definition of the
    * band-cell hashing scheme, the singleton-bucket prune, and the
    * degenerate-cell cap, so the candidate emitter and the verify stage
    * can never band differently. `cell` is `xxhash64(band, band-slice)`;
    * collisions are harmless because both consumers re-verify band
    * agreement from the signatures inside their loops. */
  private def hotCellMembers(sig: DataFrame): DataFrame = {
    val bound = sig.sparkSession.conf
      .get("spark.graft.maxCellMembers", DefaultMaxCellMembers.toString).toLong
    val cells = sig.select(col("doc_id"), col("sig"),
        explode_outer(expr(s"transform(sequence(0, ${Bands - 1}), " +
          s"b -> struct(b AS band, xxhash64(b, slice(sig, b * $RowsPerBand + 1, $RowsPerBand)) AS cell))")).as("bd"))
      .filter(col("bd").isNotNull)
      .select(col("doc_id"), col("sig"), col("bd.band").as("band"), col("bd.cell").as("cell"))
    // The cap rides the singleton-prune filter over the ALREADY-computed
    // count aggregate (a kept filter cannot be pruned away, unlike a
    // projected-then-dropped column), so it costs nothing extra.
    val hot = cells.groupBy("band", "cell").agg(count(lit(1)).as("n"))
      .filter(expr(
        s"CASE WHEN n > ${bound}L THEN CAST(raise_error(CONCAT(" +
          s"'minhash hot cell of ', n, ' members exceeds " +
          s"spark.graft.maxCellMembers=$bound: a cell this size means " +
          s"near-identical documents at mass scale (the quadratic " +
          s"per-cell scan would hang one task) — run exact dedup (q20) " +
          s"over the corpus first (byte-identical documents collapse to " +
          s"ONE signature at any Bands/NumHashes, so only removing them " +
          s"splits the cell)')) AS " +
          s"BOOLEAN) ELSE n >= 2 END"))
      .select("band", "cell")
    cells.join(hot, Seq("band", "cell"))
      .select(col("band"), col("cell"), col("doc_id"), col("sig"))
  }

  /** The shared grouped-cell pair scan ([[candidatePairs]] emits with
    * it, [[jaccardPairs]] verifies with it — the r7 writeup's one
    * skeleton, now one body): members sort by id, the double loop
    * visits each unordered pair once in (doc_a < doc_b) order,
    * `eligible` plugs in the per-generator pair gate (the band callers
    * pass the FIRST-agreeing-band rule — checked from the signatures,
    * so hashed cell-key collisions cannot create a pair, and emission
    * is unique across cells; the stratified caller gates on the
    * canonical probe level and dedups with a downstream `distinct`),
    * and `score`/`keep` plug in the per-pair measure. `eligible` and
    * `score` receive GATHER-ORDER indices — callers index their own
    * parallel payload buffers (signatures, strata, shingle sets). */
  private def cellPairScan(
      ids: scala.collection.mutable.ArrayBuffer[Long])(
      eligible: (Int, Int) => Boolean,
      score: (Int, Int) => Double,
      keep: Double => Boolean): Iterator[(Long, Long, Double)] = {
    val n = ids.length
    val order = Array.range(0, n).sortBy(ids(_))
    val out = Seq.newBuilder[(Long, Long, Double)]
    var oi = 0
    while (oi < n) {
      val i = order(oi)
      var oj = oi + 1
      while (oj < n) {
        val j = order(oj)
        if (eligible(i, j)) {
          val s = score(i, j)
          if (keep(s)) out += ((ids(i), ids(j), s))
        }
        oj += 1
      }
      oi += 1
    }
    out.result().iterator
  }

  /** Fraction of agreeing signature slots — est_sim's single IEEE
    * division, the primitive mirror of `sig_agree_count / NumHashes`. */
  private def agreeFraction(a: Array[Long], b: Array[Long]): Double = {
    var agree = 0
    var s = 0
    while (s < NumHashes) {
      if (a(s) == b(s)) agree += 1
      s += 1
    }
    agree / NumHashes.toDouble
  }

  /** First band (0-based) where the two signatures' slices agree, or -1.
    * Mirrors `sig_band_mask`'s lowest set bit — the candidatePairs
    * uniqueness rule evaluated in primitive Scala. */
  private def firstAgreeingBand(a: Array[Long], b: Array[Long]): Int = {
    var band = 0
    while (band < Bands) {
      var r = band * RowsPerBand
      val end = r + RowsPerBand
      while (r < end && a(r) == b(r)) r += 1
      if (r == end) return band
      band += 1
    }
    -1
  }

  /** Sorted-merge intersection count (the `sorted_intersect_count`
    * kernel over plain arrays). */
  private def sortedIntersect(a: Array[Int], b: Array[Int]): Int = {
    var i = 0; var j = 0; var c = 0
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) i += 1
      else if (a(i) > b(j)) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  /** The pair-join formulation [[jaccardPairs]] replaced — kept as the
    * equivalence-test mirror (PipelineSpec pins identical output,
    * jaccard bits included, on fixture + planted near-dups). */
  private[graft] def joinJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      minJac: Double): DataFrame = {
    val sig = graft.ops.Materialize.register(signatures(docs, idCol, textCol))
    val cand = graft.ops.Materialize.barrier(
      candidatePairs(sig).select("doc_a", "doc_b"))
    graft.ops.Materialize.release(Seq(sig))
    val candIds = cand.select(col("doc_a").as(idCol))
      .union(cand.select(col("doc_b").as(idCol))).distinct()
    val sh = graft.ops.Materialize.register(
      shingled(docs.join(candIds, Seq(idCol), "left_semi"), idCol, textCol))
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), "doc_b")
      .withColumn("inter", expr("sorted_intersect_count(sh_a, sh_b)"))
      .withColumn("jaccard",
        expr("inter / CAST(size(sh_a) + size(sh_b) - inter AS DOUBLE)"))
      .filter(col("jaccard") >= minJac)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Shared DuckDB CTE prefix: shingles → signatures → bands → candidates.
    * `private[pipeline]` so [[DupClusters]] can build its cluster oracle on
    * the same pair derivation. */
  private[pipeline] def ctePrefixSql: String = ctePrefixSql("documents")

  /** [[ctePrefixSql]] over an arbitrary `(doc_id, text)` relation —
    * [[SnapshotLanding]] runs the derivation over a composed
    * standing-corpus ∪ increment CTE instead of the raw table. */
  private[pipeline] def ctePrefixSql(from: String): String = {
    val sh = Duck.rollingHashSql(s"substr(text, i::INT, $ShingleK)")
    val sigList = (0 until NumHashes)
      .map(j => s"list_min(list_transform(shingles, s -> (s * ${A(j)} + ${B(j)}) % $P))")
      .mkString("[", ", ", "]")
    s"""WITH sh AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    range(1, length(text) - ${ShingleK - 2}), i -> $sh)) AS shingles
       |  FROM $from WHERE length(text) >= $ShingleK),
       |sig AS (SELECT doc_id, $sigList AS sig FROM sh),
       |bands AS (
       |  SELECT doc_id, b, list_slice(sig, b * $RowsPerBand + 1, b * $RowsPerBand + $RowsPerBand) AS bkey
       |  FROM sig, range(0, $Bands) t(b)),
       |cand AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM bands l JOIN bands r ON l.b = r.b AND l.bkey = r.bkey AND l.doc_id < r.doc_id)""".stripMargin
  }

  /** DuckDB CTE estimating per-candidate signature agreement (est_sim). */
  private[pipeline] def estCteSql: String =
    s"""est AS (
       |  SELECT c.doc_a, c.doc_b,
       |    len(list_filter(range(1, ${NumHashes + 1}), j -> sa.sig[j] = sb.sig[j])) / CAST($NumHashes AS DOUBLE) AS est_sim
       |  FROM cand c
       |  JOIN sig sa ON sa.doc_id = c.doc_a
       |  JOIN sig sb ON sb.doc_id = c.doc_b)""".stripMargin

  /** DuckDB SQL reproducing [[nearDupPairs]] bit-exactly on table `documents`. */
  def oracleSql(minSim: Double): String =
    s"""$ctePrefixSql,
       |$estCteSql
       |SELECT doc_a, doc_b, est_sim FROM est WHERE est_sim >= $minSim
       |ORDER BY doc_a, doc_b""".stripMargin

  /** DuckDB SQL reproducing [[jaccardPairs]] on table `documents`. */
  def jaccardOracleSql(minJac: Double): String =
    s"""$ctePrefixSql,
       |ex AS (
       |  SELECT c.doc_a, c.doc_b,
       |    len(list_filter(sa.shingles, x -> list_contains(sb.shingles, x))) AS inter,
       |    len(sa.shingles) AS na, len(sb.shingles) AS nb
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.doc_a
       |  JOIN sh sb ON sb.doc_id = c.doc_b)
       |SELECT doc_a, doc_b, inter / CAST(na + nb - inter AS DOUBLE) AS jaccard
       |FROM ex WHERE inter / CAST(na + nb - inter AS DOUBLE) >= $minJac
       |ORDER BY doc_a, doc_b""".stripMargin

  /** DuckDB oracle for [[containmentPairs]] on table `documents` — the
    * same candidate CTEs, scored `inter / least(na, nb)`. */
  def containmentOracleSql(minCont: Double): String =
    s"""$ctePrefixSql,
       |ex AS (
       |  SELECT c.doc_a, c.doc_b,
       |    len(list_filter(sa.shingles, x -> list_contains(sb.shingles, x))) AS inter,
       |    len(sa.shingles) AS na, len(sb.shingles) AS nb
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.doc_a
       |  JOIN sh sb ON sb.doc_id = c.doc_b)
       |SELECT doc_a, doc_b, na AS n_a, nb AS n_b,
       |  inter / CAST(least(na, nb) AS DOUBLE) AS containment
       |FROM ex WHERE inter / CAST(least(na, nb) AS DOUBLE) >= $minCont
       |ORDER BY doc_a, doc_b""".stripMargin

  /** DuckDB oracle for [[stratifiedContainmentPairs]] on table
    * `documents` — the stratified index (window-count strata, active
    * levels, one trailing-zero-sampled emission per qualifying shingle,
    * 2..MaxKeyDf + possible-probe hot filter, in-cell probe-level +
    * span gate) and the exact `inter / min` verify, mirrored CTE for
    * CTE. The shingle values here are the [0, 2^32) rolling hashes; the
    * Spark side keys cells by the same unsigned value (wrapped Int
    * masked back to 32 bits), so keys and trailing zeros agree
    * verbatim. */
  def stratifiedOracleSql(minCont: Double): String = {
    val sh = Duck.rollingHashSql(s"substr(text, i::INT, $ShingleK)")
    s"""WITH sh AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    range(1, length(text) - ${ShingleK - 2}), i -> $sh)) AS shingles,
       |    (length(bin(greatest((length(text) - ${ShingleK - 1}) // $SampleTarget, 1))) - 1) AS t
       |  FROM documents WHERE length(text) >= $ShingleK),
       |act AS (SELECT DISTINCT t AS l FROM sh),
       |mem AS (
       |  SELECT DISTINCT doc_id, t, skey FROM (
       |    SELECT s.doc_id, s.t,
       |      unnest(list_filter(s.shingles, x -> (x & ((1::BIGINT << a.l) - 1)) = 0)) AS skey
       |    FROM sh s JOIN act a ON a.l BETWEEN greatest(s.t - $StrataSpan, 0) AND s.t)),
       |hot AS (SELECT skey FROM mem GROUP BY skey
       |        HAVING count(*) BETWEEN 2 AND $MaxKeyDf
       |           AND sum(CASE WHEN (skey & ((1::BIGINT << t) - 1)) = 0
       |                        THEN 1 ELSE 0 END) >= 1),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM mem a JOIN hot h ON a.skey = h.skey
       |       JOIN mem b ON b.skey = h.skey AND a.doc_id < b.doc_id
       |  WHERE abs(a.t - b.t) <= $StrataSpan
       |    AND (h.skey & ((1::BIGINT << least(a.t, b.t)) - 1)) = 0),
       |ex AS (
       |  SELECT c.doc_a, c.doc_b,
       |    len(list_filter(sa.shingles, x -> list_contains(sb.shingles, x))) AS inter,
       |    len(sa.shingles) AS na, len(sb.shingles) AS nb
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.doc_a
       |  JOIN sh sb ON sb.doc_id = c.doc_b)
       |SELECT doc_a, doc_b, na AS n_a, nb AS n_b,
       |  inter / CAST(least(na, nb) AS DOUBLE) AS containment
       |FROM ex WHERE inter / CAST(least(na, nb) AS DOUBLE) >= $minCont
       |ORDER BY doc_a, doc_b""".stripMargin
  }
}
