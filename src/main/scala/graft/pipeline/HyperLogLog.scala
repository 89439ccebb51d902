package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** HyperLogLog distinct-count telemetry — Flajolet, Fusy, Gandouet &
  * Meunier (AofA 2007) — closing the sketch family's cardinality corner:
  * Bloom answers "seen?" (q71/q92), count-min answers "how often?"
  * (q94), KMV answers "how similar?" (q78), Misra–Gries answers "what's
  * hot?" (q98), the fixed grid answers "where do the quantiles sit?"
  * (q116) — HLL answers "how many DISTINCT?" in [[M]] register bytes
  * per key, where the exact form (q79's vocabulary route) must shuffle
  * and hold a corpus-growing distinct set. The default observable is
  * the distinct n-GRAM count (n=3): unigram vocabulary saturates, but
  * distinct n-grams grow with the corpus — the diversity cardinality
  * q106's novelty index answers exactly, here in 256 bytes.
  *
  * Register discipline: each occurrence's 63-bit gram fingerprint
  * ([[graft.functions.WordGramHashesExpr]], the corpus-wide hash
  * convention) re-keys through `md5(fp)` — the repo's deterministic-
  * draw idiom (q39/q59/q104), and the one mixing primitive with
  * identical semantics in Spark and DuckDB. (The 31-fold gram hash is
  * collision-adequate but its BITS are not geometric-observable
  * quality: measured ~36% estimator error splitting it directly — the
  * low register bits inherit the last byte's tiny alphabet. A
  * multiply–xorshift finalizer is the cheap fix but 64-bit wrapped
  * products are ANSI-illegal in Spark 4 and painful in DuckDB's
  * HUGEINT; md5 is free of both problems. A 100 TB deployment that
  * doesn't need the SQL oracle can swap in `xxhash64`, which Spark
  * codegens natively — the register layout is unchanged.)
  * From the 32-hex digest: 2 hex chars → the [[P]]-bit register index,
  * the next 13 → a [[PayloadBits]]-bit payload whose LEADING-zero rank
  * drives the register: `rho = [[RhoMax]] − bitlength(payload)`, the
  * paper's geometric observable, computed with integer/string ops only
  * (`length(bin(w))` — identical in both engines) so the oracle
  * replays every register bit-exactly. The estimate is the paper's raw
  * estimator `alpha_m · m² / Σ 2^−M_j`, with the harmonic sum carried
  * as an EXACT integer (`Σ 2^(52−M_j)`, a 64-bit scaled fixed point —
  * every term and the sum exact, no float accumulation order to
  * disagree on) and ONE final IEEE division shared literally between
  * engines. No small/large-range corrections: the register STATE is
  * the artifact; corrections are presentation-time policy and
  * transcendental (`ln`), which the bit-exact oracle discipline
  * deliberately excludes — callers needing the linear-counting regime
  * read `n_registers_hit` (= m − V, V the zero count) from the report.
  *
  * Scale shape: one `(key, register)` aggregate — map-side partial max
  * makes the exchange ≤ [[M]] slim rows per key regardless of corpus
  * size; nothing quadratic, nothing driver-resident beyond the
  * [[M]]-entry register array a caller explicitly collects
  * ([[sketchOf]], the bounded-collect contract). Registers are
  * MERGEABLE by elementwise max — union semantics with NO error
  * growth, so per-shard sketches at 1000 executors, per-day sketches
  * in a landing pipeline, and per-batch sketches in the streaming
  * twin ([[graft.streaming.StreamHll]]) all combine into exactly the
  * sketch of the union; [[HyperLogLogSpec]] pins merge ≡ union
  * bit-for-bit, and the streaming duality is bit-equal too (max is
  * arrival-order-free — unlike the MG summary q98 carries, whose
  * bounds, not contents, are order-free).
  *
  * The [[report]] carries `exact_distinct` beside the estimate — the
  * audit meter (the q87 annRecall convention: the honest cost of
  * grading the sketch is an exact pass, paid at eval time, never in
  * deployment, where [[registers]]/[[sketchOf]] are the product).
  * "Distinct" is distinct FINGERPRINTS — the same hashed universe the
  * sketch observes, so the meter grades estimator error, not hash
  * collisions (negligible in the 63-bit space and invisible to every
  * other consumer of the shared fingerprint convention anyway). */
object HyperLogLog {

  /** Register-index bits: 2^8 = 256 registers — relative error
    * ~1.04/√m ≈ 6.5%, and small enough that the fixture-scale oracle
    * exercises every register. A 100 TB deployment wanting ~0.8% reads
    * 3 hex chars instead of 2 (P=12, 4 Ki registers — still one
    * broadcast-sized artifact); the layout is hex-digit-parametric. */
  val P: Int = 8

  /** Register count. */
  val M: Int = 1 << P

  /** Payload bit width: 13 hex digits of the md5 re-key. */
  val PayloadBits: Int = 52

  /** Maximum register value: an all-zero payload reads rank
    * [[PayloadBits]] + 1, the paper's saturation case. */
  val RhoMax: Int = PayloadBits + 1

  /** Fixed-point scale of the harmonic sum: `Σ 2^(ScaleBits − M_j)`
    * — with M_j ≥ 1 capped at [[ScaleBits]], each term ≤ 2^51 and the
    * [[M]]-term sum ≤ 2^60: exact in a BIGINT on both engines. */
  val ScaleBits: Int = 52

  /** `alpha_256 = 0.7213/(1 + 1.079/256)` ≈ 0.7182726, carried as a
    * shared ppb literal so both engines compute the identical IEEE
    * estimate from the identical integer sum. */
  val AlphaE9: Long = 718272600L

  private val alphaNum: Long = AlphaE9 * M * M
  private val scaleOne: Long = 1L << ScaleBits

  /** md5 re-key of the fingerprint (hex digest of its decimal string —
    * both engines render BIGINT→string and md5 identically). */
  private def digest(fp: Column): Column = md5(fp.cast("string"))

  /** Register index: first 2 hex digits. */
  private def registerCol(fp: Column): Column =
    conv(substring(digest(fp), 1, 2), 16, 10).cast("long")

  /** Payload: next 13 hex digits (52 bits). */
  private def payloadCol(fp: Column): Column =
    conv(substring(digest(fp), 3, 13), 16, 10).cast("long")

  /** `rho` over a payload column: [[RhoMax]] − bitlength, saturating
    * at zero payload — `bin()` has identical semantics in Spark and
    * DuckDB, so the SQL shape is shared with the oracle. */
  private def rhoCol(w: Column): Column =
    when(w === 0L, lit(RhoMax))
      .otherwise(lit(RhoMax) - length(expr("bin(__w)")))

  /** Per-(key, register) state: `mj` = max rho observed, `nd` =
    * distinct fingerprints landing in the register (registers
    * partition the fingerprint space, so `Σ nd` per key IS the key's
    * exact distinct count — the audit meter rides the same aggregate,
    * no second corpus pass). `n` is the gram order (default 3: the
    * corpus-growing cardinality; unigrams saturate at the vocabulary
    * and sit in the small-range zone the raw estimator deliberately
    * doesn't correct for). */
  def registers(docs: DataFrame, textCol: String, keyCol: String,
      n: Int = 3): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs
      .select(col(keyCol).as("key"),
        explode_outer(GraftFunctions.wordGramHashes(col(textCol), n)).as("fp"))
      .filter(col("fp").isNotNull)
      .select(col("key"), col("fp"),
        registerCol(col("fp")).as("register"),
        payloadCol(col("fp")).as("__w"))
      .groupBy("key", "register")
      .agg(max(rhoCol(col("__w"))).as("mj"),
        count_distinct(col("fp")).as("nd"))
  }

  /** Per-key sketch report: registers hit, the exact scaled harmonic
    * sum, the raw HLL estimate, and the exact distinct count (the
    * audit column). One aggregate chain, ≤ [[M]] mid-rows per key. */
  def report(docs: DataFrame, textCol: String, keyCol: String,
      n: Int = 3): DataFrame =
    registers(docs, textCol, keyCol, n)
      .groupBy("key")
      .agg(count(lit(1)).as("n_registers_hit"),
        (sum(expr(s"shiftleft(CAST(1 AS BIGINT), " +
            s"CAST($ScaleBits - least(mj, $ScaleBits) AS INT))"))
          + (lit(M.toLong) - count(lit(1))) * lit(scaleOne)).as("s_scaled"),
        sum("nd").as("exact_distinct"))
      .select(col("key").as(keyCol), col("n_registers_hit"),
        col("s_scaled"),
        expr(s"CAST($alphaNum AS DOUBLE) * CAST($scaleOne AS DOUBLE) " +
          "/ CAST(1000000000 AS DOUBLE) / CAST(s_scaled AS DOUBLE)")
          .as("est_distinct"),
        col("exact_distinct"))
      .orderBy(keyCol)

  /** The per-key report from a STORED register sidecar
    * ([[CorpusWriter.writeHllRegisters]] + appends): duplicates by
    * (key, register) fold by max — the union-merge identity — then the
    * same exact-integer sum and shared-literal estimate as [[report]].
    * No `exact_distinct` column: the sidecar is the deployment
    * artifact; the audit meter is [[report]]'s full-scan job. The
    * stored gram order must match `n` (the winnow-index meta
    * discipline). Cost is sidecar-sized — the corpus is never
    * re-read. */
  def reportFromRegisters(spark: org.apache.spark.sql.SparkSession,
      table: String, keyCol: String, n: Int): DataFrame = {
    val meta = spark.table(s"${table}_meta").collect()
    require(meta.length == 1 && meta(0).getAs[Int]("n") == n,
      s"HLL register sidecar $table was written under n=" +
        meta.map(_.getAs[Int]("n")).mkString(",") +
        s", query posed under n=$n")
    spark.table(table)
      .groupBy("key", "register").agg(max("mj").as("mj"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_registers_hit"),
        (sum(expr(s"shiftleft(CAST(1 AS BIGINT), " +
            s"CAST($ScaleBits - least(mj, $ScaleBits) AS INT))"))
          + (lit(M.toLong) - count(lit(1))) * lit(scaleOne)).as("s_scaled"))
      .select(col("key").as(keyCol), col("n_registers_hit"),
        col("s_scaled"),
        expr(s"CAST($alphaNum AS DOUBLE) * CAST($scaleOne AS DOUBLE) " +
          "/ CAST(1000000000 AS DOUBLE) / CAST(s_scaled AS DOUBLE)")
          .as("est_distinct"))
      .orderBy(keyCol)
  }

  /** DuckDB oracle for [[reportFromRegisters]] over a sidecar landed
    * from the WHOLE `documents` table (in any split): write+append ≡
    * write-union, so the oracle is [[oracleSql]] minus the audit
    * column. */
  def landedOracleSql(keyCol: String = "source", n: Int = 3): String =
    s"""WITH full_report AS (
       |${oracleSql(keyCol, n).linesIterator.map("  " + _).mkString("\n")}
       |)
       |SELECT $keyCol, n_registers_hit, s_scaled, est_distinct
       |FROM full_report ORDER BY $keyCol""".stripMargin

  /** The corpus-wide register array as a driver artifact (the
    * deployment/streaming grain): index → max rho, 0 = untouched. A
    * bounded collect by construction — ≤ [[M]] rows ever leave the
    * cluster. */
  def sketchOf(docs: DataFrame, textCol: String,
      n: Int = 3): Array[Int] = {
    GraftFunctions.register(docs.sparkSession)
    val out = new Array[Int](M)
    docs
      .select(explode_outer(
        GraftFunctions.wordGramHashes(col(textCol), n)).as("fp"))
      .filter(col("fp").isNotNull)
      .select(registerCol(col("fp")).as("register"),
        payloadCol(col("fp")).as("__w"))
      .groupBy("register")
      .agg(max(rhoCol(col("__w"))).as("mj"))
      .collect()
      .foreach(r => out(r.getLong(0).toInt) = r.getInt(1))
    out
  }

  /** Union merge: elementwise max — `merge(sketchOf(A), sketchOf(B))`
    * equals `sketchOf(A ∪ B)` exactly, the property that makes the
    * sketch shard-, day-, and batch-composable. */
  def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    require(a.length == M && b.length == M,
      s"register arrays must be length $M: ${a.length}, ${b.length}")
    Array.tabulate(M)(i => math.max(a(i), b(i)))
  }

  /** The raw estimate from a register array — the same scaled-integer
    * sum and single IEEE division as the in-plan form. */
  def estimate(regs: Array[Int]): Double = {
    require(regs.length == M, s"register array must be length $M")
    val s = regs.map(r => 1L << (ScaleBits - math.min(r, ScaleBits))).sum
    alphaNum.toDouble * scaleOne.toDouble / 1000000000.0 / s.toDouble
  }

  /** DuckDB oracle for [[report]] over table `documents` keyed by
    * `source` — gram fingerprints, the md5 re-key, registers, ranks,
    * the exact integer sum, and the shared-literal estimate replayed
    * end to end. Hex digits parse through the
    * [[graft.oracle.Duck]] nibble idiom. */
  def oracleSql(keyCol: String = "source", n: Int = 3): String = {
    val nib = (c: String) => s"(strpos('0123456789abcdef', $c) - 1)"
    val payload = s"list_reduce(list_prepend(0::BIGINT, " +
      s"list_transform(range(3, 16), " +
      s"__hi -> ${nib("substr(h, __hi::INT, 1)")}::BIGINT)), " +
      s"(__ha, __hb) -> __ha * 16 + __hb)"
    s"""WITH toks AS (
       |  SELECT $keyCol, regexp_extract_all(lower(text), '\\S+') AS t
       |  FROM documents),
       |occ AS (
       |  SELECT $keyCol,
       |    ${graft.oracle.Duck.gramHash63Sql(
             s"array_to_string(t[__gi:__gi+${n - 1}], ' ')")} AS fp
       |  FROM toks,
       |    unnest(range(1, greatest(len(t) - ${n - 1}, 0) + 1))
       |      AS __gr(__gi)),
       |keyed AS (
       |  SELECT $keyCol, fp, md5(CAST(fp AS VARCHAR)) AS h FROM occ),
       |split AS (
       |  SELECT $keyCol, fp,
       |         ${nib("substr(h, 1, 1)")} * 16
       |           + ${nib("substr(h, 2, 1)")} AS register,
       |         $payload AS w
       |  FROM keyed),
       |regs AS (
       |  SELECT $keyCol, register,
       |         max(CASE WHEN w = 0 THEN $RhoMax
       |             ELSE $RhoMax - length(bin(w)) END) AS mj,
       |         count(DISTINCT fp) AS nd
       |  FROM split GROUP BY 1, 2),
       |agg AS (
       |  SELECT $keyCol,
       |         CAST(count(*) AS BIGINT) AS n_registers_hit,
       |         CAST(sum(1::BIGINT << ($ScaleBits - least(mj, $ScaleBits)))
       |              AS BIGINT)
       |           + ($M - count(*)) * $scaleOne AS s_scaled,
       |         CAST(sum(nd) AS BIGINT) AS exact_distinct
       |  FROM regs GROUP BY 1)
       |SELECT $keyCol, n_registers_hit, s_scaled,
       |       CAST($alphaNum AS DOUBLE) * CAST($scaleOne AS DOUBLE)
       |         / CAST(1000000000 AS DOUBLE) / CAST(s_scaled AS DOUBLE)
       |         AS est_distinct,
       |       exact_distinct
       |FROM agg ORDER BY $keyCol""".stripMargin
  }
}
