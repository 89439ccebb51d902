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

  /** DuckDB oracle for [[signatures]] on table `documents`. */
  def oracleSql: String = {
    val rh = Duck.rollingHashSql("t")
    s"""WITH hs AS (
       |  SELECT doc_id,
       |    list_transform(regexp_extract_all(text, '\\S+'), t -> $rh) AS hashes
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(list_sum(list_transform(range(0, $Bits), i ->
       |    CASE WHEN 2 * len(list_filter(hashes, h -> ((h >> i) & 1) = 1)) >= len(hashes)
       |         THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS simhash
       |FROM hs ORDER BY doc_id""".stripMargin
  }
}
