package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `minhash_sig(text) → array<bigint>`: the whole MinHash signature in one
  * native pass — the "novel sketch as a custom Expression" path.
  *
  * The composed-built-ins formulation materializes a shingle array
  * (`transform(sequence(...), i -> rolling_hash(substring(...)))`, one
  * UTF8String allocation per 8-gram) and then runs 16 `transform`+
  * `array_min` passes over it. This expression computes the identical
  * numbers — k-gram polynomial hash `h = (h*31 + byte) & 0xFFFFFFFF`
  * maintained incrementally over a sliding window, each window hash fed
  * directly into the 16 running permutation minima — with ZERO per-row
  * allocations beyond the 16-slot output. (`min` over a multiset equals
  * `min` over the distinct set, so skipping `array_distinct` is exact.)
  *
  * ~20× less work per row than the HOF pipeline; same DuckDB oracle.
  *
  * PRECONDITION: shingles here are BYTE windows; the HOF formulation (and
  * the DuckDB oracle) window over CHARACTERS. The two agree exactly on
  * ASCII text — which the documents fixture is, verified — and the
  * equivalence test pins it; route non-ASCII corpora through the HOF form
  * or normalize first.
  */
case class MinHashSigExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigExpr.compute(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSigExpr.compute($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigExpr {
  /** Shared MinHash parameters (the DuckDB oracle renders the same ones). */
  val ShingleK = 8
  val NumHashes = 16
  /** Smallest prime > 2^32. */
  val P = 4294967311L
  /** a_j ∈ [1, 1e9) keeps a_j * shingle < 2^62 (no 64-bit overflow,
    * BIGINT-safe in the oracle too). */
  val A: Array[Long] = Array.tabulate(NumHashes)(j => 1L + (j.toLong * 73856093L) % 999999937L)
  val B: Array[Long] = Array.tabulate(NumHashes)(j => (j.toLong * 19349663L + 83492791L) % P)

  private final val Mask = 0xFFFFFFFFL
  /** 31^(K-1) & Mask — the factor of the byte leaving the window. */
  private final val TopPow: Long = {
    var p = 1L
    for (_ <- 1 until ShingleK) p = (p * 31) & Mask
    p
  }

  /** Returns null for texts shorter than one shingle (mirrors the
    * `length >= ShingleK` gate of the array formulation). */
  def compute(bytes: Array[Byte]): ArrayData = {
    val n = bytes.length
    if (n < ShingleK) return null
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    // initial window
    var h = 0L
    var i = 0
    while (i < ShingleK) { h = (h * 31 + (bytes(i) & 0xff)) & Mask; i += 1 }
    var start = 0
    while (true) {
      var j = 0
      while (j < NumHashes) {
        val v = (h * A(j) + B(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      if (start + ShingleK >= n) {
        return new GenericArrayData(mins)
      }
      // slide: remove bytes(start), add bytes(start+K) — all mod 2^32
      h = ((h - ((bytes(start) & 0xffL) * TopPow) & Mask) * 31 + (bytes(start + ShingleK) & 0xff)) & Mask
      start += 1
    }
    throw new IllegalStateException("unreachable")
  }
}
