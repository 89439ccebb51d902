package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Zero-allocation word-set membership over lowered UTF-8 bytes.
  *
  * Every entry word is ≤ 8 ASCII bytes (asserted), so a maximal word-char
  * run packs into one long (first byte in the high bits, length
  * disambiguated by zero padding — word bytes are never 0) probed against
  * a small open-addressed long→mask table. Counting maximal `\w+` runs
  * equal to an entry word reproduces `regexp_count(lower(text),
  * '\b(w1|...|wn)\b')` exactly: a boundary-delimited match needs non-word
  * chars (or edges) on both sides, Java's default `\w` is ASCII
  * `[a-zA-Z0-9_]`, and two boundary-delimited matches can never overlap
  * (the argument [[LangScoresExpr]] pins with its equivalence gate).
  *
  * Shared by [[LangScoresExpr]] (per-language mask bits) and
  * [[WordSetCountExpr]] (single-bit membership).
  */
final class PackedWordTable(entries: Seq[(String, Int)]) extends Serializable {

  require(entries.nonEmpty, "packed word table requires at least one word")
  val maxLen: Int = entries.map(_._1.length).max
  require(maxLen <= 8, "packed word table requires words of <= 8 bytes")
  entries.foreach { case (w, _) =>
    require(w.nonEmpty && w.forall(c => c < 128), s"word '$w' must be non-empty ASCII")
  }

  private val size = Integer.highestOneBit(entries.size * 4 - 1) << 1 // ≥4× load
  private val tableMask = size - 1
  private val keys = new Array[Long](size)
  private val masks = new Array[Int](size)
  entries
    .groupBy { case (w, _) =>
      w.getBytes("US-ASCII").foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    }
    .foreach { case (k, ws) =>
      val mask = ws.map(_._2).reduce(_ | _)
      var slot = java.lang.Long.hashCode(k * 0x9E3779B97F4A7C15L) & tableMask
      while (keys(slot) != 0L) slot = (slot + 1) & tableMask
      keys(slot) = k
      masks(slot) = mask
    }

  @inline private def isWord(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'

  /** Mask for the word run `bytes[st, end)`, 0 when absent. A packed key
    * is never 0 (runs are non-empty word bytes), so 0 marks empty slots. */
  def lookup(bytes: Array[Byte], st: Int, end: Int): Int = {
    var key = 0L
    var k = st
    while (k < end) { key = (key << 8) | (bytes(k) & 0xffL); k += 1 }
    var slot = java.lang.Long.hashCode(key * 0x9E3779B97F4A7C15L) & tableMask
    while (keys(slot) != 0L && keys(slot) != key) slot = (slot + 1) & tableMask
    if (keys(slot) == key) masks(slot) else 0
  }

  /** Number of maximal word runs in `s` (lowered) that are entry words —
    * `regexp_count(lower(s), '\b(w1|...|wn)\b')`. */
  def count(s: UTF8String): Int = {
    val bytes = s.toLowerCase.getBytes
    val n = bytes.length
    var hits = 0
    var i = 0
    while (i < n) {
      if (isWord(bytes(i))) {
        val st = i
        while (i < n && isWord(bytes(i))) i += 1
        if (i - st <= maxLen && lookup(bytes, st, i) != 0) hits += 1
      } else i += 1
    }
    hits
  }
}
