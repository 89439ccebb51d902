package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KLL quantile sketch (Karnin–Lang–Liberty, FOCS 2016 — public) — the
  * UNBOUNDED-domain companion to [[graft.streaming.StreamQuantiles]]'
  * fixed grid: the grid needs a known value range and answers with
  * bucket-width brackets; KLL needs no range contract and answers any
  * rank/quantile query with ε·n rank error at O(k·log(n/k)) space, and
  * sketches MERGE (the streaming/partition-parallel requirement).
  *
  * Compactor stack: level h holds items each standing for 2^h stream
  * elements; a full level sorts, keeps every other item (offset chosen
  * by a coin), and promotes the survivors to level h+1. Capacities
  * shrink geometrically toward the lowest levels (c = 2/3, floor 8),
  * which is what turns the naive log n · k space into KLL's ~k/(1−c).
  *
  * DETERMINISM (the repo convention): the coin is a seeded LCG stepped
  * once per compaction, so the same values in the same arrival order
  * yield the SAME sketch bit-for-bit — replayable telemetry. Different
  * arrival orders or partition splits may yield different sketches;
  * the rank-error BOUND holds for all of them (KllSpec observes it
  * across deliberately reordered splits), which is the property a
  * distribution monitor actually relies on.
  *
  * Scale shape: per-partition sketches build executor-side in one pass
  * ([[KllSketch.ofColumn]] — mapPartitions, no shuffle), and only the
  * O(k log n)-sized summaries move to the driver for the merge fold —
  * the [[graft.streaming.StreamHitters]] mergeable-summary pattern at
  * quantile grain. */
final class KllSketch private (
    val k: Int,
    seed: Long) extends Serializable {

  require(k >= 8, s"k must be >= 8: $k")

  /** compactors(h): buffer of items, each weighing 2^h. */
  private var compactors: Vector[scala.collection.mutable.ArrayBuffer[Double]] =
    Vector(scala.collection.mutable.ArrayBuffer.empty[Double])
  private var rng: Long = seed
  private var count: Long = 0L

  /** Total stream elements represented. */
  def n: Long = count

  /** Retained items across all levels (the space actually used). */
  def retained: Int = compactors.map(_.size).sum

  private def coin(): Boolean = {
    // MMIX LCG (Knuth) — deterministic, serializable state.
    rng = rng * 6364136223846793005L + 1442695040888963407L
    (rng >>> 63) == 1L
  }

  private def capacity(h: Int): Int = {
    val depth = compactors.size
    math.max(8, math.ceil(k * math.pow(2.0 / 3.0, (depth - 1 - h).toDouble)).toInt)
  }

  def update(v: Double): Unit = {
    compactors(0) += v
    count += 1
    compress()
  }

  private def compress(): Unit = {
    var h = 0
    while (h < compactors.size) {
      if (compactors(h).size > capacity(h)) {
        if (h + 1 == compactors.size)
          compactors = compactors :+ scala.collection.mutable.ArrayBuffer.empty[Double]
        val buf = compactors(h)
        val sorted = buf.sorted
        // Compact only an EVEN count so total retained weight stays
        // exactly n (standard KLL): an odd buffer's largest item sits
        // out at level h; pairing ceil/floor n/2 items into doubled
        // weight would drift the weight sum quantile() compares
        // against the count-derived target rank (ADVICE r17).
        val even = sorted.length & ~1
        val off = if (coin()) 1 else 0
        val survivors = (off until even by 2).map(sorted(_))
        compactors(h).clear()
        if (even < sorted.length) compactors(h) += sorted(even)
        compactors(h + 1) ++= survivors
      }
      h += 1
    }
  }

  /** Merge `other` into this sketch (levels concatenate; over-capacity
    * levels compact under THIS sketch's coin). */
  def merge(other: KllSketch): this.type = {
    require(other.k == k, s"cannot merge sketches with k=${other.k} into k=$k")
    while (compactors.size < other.compactors.size)
      compactors = compactors :+ scala.collection.mutable.ArrayBuffer.empty[Double]
    other.compactors.zipWithIndex.foreach { case (buf, h) =>
      compactors(h) ++= buf
    }
    count += other.count
    compress()
    this
  }

  /** Estimated number of stream elements ≤ x. */
  def rank(x: Double): Long =
    compactors.zipWithIndex.map { case (buf, h) =>
      buf.count(_ <= x).toLong << h
    }.sum

  /** Estimated quantile: the retained item whose cumulative weight
    * first reaches rank floor(p·(n−1)) — the engine's selection rule
    * (q53/q96), answered from the summary. */
  def quantile(p: Double): Double = {
    require(count > 0, "empty sketch")
    require(p >= 0.0 && p <= 1.0, s"p out of range: $p")
    val weighted = compactors.zipWithIndex.flatMap { case (buf, h) =>
      buf.map(v => (v, 1L << h))
    }.sortBy(_._1)
    val target = math.floor(p * (count - 1)).toLong
    var cum = 0L
    val it = weighted.iterator
    var last = weighted.head._1
    while (it.hasNext && cum <= target) {
      val (v, w) = it.next()
      last = v
      cum += w
    }
    last
  }
}

object KllSketch {

  def empty(k: Int, seed: Long = 0x6b6c6cL): KllSketch = new KllSketch(k, seed)

  /** One-pass distributed build: per-partition sketches seeded by the
    * partition index (deterministic under a fixed partitioning), merged
    * driver-side in partition order. Only the summaries move. */
  def ofColumn(df: DataFrame, valueCol: String, k: Int,
      seed: Long = 0x6b6c6cL): KllSketch = {
    val parts = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .rdd
      .mapPartitionsWithIndex { (pi, it) =>
        val s = new KllSketch(k, seed + pi)
        it.foreach(r => s.update(r.getDouble(0)))
        Iterator((pi, s))
      }
      .collect()
      .sortBy(_._1)
    parts.map(_._2).foldLeft(empty(k, seed))(_ merge _)
  }
}
