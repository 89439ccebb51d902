package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Exclusive global running sum WITHOUT a single-partition window.
  *
  * `sum(v) over (order by k rows unbounded preceding)` plans as a
  * one-partition window — a serialization wall at corpus scale. The
  * scalable derivation mirrors [[ScalableRank]] (and Spark core's own
  * `RDD.zipWithIndex`):
  *
  *   1. `repartitionByRange` + in-partition sort on the order columns:
  *      partitions hold contiguous key ranges, parallelism follows data
  *      size;
  *   2. pass 1 reduces each partition to ONE long (its value-column
  *      total) — the P-element result is collected and prefix-scanned on
  *      the driver. This is a METADATA-sized collect, O(numPartitions)
  *      longs, the exact pattern `zipWithIndex` uses for its per-partition
  *      counts — not a data collect (group cardinality is 1; contrast the
  *      O(P×G) driver map VERDICT r3 flagged in the old ScalableRank);
  *   3. pass 2 re-reads the sorted shuffle output (one RDD lineage, map
  *      stage reused) and emits `base + running local sum` — the big side
  *      never moves again.
  *
  * The result is the exclusive prefix sum: each row gets the total of all
  * STRICTLY PRECEDING rows in (orderCols) order. `valueCol` must be a
  * non-null LONG.
  *
  * CALLER CONTRACT — `orderCols` must be a TOTAL order (no two rows equal
  * on all of them; end with a unique key such as ShardPack's `doc_id`).
  * With duplicate keys the result is run-NONDETERMINISTIC: pass 2
  * re-sorts the shuffle output independently of pass 1, and tied rows may
  * land in either relative order between the passes, swapping their
  * prefix values (ADVICE r5). Uniqueness is a data property a transform
  * cannot check without an extra aggregate, so it is a documented
  * contract, not a runtime assert — [[graft.pipeline.ShardPack]] (the
  * only production caller) satisfies it by ordering on the unique doc id.
  */
object ScalableCumSum {

  def addCumSum(df: DataFrame, orderCols: Seq[String], valueCol: String,
      outCol: String, numPartitions: Int): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must name a total order (unique tiebreaker last)")
    val spark = df.sparkSession
    val sortCols = orderCols.map(col)
    val sorted = df.repartitionByRange(numPartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema
    val vIdx = schema.fieldIndex(valueCol)
    val rdd = sorted.rdd

    // Pass 1: one long per partition.
    val perPartition = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(vIdx))
        Iterator((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    // Exclusive scan: bases(p) = total of partitions 0..p-1. Captured in
    // the task closure — numPartitions longs, shipped once per task.
    val bases = perPartition.scanLeft(0L)(_ + _)

    // Pass 2: map-side emit of base + running local sum.
    val withSum = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = bases(pid)
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ acc)
        acc += r.getLong(vIdx)
        out
      }
    }
    spark.createDataFrame(withSum, schema.add(outCol, LongType, nullable = false))
  }
}
