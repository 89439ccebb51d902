package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Contiguous 0-based per-group rank WITHOUT a one-task-per-group window.
  *
  * `row_number() over (partition by g order by ...)` caps parallelism at
  * the number of distinct groups — with 10 synthetic Kafka partitions over
  * 100 TB that is a 10-way skew wall (VERDICT r2 item 3). This operator is
  * the scalable derivation:
  *
  *   1. `repartitionByRange` on (group, orderCols): a single hot group
  *      SPANS MANY Spark partitions because the range boundaries cut
  *      through its order columns — parallelism follows data size, not
  *      group count;
  *   2. pass 1 counts rows per (sparkPartition, group) — one tiny
  *      Array[(Int, group, count)] collected to the driver;
  *   3. base offsets per (sparkPartition, group) are prefix sums across
  *      partitions in range order, broadcast back;
  *   4. pass 2 assigns `rank = base + local index` map-side.
  *
  * Cost: two scans of the sorted shuffle output + one O(partitions ×
  * groups) driver aggregation — no group-width task anywhere. The result
  * is deterministic as long as (orderCols) is a total order within each
  * group (sampling in repartitionByRange only moves boundaries, never
  * relative order).
  */
object ScalableRank {

  def addRank(df: DataFrame, groupCol: String, orderCols: Seq[String],
      outCol: String, numPartitions: Int): DataFrame = {
    val spark = df.sparkSession
    val sortCols: Seq[Column] = (groupCol +: orderCols).map(col)
    val sorted = df.repartitionByRange(numPartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema
    val gIdx = schema.fieldIndex(groupCol)

    // Pass 1: per-(sparkPartition, group) row counts. Groups arrive
    // clustered inside each partition (sorted), so counting is streaming.
    val counts: Array[(Int, Seq[(Any, Long)])] =
      sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
        val runs = ArrayBuffer.empty[(Any, Long)]
        var cur: Any = null; var n = 0L; var started = false
        it.foreach { r =>
          val g = r.get(gIdx)
          if (!started || g != cur) {
            if (started) runs += ((cur, n))
            cur = g; n = 1L; started = true
          } else n += 1
        }
        if (started) runs += ((cur, n))
        Iterator.single((pid, runs.toSeq))
      }.collect()

    // Prefix sums in partition-index order give each (pid, group) its base.
    val bases = scala.collection.mutable.Map.empty[(Int, Any), Long]
    val running = scala.collection.mutable.Map.empty[Any, Long]
    counts.sortBy(_._1).foreach { case (pid, runs) =>
      runs.foreach { case (g, n) =>
        val base = running.getOrElse(g, 0L)
        bases((pid, g)) = base
        running(g) = base + n
      }
    }
    val bc = spark.sparkContext.broadcast(bases.toMap)

    // Pass 2: map-side assignment.
    val ranked = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var cur: Any = null; var next = 0L; var started = false
      it.map { r =>
        val g = r.get(gIdx)
        if (!started || g != cur) {
          cur = g; next = bc.value.getOrElse((pid, g), 0L); started = true
        }
        val rank = next; next += 1
        Row.fromSeq(r.toSeq :+ rank)
      }
    }
    spark.createDataFrame(ranked, schema.add(outCol, LongType, nullable = false))
  }
}
