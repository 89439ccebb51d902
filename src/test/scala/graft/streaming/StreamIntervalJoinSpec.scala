package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Stream-stream interval join: multi-batch in-order delivery ≡ the
  * batch join under the same predicate; an aggressive watermark drops
  * genuinely late rows (the bounded-state trade, demonstrated rather
  * than assumed). */
class StreamIntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private type Ev = (Long, Long, Long) // (event_id, ts_ms, user_id)

  private def toEvents(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    df.toDF("event_id", "ts_ms", "user_id")
      .select(col("event_id"), timestamp_millis(col("ts_ms")).as("ts"),
        col("user_id"))

  private def run(leftRows: Seq[Seq[Ev]], rightRows: Seq[Seq[Ev]],
      band: String, delay: String): Set[(Long, Long, Long)] = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val li = MemoryStream[Ev]
    val ri = MemoryStream[Ev]
    val joined = StreamIntervalJoin.join(
      toEvents(li.toDF()), toEvents(ri.toDF()), band, delay)
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("sij_out").start()
    try {
      leftRows.zipAll(rightRows, Seq.empty[Ev], Seq.empty[Ev]).foreach {
        case (lb, rb) =>
          if (lb.nonEmpty) li.addData(lb)
          if (rb.nonEmpty) ri.addData(rb)
          q.processAllAvailable()
      }
      q.processAllAvailable()
      spark.table("sij_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS sij_out")
    }
  }

  private def batchTruth(left: Seq[Ev], right: Seq[Ev], bandMs: Long)
      : Set[(Long, Long, Long)] =
    (for {
      (la, lt, lu) <- left
      (rb, rt, ru) <- right
      if lu == ru && math.abs(lt - rt) <= bandMs
    } yield (lu, la, rb)).toSet

  test("in-order multi-batch delivery ≡ the batch join") {
    val t0 = 1600000000000L
    val left = Seq(
      (1L, t0, 10L), (2L, t0 + 60000L, 10L), (3L, t0 + 7200000L, 10L),
      (4L, t0 + 120000L, 20L))
    val right = Seq(
      (101L, t0 + 30000L, 10L), (102L, t0 + 3500000L, 10L),
      (103L, t0 + 150000L, 20L), (104L, t0, 99L))
    val got = run(
      leftRows = Seq(left.take(2), left.drop(2)),
      rightRows = Seq(right.take(2), right.drop(2)),
      band = "1 HOUR", delay = "10 DAYS")
    assert(got === batchTruth(left, right, 3600000L))
    assert(got.nonEmpty)
    // Cross-user pairs never join; the user-99 row matches nothing.
    assert(!got.exists(_._1 == 99L))
  }

  test("a row later than the watermark delay is dropped from the join") {
    val t0 = 1600000000000L
    // Batch 1 advances both watermarks far past t0 (delay 1 min);
    // batch 2's left row at t0 is then hopelessly late — its would-be
    // match (right row at t0, batch 1) has been evicted.
    val left = Seq(Seq((1L, t0 + 86400000L, 10L)), Seq((2L, t0, 10L)))
    val right = Seq(Seq((101L, t0, 10L), (102L, t0 + 86400000L, 10L)),
      Seq.empty[Ev])
    val got = run(left, right, band = "1 HOUR", delay = "1 MINUTE")
    // The on-time pair (1, 102) survives; the late pair (2, 101) does not.
    assert(got.contains((10L, 1L, 102L)))
    assert(!got.contains((10L, 2L, 101L)))
  }
}
