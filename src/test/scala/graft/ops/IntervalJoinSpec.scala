package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Banded interval self-join: hand-built band edges (inclusive boundary,
  * bucket-crossing pairs, key isolation), equivalence with the naive
  * inequality join on the fixture, and the no-dup guarantee. */
class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(ms: Long) = new Timestamp(ms)

  test("band edges: inclusive at exactly delta, exclusive past it, cross-bucket pairs found") {
    import spark.implicits._
    // delta = 1000 ms. Events: 0 and 1000 are exactly delta apart
    // (inclusive → neighbors) and sit in DIFFERENT buckets; 0 and 1001
    // are past the band; 2500/2600 same bucket.
    val df = Seq(
      (1L, 1L, ts(0L), "a"),
      (2L, 1L, ts(1000L), "a"),
      (3L, 1L, ts(1001L), "b"),
      (4L, 1L, ts(2500L), "a"),
      (5L, 1L, ts(2600L), "b"),
      (6L, 2L, ts(0L), "a")) // other key: isolated
      .toDF("event_id", "user_id", "ts", "event_type")
    val r = IntervalJoin.nearbyCounts(df, "user_id", "event_id", "ts",
        "event_type", deltaMs = 1000L)
      .collect().map(x => x.getLong(0) -> (x.getLong(2), x.getLong(3))).toMap
    assert(r(1L) === (1L, 1L)) // sees 2 (=delta, same type); not 3 (1001 apart)
    assert(r(2L) === (2L, 1L)) // sees 1 (same type) and 3 (1 ms apart, other type)
    assert(r(3L) === (1L, 0L)) // sees 2 only
    assert(r(4L) === (1L, 0L)) // sees 5
    assert(r(5L) === (1L, 0L))
    assert(r(6L) === (0L, 0L)) // keys never mix; zero-neighbor row present
  }

  test("fixture equivalence: banded ≡ naive inequality join, across repartitions") {
    val events = graft.core.Tables.load(spark, TestSpark.Sf, "events")
    val delta = 3600000L
    val e = events.select(col("event_id"), col("user_id"),
      unix_millis(col("ts")).as("t"), col("event_type"))
    val b = e.select(col("event_id").as("id2"), col("user_id"),
      col("t").as("t2"), col("event_type").as("ty2"))
    val naive = e.join(b, Seq("user_id"))
      .filter(col("event_id") =!= col("id2") &&
        abs(col("t") - col("t2")) <= delta)
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_nearby"),
        sum(when(col("event_type") === col("ty2"), 1L).otherwise(0L))
          .as("n_same_type"))
    val expect = e.select("event_id").join(naive, Seq("event_id"), "left")
      .select(col("event_id"),
        coalesce(col("n_nearby"), lit(0L)),
        coalesce(col("n_same_type"), lit(0L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    for (p <- Seq(1, 7)) {
      val got = IntervalJoin.nearbyCounts(events.repartition(p), "user_id",
          "event_id", "ts", "event_type", delta)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
      assert(got == expect, s"repartition=$p")
    }
    // The fixture actually exercises the band: some events have neighbors.
    assert(expect.exists(_._2 > 0L))
  }
}
