package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded interval self-join — the range-join shape Spark has no native
  * operator for, done scale-correctly: pairs of same-key rows within a
  * time band (`|t1 − t2| ≤ delta`). A naive inequality self-join plans
  * as a per-key nested loop (quadratic in the hottest key — the classic
  * Spark range-join accident); the banded form buckets time into
  * `delta`-width cells, probes each row against three candidate cells
  * (its own ± 1 — the complete cover, since `|t1 − t2| ≤ delta` forces
  * `|bucket1 − bucket2| ≤ 1`), and joins on EQUALITY of (key, bucket) —
  * an ordinary shuffle join whose per-cell work is bounded by temporal
  * density, never key cardinality. Each qualifying pair meets in
  * exactly one (probe-bucket, build-bucket) combination (the probe's
  * three cells are distinct; the build side carries one cell per row),
  * so no dedup pass is needed.
  *
  * Scale: the probe side triples (three slim rows per event — id, key,
  * time, type), the build side stays 1×; both shuffle on (key, bucket),
  * so skew follows temporal hotspots and is salt-able like any equi-join
  * key. The exact band predicate filters inside the joined cell. This is
  * the events-side counterpart of [[AsofJoin]] (which wants the latest
  * PRIOR row; this wants ALL rows within the band).
  */
object IntervalJoin {

  /** Per-row neighborhood report: for every row of `df`,
    * `(id, key, n_nearby, n_same_type)` — how many OTHER same-`keyCol`
    * rows sit within ± `deltaMs` of it (epoch-millis distance on
    * `tsCol`, a TIMESTAMP), and how many of those share `typeCol`.
    * Annotation form: zero-neighbor rows report 0. */
  def nearbyCounts(df: DataFrame, keyCol: String, idCol: String,
      tsCol: String, typeCol: String, deltaMs: Long): DataFrame = {
    require(deltaMs > 0, s"band width must be positive: $deltaMs")
    val base = df.select(col(keyCol).as("k"), col(idCol).as("id"),
      unix_millis(col(tsCol)).as("t"), col(typeCol).as("ty"))
    val probe = base.select(col("k"), col("id"), col("t"), col("ty"),
      explode(array(expr(s"(t div $deltaMs) - 1"), expr(s"t div $deltaMs"),
        expr(s"(t div $deltaMs) + 1"))).as("bucket"))
    val build = base
      .select(col("k"), col("id").as("id2"), col("t").as("t2"),
        col("ty").as("ty2"), expr(s"t div $deltaMs").as("bucket"))
    val counts = probe.join(build, Seq("k", "bucket"))
      .filter(col("id") =!= col("id2") &&
        abs(col("t") - col("t2")) <= deltaMs)
      .groupBy("id")
      .agg(count(lit(1)).as("n_nearby"),
        sum(when(col("ty") === col("ty2"), 1L).otherwise(0L))
          .as("n_same_type"))
    base.select(col("id"), col("k"))
      .join(counts, Seq("id"), "left")
      .select(col("id"), col("k").as("key"),
        coalesce(col("n_nearby"), lit(0L)).as("n_nearby"),
        coalesce(col("n_same_type"), lit(0L)).as("n_same_type"))
      .orderBy("id")
  }

  /** DuckDB oracle for [[nearbyCounts]] over table `events` with
    * key=user_id, id=event_id, type=event_type — the naive inequality
    * join (fine at oracle scale; the banded plan exists precisely
    * because this shape is quadratic per key at 100 TB). */
  def eventsOracleSql(deltaMs: Long): String =
    s"""WITH e AS (
       |  SELECT event_id, user_id, epoch_ms(ts) AS t, event_type
       |  FROM events)
       |SELECT a.event_id AS id, a.user_id AS key,
       |       CAST(coalesce(sum(CASE WHEN b.event_id IS NOT NULL
       |                               THEN 1 END), 0) AS BIGINT) AS n_nearby,
       |       CAST(coalesce(sum(CASE WHEN b.event_type = a.event_type
       |                               THEN 1 END), 0) AS BIGINT) AS n_same_type
       |FROM e a LEFT JOIN e b
       |  ON a.user_id = b.user_id AND a.event_id <> b.event_id
       |     AND abs(a.t - b.t) <= $deltaMs
       |GROUP BY a.event_id, a.user_id
       |ORDER BY a.event_id""".stripMargin
}
