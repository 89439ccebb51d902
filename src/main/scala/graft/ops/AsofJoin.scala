package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left ("probe") row, attach the latest right
  * ("build") row with the same key whose time is <= the probe's time.
  *
  * The reference has no joins at all (SURVEY.md §2.6); this is the
  * canonical time-series operator a log-analytics engine needs. DuckDB
  * spells it `ASOF JOIN`; Spark has no built-in, and the naive
  * `probe JOIN build ON key = key AND bt <= pt` + argmax explodes
  * quadratically per key.
  *
  * Implementation is the scale-correct union-and-window plan:
  *
  *   1. tag probe rows (side=1) and build rows (side=0), union by name;
  *   2. one shuffle on `key`, sort within partitions by
  *      `(time, side, tieBreak)` — build rows sort before probe rows at
  *      equal time, so "<=" semantics fall out;
  *   3. `last(buildCols, ignoreNulls) over (partition by key order by ...
  *      rows unbounded preceding)` carries the most recent build row
  *      forward;
  *   4. keep probe rows only.
  *
  * Cost: ONE shuffle of |probe| + |build| rows, no join explosion, skew
  * bounded by the hottest key (same as any keyed window). At 100 TB this
  * is the plan you want; AQE handles residual skew.
  *
  * Ties among build rows at the same (key, time) are broken by the given
  * `tieBreak` column (largest wins), making the result deterministic.
  */
object AsofJoin {

  /** @param probe     left side; one output row per probe row
    * @param build     right side; columns in `attach` get carried
    * @param key       equi-join key column name (same name both sides)
    * @param probeTime probe-side event-time column
    * @param buildTime build-side event-time column
    * @param tieBreak  build-side column breaking (key, time) ties; max wins
    * @param attach    build-side columns to attach to each probe row
    */
  def asof(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      probeTime: String,
      buildTime: String,
      tieBreak: String,
      attach: Seq[String]): DataFrame = {

    val probeCols = probe.columns.toSeq
    require(!attach.contains(key), "attach columns must not include the key")

    // Normalize both sides to: key, __t, __side, __tie, probe payload, build payload.
    val pTagged = probe
      .withColumn("__t", col(probeTime))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast(build.schema(tieBreak).dataType))
      .select((Seq(col(key), col("__t"), col("__side"), col("__tie")) ++
        probeCols.filterNot(_ == key).map(col) ++
        attach.map(c => lit(null).cast(build.schema(c).dataType).as(s"__b_$c"))): _*)

    val bTagged = build
      .withColumn("__t", col(buildTime))
      .withColumn("__side", lit(0))
      .withColumn("__tie", col(tieBreak))
      .select((Seq(col(key), col("__t"), col("__side"), col("__tie")) ++
        probeCols.filterNot(_ == key).map(c => lit(null).cast(probe.schema(c).dataType).as(c)) ++
        attach.map(c => col(c).as(s"__b_$c"))): _*)

    // Build rows (__side=0) sort before probe rows at equal time: "<=".
    // __tie ascending puts the max-tieBreak build row last, so last() wins.
    val w = Window
      .partitionBy(key)
      .orderBy(col("__t"), col("__side"), col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = pTagged.unionByName(bTagged)
      .select((Seq(col(key), col("__t"), col("__side")) ++
        probeCols.filterNot(_ == key).map(col) ++
        attach.map(c => last(col(s"__b_$c"), ignoreNulls = true).over(w).as(c))): _*)

    carried
      .filter(col("__side") === 1)
      .select((probeCols.map(col) ++ attach.map(col)): _*)
  }
}
