package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The adaptive half of the skew story ([[SaltedJoin]] is the static
  * half, q109): AQE's OptimizeSkewedJoin splits a hot key's oversized
  * partition at runtime. Demonstrated, not assumed — the plan carries
  * the skew marker and the answer matches the plain join. */
class AqeSkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AQE splits the hot key's partition; answer unchanged") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // Make the skew detector fire at toy scale and forbid broadcast so
      // a shuffle join actually plans.
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // 50k rows of key 0 + a thin tail: one partition dwarfs the rest.
      // No manual repartition — OptimizeSkewedJoin only splits the
      // join's own ENSURE_REQUIREMENTS exchanges.
      val left = ((1 to 50000).map(i => (0L, i.toLong)) ++
        (1 to 200).map(i => (i.toLong, i.toLong)))
        .toDF("k", "v")
      val right = (0 to 200).map(i => (i.toLong, s"r$i")).toDF("k", "tag")
      val joined = left.join(right, "k")
      // collect() executes THIS QueryExecution (count() would build its
      // own and leave this plan un-finalized).
      assert(joined.collect().length === 50200)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), p)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
