package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `explain("formatted")` for the plan-critical queries
  * (the shapes PlanAuditSpec asserts). Usage:
  *   runMain graft.Plans [sfDir] > PLANS.txt
  */
object Plans {
  val Flagships = Seq(
    "q01_scan", "q04_key_regex", "q12_join", "q15_topk", "q16_scalar",
    "q18_asof_join", "q22_minhash_pairs", "q23_ann_topk", "q29_sessionize")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Flagships.foreach { name =>
      println(s"\n===================== $name =====================")
      println(SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
