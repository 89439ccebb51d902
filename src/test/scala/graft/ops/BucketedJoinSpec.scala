package graft.ops

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** Bucketing for co-located joins (builder brief: "repartition()/bucketing
  * for co-located joins"): both sides bucketed on the join key with the
  * same bucket count join WITHOUT a shuffle — the 100 TB answer for a
  * repeatedly-joined dimension that is too big to broadcast. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("same-bucketed tables join with zero shuffle exchanges") {
    // The in-memory catalog dies with the session, but the warehouse dirs
    // survive runs — clear both.
    for (t <- Seq("orders_bucketed", "customer_bucketed")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"/tmp/graft-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(dir)
      }
    }
    Tables.load(spark, TestSpark.Sf, "orders")
      .write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bucketed")
    Tables.load(spark, TestSpark.Sf, "customer")
      .write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val joined = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan) // co-located: no shuffle at all
      assert(joined.count() ==
        Tables.load(spark, TestSpark.Sf, "orders")
          .join(Tables.load(spark, TestSpark.Sf, "customer"),
            col("o_custkey") === col("c_custkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
