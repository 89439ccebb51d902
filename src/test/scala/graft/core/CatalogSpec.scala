package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The SQL surface: catalog views + custom functions + the pruning rule
  * all reachable through spark.sql. */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("fixture tables and record-log topics are queryable via SQL") {
    Catalog.registerViews(spark, TestSpark.Sf)
    assert(spark.sql("SELECT count(*) FROM lineitem").head().getLong(0) > 0)
    val recs = spark.sql(
      "SELECT key, value FROM events_log WHERE key = '13' ORDER BY `partition`, `offset`")
    assert(recs.count() > 0)
    assert(spark.sql("SELECT count(*) FROM clicks_log").head().getLong(0) > 0)
  }

  test("custom functions resolve in SQL") {
    Catalog.registerViews(spark, TestSpark.Sf)
    val r = spark.sql(
      "SELECT kafka_partition('k2', 10) AS p, rolling_hash('abc') AS h").head()
    assert(r.getAs[Int]("p") == Murmur2.partition("k2", 10))
    assert(r.getAs[Long]("h") ==
      graft.functions.RollingHashExpr.hash("abc".getBytes))
  }

  test("SQL aggregation over the record log joins the relational surface") {
    Catalog.registerViews(spark, TestSpark.Sf)
    val df = spark.sql(
      """SELECT `partition`, count(*) AS n FROM events_log
        |GROUP BY `partition` ORDER BY `partition`""".stripMargin)
    assert(df.count() > 0)
  }
}
