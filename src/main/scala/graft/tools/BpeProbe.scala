package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing probe for BPE merge training. */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft-sf-big"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val words = docs.select(explode(
        graft.functions.GraftFunctions.wordGrams(col("text"), 1)).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
    val wf = words.groupBy("word").agg(count(lit(1)).as("f"))
    t("word-freq count")(println("vocab=" + wf.count()))
    t("token total")(println("tokens=" +
      wf.agg(sum("f")).collect()(0).getLong(0)))
    val m1 = t("1 round")(graft.pipeline.BpeMerges
      .merges(docs, "text", 1).collect().toSeq)
    println(m1)
    val m3 = t("3 rounds")(graft.pipeline.BpeMerges
      .merges(docs, "text", 3).collect().toSeq)
    println(m3)
    spark.stop()
  }
}
