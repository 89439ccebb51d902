package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.oracle.Duck

/** Deterministic per-epoch corpus shuffle: every document gets a shard
  * and an in-shard position, both pure functions of (epoch, doc_id) — the
  * reshuffle-between-epochs step of a training-data pipeline, with no RNG
  * state to seed, checkpoint or synchronize: re-running any epoch on any
  * cluster size reproduces the identical order.
  *
  * The md5 of `"e<epoch>:<doc_id>"` IS the random draw; the shard is a
  * rolling-hash of that digest mod `numShards`, and the position is the
  * rank of the digest within the shard.
  *
  * Scale shape: shard assignment is a narrow map (no shuffle); ranking
  * shuffles once on the shard key. `numShards` is chosen so one shard ≈
  * one training file (hundreds of MB), so at 100 TB there are 10⁵-10⁶
  * shards — far more than executors, and md5 spreads docs uniformly, so
  * the per-shard rank window parallelizes with NO skewed or giant
  * partition (contrast a single global `row_number`, which serializes
  * the corpus through one task).
  */
object EpochShuffle {

  /** (doc_id, shard, pos): shard in [0, numShards), pos = 1..|shard|. */
  def assign(docs: DataFrame, idCol: String, epoch: Int, numShards: Int)
      : DataFrame = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    GraftFunctions.register(docs.sparkSession)
    val pick = md5(concat(lit(s"e$epoch:"), col(idCol).cast("string")))
    val shard = pmod(GraftFunctions.rollingHash(pick), lit(numShards.toLong))
      .cast("int")
    val w = Window.partitionBy("shard").orderBy(col("pick"), col("doc_id"))
    docs.select(col(idCol).cast("long").as("doc_id"), pick.as("pick"),
        shard.as("shard"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[assign]] over table `documents`. */
  def oracleSql(epoch: Int, numShards: Int): String = {
    val pick = s"md5(concat('e$epoch:', CAST(doc_id AS VARCHAR)))"
    val fp = Duck.rollingHashSql(pick)
    s"""WITH s AS (
       |  SELECT doc_id, $pick AS pick,
       |    CAST((($fp % $numShards) + $numShards) % $numShards AS INT) AS shard
       |  FROM documents)
       |SELECT doc_id, shard,
       |  CAST(row_number() OVER (PARTITION BY shard ORDER BY pick, doc_id)
       |    AS BIGINT) AS pos
       |FROM s ORDER BY doc_id""".stripMargin
  }
}
