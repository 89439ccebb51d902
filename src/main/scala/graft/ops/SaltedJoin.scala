package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for known key skew (builder brief: "salting for
  * skew").
  *
  * A plain shuffle join puts every row of a hot key into ONE task; with
  * 100 TB and a power-law key (the norm for user/entity logs) that task is
  * the job. Salting splits each left key into `salts` sub-keys and
  * replicates the (small-ish, but not broadcastable) right side once per
  * salt, so the hot key spreads across `salts` tasks.
  *
  * The salt is DETERMINISTIC — `pmod(hash(whole left row), salts)` — so
  * results are reproducible run to run. Multiplicity is preserved: each
  * left row carries exactly one salt and meets exactly one replica of each
  * matching right row.
  *
  * AQE's runtime skew-join splitting (on by default) covers sort-merge
  * skew adaptively; explicit salting remains the static-plan tool and
  * works for hash joins too.
  */
object SaltedJoin {

  def join(left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame =
    join(left, right, key, key, salts)

  /** The differently-named-keys form (`l.keyLeft = r.keyRight`). */
  def join(left: DataFrame, right: DataFrame, keyLeft: String,
      keyRight: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val leftCols = left.columns.map(col).toSeq
    val l = left.withColumn("__salt", pmod(hash(leftCols: _*), lit(salts)))
    val r = right
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, l(keyLeft) === r(keyRight) && l("__salt") === r("__salt"))
      .drop(r(keyRight)).drop(l("__salt")).drop(r("__salt"))
  }
}
