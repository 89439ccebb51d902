package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Signed random projection (Johnson–Lindenstrauss) dimensionality
  * reduction: each embedding × a deterministic ±1 matrix → `outDim`
  * components. The cheap-training-free reduction a pipeline runs before
  * LSH bucketing, coarse clustering, or shipping vectors downstream at
  * a fraction of the bytes — and the dense-output cousin of q33's
  * sign-LSH (same hyperplane family, [[Similarity.signMatrix]]'s fixed
  * LCG, components kept as values instead of collapsing to sign bits).
  *
  * EXACT integer arithmetic in disguise: inputs are the fixed-point
  * lifted components (ints ≤ 2²⁰ as doubles), the matrix is ±1, so
  * every product and every partial sum (≤ 2²⁶ · dim) is an integer far
  * below 2⁵³ — the `vec_dot` double fold computes them without
  * rounding, making the projection bit-reproducible regardless of
  * engine and CAST-able to BIGINT. One codegen'd scan, zero shuffle,
  * output rows = n × outDim.
  */
object Projection {

  /** (vec_id, dim_out ∈ [0, outDim), value) — value =
    * ⟨fx, s_j⟩ with s_j the j-th ±1 row of the shared sign matrix. */
  def project(emb: DataFrame, idCol: String, embCol: String,
      dim: Int, outDim: Int): DataFrame = {
    require(outDim >= 1 && dim >= 1, "dims must be positive")
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val m = Similarity.signMatrix(dim, outDim)
    val e = emb.select(col(idCol).cast("long").as("vec_id"),
      expr(s"transform(cast($embCol as array<double>), " +
        s"v -> CAST(floor(v * ${Clustering.Scale}D + 0.5D) AS DOUBLE))")
        .as("fxd"))
    val comps = (0 until outDim).map { j =>
      val lits = m(j).map(v => s"$v.0D").mkString(", ")
      expr(s"CAST(vec_dot(fxd, array($lits)) AS BIGINT)")
    }
    e.select(col("vec_id"), posexplode(array(comps: _*)).as(Seq("dim_out", "value")))
      .orderBy("vec_id", "dim_out")
  }

  /** DuckDB oracle for [[project]] over table `embeddings` — the same
    * LCG matrix rendered as list literals, the same sequential fold. */
  def oracleSql(dim: Int, outDim: Int): String = {
    val m = Similarity.signMatrix(dim, outDim)
    val lift = "list_transform(list_transform(embedding, x -> x::DOUBLE), " +
      s"v -> CAST(CAST(floor(v * ${Clustering.Scale} + 0.5) AS BIGINT) AS DOUBLE))"
    val rows = (0 until outDim).map { j =>
      val lits = m(j).map(v => s"$v.0").mkString(", ")
      val dot = s"list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}), " +
        s"__i -> fxd[__i] * ([$lits])[__i])), (acc, v) -> acc + v)"
      s"SELECT vec_id, CAST($j AS INTEGER) AS dim_out, CAST($dot AS BIGINT) AS value FROM e"
    }.mkString("\n  UNION ALL ")
    s"""WITH e AS (SELECT vec_id, $lift AS fxd FROM embeddings)
       |SELECT vec_id, dim_out, value FROM ($rows)
       |ORDER BY vec_id, dim_out""".stripMargin
  }
}
