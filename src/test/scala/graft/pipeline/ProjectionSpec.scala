package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** JL projection: exactness against a driver-side integer recompute,
  * norm preservation in expectation, and shape. */
class ProjectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def emb = graft.core.Tables.load(spark, TestSpark.Sf, "embeddings")

  test("projection ≡ exact integer recompute (no FP rounding anywhere)") {
    import spark.implicits._
    val m = Similarity.signMatrix(64, 16)
    val raw = emb.select(col("vec_id"),
        col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().toMap
    val got = Projection.project(emb, "vec_id", "embedding", 64, 16)
      .as[(Long, Int, Long)].collect()
    assert(got.length === raw.size * 16)
    got.foreach { case (vid, j, value) =>
      val fx = raw(vid).map(v => math.floor(v * Clustering.Scale + 0.5).toLong)
      val expect = fx.zip(m(j)).map { case (x, s) => x * s }.sum
      assert(value === expect, s"vec $vid dim $j")
    }
  }

  test("rows per vector = outDim, deterministic across runs") {
    val a = Projection.project(emb, "vec_id", "embedding", 64, 16).collect()
    val b = Projection.project(emb, "vec_id", "embedding", 64, 16).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.length === emb.count() * 16)
  }

  test("JL property: projected squared distances track originals (scaled)") {
    import spark.implicits._
    // For ±1 projections E[|Px − Py|²] = outDim · |x − y|² — check the
    // fixture's average ratio lands near outDim within a loose factor.
    val proj = Projection.project(emb.limit(40), "vec_id", "embedding", 64, 16)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3.toDouble)).toMap
    val raw = emb.limit(40).select(col("vec_id"),
        expr(s"transform(cast(embedding as array<double>), " +
          s"v -> floor(v * ${Clustering.Scale}D + 0.5D))"))
      .as[(Long, Array[Double])].collect().toMap
    val ids = raw.keys.toSeq.sorted
    var ratioSum = 0.0; var nPairs = 0
    for (i <- ids.indices; jj <- (i + 1) until ids.length) {
      val (a, b) = (ids(i), ids(jj))
      val d2 = raw(a).zip(raw(b)).map { case (x, y) => (x - y) * (x - y) }.sum
      val p2 = proj(a).zip(proj(b)).map { case (x, y) => (x - y) * (x - y) }.sum
      if (d2 > 0) { ratioSum += p2 / d2; nPairs += 1 }
    }
    val avg = ratioSum / nPairs
    assert(avg > 16 * 0.5 && avg < 16 * 2.0,
      s"mean ratio $avg should be near outDim=16")
  }
}
