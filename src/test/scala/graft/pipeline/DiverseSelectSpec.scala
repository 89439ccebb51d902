package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DiverseSelectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Local replay of the exact greedy (same fixed-point lift, same Long
    * math, same tie rule). */
  private def brute(members: Seq[(Long, Array[Float])], k: Int): Seq[(Int, Long)] = {
    val ms = members.sortBy(_._1)
    val fxs = ms.map(_._2.map(v =>
      math.floor(v.toDouble * Clustering.Scale + 0.5).toLong).toArray)
    val ids = ms.map(_._1)
    val n = ids.length
    val dim = fxs.head.length
    val cent = new Array[Long](dim)
    fxs.foreach(v => (0 until dim).foreach(i => cent(i) += v(i)))
    def ldot(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => a(i) * b(i)).sum
    val rel = fxs.map(ldot(_, cent))
    val sel = scala.collection.mutable.ArrayBuffer.empty[Int]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    (1 to math.min(k, n)).foreach { t =>
      var best = -1; var bestScore = Long.MinValue
      (0 until n).foreach { m =>
        if (!sel.contains(m)) {
          val score =
            if (sel.isEmpty) rel(m)
            else rel(m) - n * sel.map(s => ldot(fxs(m), fxs(s))).max
          if (score > bestScore) { bestScore = score; best = m }
        }
      }
      sel += best; out += ((t, ids(best)))
    }
    out.toSeq
  }

  test("planted geometry: relevance picks the central member, diversity avoids its twin") {
    // group 0: a dominant direction (two near-identical heavy members)
    // plus an orthogonal one — MMR must take one heavy member first,
    // then prefer the orthogonal member over the near-twin.
    val e = (v: Seq[Double]) => v.map(_.toFloat).toArray
    val members = Seq(
      (1L, e(Seq(1.0, 0.0, 0.0, 0.0))),
      (2L, e(Seq(0.99, 0.01, 0.0, 0.0))),
      (3L, e(Seq(0.0, 0.8, 0.0, 0.0))))
    val df = members.map { case (id, emb) => (0L, id, emb) }
      .toDF("label", "vec_id", "embedding")
    val got = DiverseSelect.mmrSelect(df, "vec_id", "embedding", "label", 3)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    assert(got == brute(members, 3))
    assert(got.head._2 == 1L || got.head._2 == 2L) // a heavy member first
    assert(got(1)._2 == 3L, s"diversity must pick the orthogonal member second: $got")
  }

  test("fixture groups match the local greedy replay exactly") {
    val rows = graft.core.Tables.load(spark, TestSpark.Sf, "embeddings")
      .selectExpr("CAST(label AS BIGINT)", "CAST(vec_id AS BIGINT)", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).toArray))
    val want = rows.groupBy(_._1).toSeq.flatMap { case (grp, ms) =>
      brute(ms.map(m => (m._2, m._3)).toSeq, 3).map { case (rank, id) => (grp, rank, id) }
    }.sortBy(t => (t._1, t._2))
    val got = DiverseSelect.mmrSelect(
        graft.core.Tables.load(spark, TestSpark.Sf, "embeddings"),
        "vec_id", "embedding", "label", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(got.nonEmpty && got.groupBy(_._1).forall(_._2.length == 3))
  }

  test("k past group size degenerates to a full ranking; oversized group fails loudly") {
    val df = Seq((0L, 1L, Array(1.0f, 0.0f)), (0L, 2L, Array(0.0f, 1.0f)))
      .toDF("label", "vec_id", "embedding")
    val got = DiverseSelect.mmrSelect(df, "vec_id", "embedding", "label", 5)
      .collect()
    assert(got.length == 2)
    val big = (0 until DiverseSelect.MaxGroupMembers + 1)
      .map(i => (0L, i.toLong, Array(1.0f, 0.0f))).toDF("label", "vec_id", "embedding")
    val e = intercept[Exception] {
      DiverseSelect.mmrSelect(big, "vec_id", "embedding", "label", 2).collect()
    }
    assert(e.getMessage != null)
  }
}
