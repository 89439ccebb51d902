package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal-marginal-relevance (MMR) diverse exemplar selection: per
  * group, greedily pick `k` members that are RELEVANT (close to the
  * group's centroid direction) yet mutually DIVERSE — the
  * representative-subset op behind "show me 3 exemplar documents per
  * cluster" curation reviews and diverse few-shot pools (Carbonell &
  * Goldstein, SIGIR'98).
  *
  * Semantics, in the inner-product form: with λ = 1/2,
  *   pick_1 = argmax rel(d),
  *   pick_t = argmax [ rel(d)/n − max_{s∈S} dot(d, s) ]  (d ∉ S),
  * where rel(d) = dot(d, Σ_members) = n · dot(d, centroid) and ties go
  * to the lowest id. Every quantity is computed on the [[Clustering]]
  * fixed-point lift (`floor(v·2^20 + 0.5)`), so rel, dot, and the
  * scaled comparison `rel(d) − n·maxdiv` are EXACT Long integers —
  * engine-independent bit-reproducibility with no IEEE ceremony at all
  * (the score column is integer; the oracle compares BIGINTs). The
  * n-scaling is a monotone transform within a group (n is constant), so
  * the selection equals the λ = 1/2 MMR over mean-centroid relevance.
  *
  * Scale shape: one narrow scan lifts (group, id, fx); each group's
  * members gather ONCE into a `flatMapGroups` cell (the
  * [[Similarity.topPairPerGroup]] / [[Clustering.semanticDedup]]
  * grouped-vector pattern — no pair rows, no join-back, embeddings
  * cross the one grouping exchange once); the greedy scan is O(n·k·dim)
  * per cell, linear in members for fixed k. Groups must be
  * executor-sized — the q26 bounded-cell contract: group count grows
  * with the corpus (finer clustering), population per group stays
  * bounded, enforced here by a loud per-cell `require`.
  *
  * Overflow envelope: |fx| ≤ 2^20 (unit-scale embeddings), dim = 64 ⇒
  * |dot| ≤ 2^46; |rel| and n·maxdiv ≤ n·2^46, exact in Long through
  * the 2^13 group cap (2^13·2^46 = 2^59 < 2^63) with 16× headroom. */
object DiverseSelect {

  /** Members per group above which the grouped cell fails loudly (the
    * executor-sized-cell contract — 2^13 members × 64 longs ≈ 4 MB per
    * cell; also keeps `n·maxdiv` inside Long, see the envelope note). */
  val MaxGroupMembers: Int = 1 << 13

  /** (group, rank 1..k, vec_id) — the k MMR picks per group in
    * selection order. */
  def mmrSelect(corpus: DataFrame, idCol: String, embCol: String,
      groupCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val spark = corpus.sparkSession
    import spark.implicits._
    val lifted = corpus.select(
      col(groupCol).cast("long").as("grp"),
      col(idCol).cast("long").as("vec_id"),
      expr(s"transform(CAST($embCol AS ARRAY<DOUBLE>), " +
        s"v -> CAST(floor(v * ${Clustering.Scale}D + 0.5D) AS BIGINT))")
        .as("fx"))
    lifted.as[(Long, Long, Array[Long])]
      .groupByKey(_._1)
      .flatMapGroups { (grp: Long, it: Iterator[(Long, Long, Array[Long])]) =>
        val idBuf = scala.collection.mutable.ArrayBuffer.empty[Long]
        val fxBuf = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
        it.foreach { case (_, id, fx) => idBuf += id; fxBuf += fx }
        val n = idBuf.length
        require(n <= MaxGroupMembers,
          s"mmrSelect group $grp has $n members > $MaxGroupMembers: " +
            "groups must be executor-sized — cluster finer (more groups) " +
            "before selecting exemplars")
        val order = Array.range(0, n).sortBy(idBuf(_))
        val ids = order.map(idBuf(_))
        val fxs = order.map(fxBuf(_))
        val dim = fxs(0).length
        // centroid sum (exact Long per dimension)
        val cent = new Array[Long](dim)
        fxs.foreach { v =>
          var i = 0
          while (i < dim) { cent(i) += v(i); i += 1 }
        }
        def ldot(a: Array[Long], b: Array[Long]): Long = {
          var acc = 0L; var i = 0
          while (i < a.length) { acc += a(i) * b(i); i += 1 }
          acc
        }
        val rel = fxs.map(ldot(_, cent))
        val picked = new Array[Boolean](n)
        val out = Seq.newBuilder[(Long, Int, Long)]
        val sel = scala.collection.mutable.ArrayBuffer.empty[Int]
        var t = 1
        while (t <= math.min(k, n)) {
          var best = -1
          var bestScore = Long.MinValue
          var m = 0
          while (m < n) {
            if (!picked(m)) {
              // scaled MMR score: rel − n·max_{s∈S} dot(d, s); for the
              // first pick S is empty and the score is rel alone
              var maxDiv = Long.MinValue
              sel.foreach { s =>
                val d = ldot(fxs(m), fxs(s))
                if (d > maxDiv) maxDiv = d
              }
              val score = if (sel.isEmpty) rel(m) else rel(m) - n * maxDiv
              // strictly greater keeps the lowest-id maximum (members
              // scan in ascending-id order)
              if (score > bestScore) { bestScore = score; best = m }
            }
            m += 1
          }
          picked(best) = true
          sel += best
          out += ((grp, t, ids(best)))
          t += 1
        }
        out.result().iterator
      }
      .toDF("grp", "rank", "vec_id")
      .withColumn("rank", col("rank").cast("int"))
  }

  /** DuckDB oracle for [[mmrSelect]] over table `embeddings` grouped by
    * `label`, k picks as `k` unrolled greedy stages (the
    * [[Sampling]] waterfill convention: the oracle replays the same
    * rounds as a CTE chain). Selection math is BIGINT end-to-end. */
  def oracleSql(k: Int, dim: Int): String = {
    val scale = Clustering.Scale.toLong
    def dotSql(a: String, b: String): String =
      s"list_sum(list_transform(range(1, $dim + 1), i -> $a[i] * $b[i]))"
    // stage CTEs: divs_t = each member's max dot against the picks so
    // far (a join, not a correlated-lambda subquery — DuckDB lambdas
    // cannot reference correlated outer columns); sel_t = the argmax of
    // the scaled MMR score among unpicked members; picked_t accumulates
    val stages = (2 to k).map { t =>
      s"""divs$t AS (
         |  SELECT grp, vec_id, max(d) AS maxdiv FROM (
         |    SELECT m.grp, m.vec_id,
         |      CAST(${dotSql("m.fx", "s.fx")} AS BIGINT) AS d
         |    FROM scored m
         |    JOIN picked${t - 1} p ON p.grp = m.grp
         |    JOIN members s ON s.grp = p.grp AND s.vec_id = p.vec_id)
         |  GROUP BY grp, vec_id),
         |sel$t AS (
         |  SELECT grp, $t AS rank, vec_id FROM (
         |    SELECT m.grp, m.vec_id,
         |      row_number() OVER (PARTITION BY m.grp ORDER BY
         |        (m.rel - m.n * d.maxdiv) DESC, m.vec_id ASC) AS rn
         |    FROM scored m
         |    JOIN divs$t d ON d.grp = m.grp AND d.vec_id = m.vec_id
         |    WHERE NOT EXISTS (SELECT 1 FROM picked${t - 1} p
         |                      WHERE p.grp = m.grp AND p.vec_id = m.vec_id)
         |  ) WHERE rn = 1),
         |picked$t AS (SELECT * FROM picked${t - 1}
         |             UNION ALL SELECT grp, vec_id FROM sel$t)""".stripMargin
    }
    val selUnion = (1 to k).map(t => s"SELECT grp, rank, vec_id FROM sel$t")
      .mkString("\n  UNION ALL ")
    s"""WITH members AS (
       |  SELECT CAST(label AS BIGINT) AS grp, CAST(vec_id AS BIGINT) AS vec_id,
       |    list_transform(embedding,
       |      v -> CAST(floor(CAST(v AS DOUBLE) * $scale + 0.5) AS BIGINT)) AS fx
       |  FROM embeddings),
       |cent AS (
       |  SELECT grp, list(s ORDER BY i) AS cfx, max(nm) AS n FROM (
       |    SELECT m.grp, t.i, CAST(sum(m.fx[t.i]) AS BIGINT) AS s,
       |      count(*) AS nm
       |    FROM members m, range(1, $dim + 1) t(i)
       |    GROUP BY m.grp, t.i)
       |  GROUP BY grp),
       |scored AS (
       |  SELECT m.grp, m.vec_id, m.fx,
       |    CAST(${dotSql("m.fx", "c.cfx")} AS BIGINT) AS rel,
       |    CAST(c.n AS BIGINT) AS n
       |  FROM members m JOIN cent c USING (grp)),
       |sel1 AS (
       |  SELECT grp, 1 AS rank, vec_id FROM (
       |    SELECT grp, vec_id,
       |      row_number() OVER (PARTITION BY grp
       |        ORDER BY rel DESC, vec_id ASC) AS rn
       |    FROM scored) WHERE rn = 1),
       |picked1 AS (SELECT grp, vec_id FROM sel1),
       |${stages.mkString(",\n")}
       |SELECT grp, rank, vec_id FROM (
       |  $selUnion)
       |ORDER BY grp, rank""".stripMargin
  }
}
