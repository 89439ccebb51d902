package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Paraphrase mining — the cross-signal composition the two similarity
  * families exist for: pairs that are SEMANTICALLY near (embedding
  * cosine ≥ `minCos`, the q33 signal) but LEXICALLY far (token
  * n-gram Jaccard ≤ `maxJac`, the q27 signal). High-cos/high-Jaccard is
  * a near-duplicate — q33/q22 territory, dedup fodder; high-cos/LOW-
  * Jaccard is the same content in different words: paraphrase/
  * translation-adjacent pairs, the raw material for contrastive and
  * instruction-variety training sets, and exactly what a dedup
  * pipeline should NOT delete. The composition answers "what would
  * semantic dedup (q49) remove that lexical dedup (q22) would keep?"
  * — a question either signal alone cannot pose.
  *
  * Scale shape: candidates come from the banded sign-LSH generator
  * ([[Similarity.bucketedNearDupPairs]] — |corpus|×bands slim rows,
  * never all-pairs, first-agreeing-band uniqueness, exact cosine
  * verify), so the lexical stage only ever sees candidate-pair-sized
  * frames: each side joins its sorted distinct gram-fingerprint array
  * (one tokenize pass, per-row array work) and the intersection is
  * the codegen'd sorted-merge `sorted_intersect_count` — no explode,
  * no per-gram shuffle. Jaccard divides exact integers once (IEEE,
  * engine-identical); the empty-union edge (both docs shorter than n
  * tokens) reads 0.0 by definition on both engines. */
object Paraphrase {

  /** (doc_a, doc_b, cos, n_a, n_b, n_shared, jaccard) for candidate
    * pairs with cosine ≥ `minCos` and gram Jaccard ≤ `maxJac`, ordered
    * by pair. `corpus` carries (`idCol`, `textCol`, `embCol`) — ids
    * must be unique; gram grain is `n`-token shingles under the
    * corpus-wide 63-bit hash convention. */
  def minePairs(corpus: DataFrame, idCol: String, textCol: String,
      embCol: String, dim: Int, minCos: Double, maxJac: Double,
      n: Int = 3): DataFrame = {
    require(maxJac >= 0.0 && maxJac <= 1.0, s"maxJac in [0,1]: $maxJac")
    GraftFunctions.register(corpus.sparkSession)
    val cand = Similarity.bucketedNearDupPairs(
      corpus.select(col(idCol), col(embCol)), idCol, embCol, dim, minCos)
    val sets = corpus.select(col(idCol).cast("long").as("__sid"),
      array_sort(array_distinct(
        GraftFunctions.wordGramHashes(col(textCol), n))).as("__g"))
    cand
      .join(sets.select(col("__sid").as("vec_a"), col("__g").as("__ga")),
        "vec_a")
      .join(sets.select(col("__sid").as("vec_b"), col("__g").as("__gb")),
        "vec_b")
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"),
        col("cos"),
        size(col("__ga")).cast("long").as("n_a"),
        size(col("__gb")).cast("long").as("n_b"),
        expr("CAST(sorted_intersect_count(__ga, __gb) AS BIGINT)")
          .as("n_shared"))
      .withColumn("jaccard",
        when(col("n_a") + col("n_b") - col("n_shared") === 0L, lit(0.0))
          .otherwise(col("n_shared").cast("double") /
            (col("n_a") + col("n_b") - col("n_shared")).cast("double")))
      .filter(col("jaccard") <= maxJac)
      .orderBy("doc_a", "doc_b")
  }

  /** DuckDB oracle for the q134 registration: the planted corpus
    * (base ∪ same-text perturbed dups ∪ reversed-text perturbed
    * paraphrases on `id % plantMod = 0`), the sign-LSH candidate
    * replay, exact cosine, and the gram-Jaccard bar. */
  def oracleSql(dim: Int, minCos: Double, maxJac: Double,
      plantMod: Int, n: Int = 3,
      bands: Int = Similarity.SignBands,
      bitsPerBand: Int = Similarity.BitsPerBand): String = {
    def fold(items: String): String =
      s"list_reduce(list_prepend(0.0, $items), (acc, v) -> acc + v)"
    val dot = fold(
      s"list_transform(range(1, ${dim + 1}), i -> a.emb[i] * b.emb[i])")
    val na = fold("list_transform(a.emb, v -> v * v)")
    val nb = fold("list_transform(b.emb, v -> v * v)")
    val bandSelects = Similarity
      .bandBucketExprs("emb", dim, bands, bitsPerBand, forDuck = true)
      .zipWithIndex.map { case (x, bnd) =>
        s"SELECT id, $bnd AS band, $x AS bucket FROM corpus"
      }.mkString("\n  UNION ALL\n  ")
    val gram = graft.oracle.Duck.gramHash63Sql(
      s"array_to_string(t[__gi:__gi+${n - 1}], ' ')")
    s"""WITH base AS (
       |  SELECT d.doc_id AS id, d.text,
       |         list_transform(e.embedding, x -> x::DOUBLE) AS emb
       |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
       |dup AS (
       |  SELECT id + 1000000 AS id, text,
       |         ${Similarity.perturbExprSql("emb", dim, forDuck = true)}
       |           AS emb
       |  FROM base WHERE id % $plantMod = 0),
       |para AS (
       |  SELECT id + 2000000 AS id,
       |         array_to_string(list_reverse(
       |           regexp_extract_all(lower(text), '\\S+')), ' ') AS text,
       |         ${Similarity.perturbExprSql("emb", dim, forDuck = true)}
       |           AS emb
       |  FROM base WHERE id % $plantMod = 0),
       |corpus AS (
       |  SELECT * FROM base UNION ALL SELECT * FROM dup
       |  UNION ALL SELECT * FROM para),
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT l.id AS doc_a, r.id AS doc_b
       |  FROM bands l JOIN bands r
       |    ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id),
       |scored AS (
       |  SELECT c.doc_a, c.doc_b, $dot / (sqrt($na) * sqrt($nb)) AS cos
       |  FROM cand c
       |  JOIN corpus a ON a.id = c.doc_a
       |  JOIN corpus b ON b.id = c.doc_b),
       |sets AS (
       |  SELECT id, list_sort(list_distinct(
       |    list_transform(range(1, greatest(len(t) - ${n - 1}, 0) + 1),
       |      __gi -> $gram))) AS g
       |  FROM (SELECT id, regexp_extract_all(lower(text), '\\S+') AS t
       |        FROM corpus)),
       |ex AS (
       |  SELECT s.doc_a, s.doc_b, s.cos,
       |         CAST(len(ga.g) AS BIGINT) AS n_a,
       |         CAST(len(gb.g) AS BIGINT) AS n_b,
       |         CAST(len(list_filter(ga.g, x -> list_contains(gb.g, x)))
       |           AS BIGINT) AS n_shared
       |  FROM scored s
       |  JOIN sets ga ON ga.id = s.doc_a
       |  JOIN sets gb ON gb.id = s.doc_b
       |  WHERE s.cos >= $minCos)
       |SELECT doc_a, doc_b, cos, n_a, n_b, n_shared,
       |       CASE WHEN n_a + n_b - n_shared = 0 THEN 0.0
       |            ELSE CAST(n_shared AS DOUBLE)
       |                   / CAST(n_a + n_b - n_shared AS DOUBLE)
       |       END AS jaccard
       |FROM ex
       |WHERE CASE WHEN n_a + n_b - n_shared = 0 THEN 0.0
       |           ELSE CAST(n_shared AS DOUBLE)
       |                  / CAST(n_a + n_b - n_shared AS DOUBLE)
       |      END <= $maxJac
       |ORDER BY doc_a, doc_b""".stripMargin
  }
}
