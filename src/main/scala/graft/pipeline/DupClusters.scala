package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate-cluster resolution: connected components over a near-dup
  * pair list — the step a production dedup pipeline runs AFTER pair
  * generation (exact, MinHash, SimHash or embedding pairs all produce
  * edges), so "A≈B, B≈C" collapses to one cluster {A,B,C} and a single
  * canonical document survives per cluster.
  */
object DupClusters {

  /** Connected components of the undirected graph given by `(srcCol,
    * dstCol)` pairs. Returns one row per distinct vertex appearing in a
    * pair, labeled with the minimum vertex id reachable from it
    * (`id`, `cluster`).
    *
    * Each round combines the two classic moves, after which labels are
    * the component minimum in **O(log diameter)** rounds:
    *
    *   - min-label propagation (the Pregel formulation GraphX uses):
    *     every vertex adopts the minimum label among itself and its
    *     neighbors — one edge-join shuffle + one agg shuffle;
    *   - pointer jumping (path halving, as in HashToMin / two-phase CC,
    *     Rastogi et al., ICDE'13): every vertex then adopts its label's
    *     OWN label. Labels always name real vertices, so this chases the
    *     chain `v → label(v) → label²(v)`, doubling the distance covered
    *     per round — a 2^20-diameter path converges inside the default
    *     bound, where propagation alone is O(diameter).
    *
    * Near-duplicate graphs are unions of dense, tiny-diameter clusters
    * (LSH band buckets yield near-cliques), so real corpora settle in a
    * handful of rounds regardless.
    *
    * Scale notes: the label table is `localCheckpoint`ed each round to
    * truncate the growing lineage (iterative Spark's classic
    * planning/OOM trap); checkpoints are label-table-sized (two longs per
    * vertex), kept for the logarithmically few rounds and evicted LRU
    * under memory pressure. The convergence probe is a metadata-sized
    * count of changed labels, never a data collect. The edge list is
    * persisted once and reused by every round's join. If `maxIters`
    * rounds do not converge the result would be silently wrong, so that
    * raises instead.
    */
  def connectedComponents(pairs: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 25): DataFrame = {
    val edges = pairs.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b"))
    // Registered (graft.ops.Materialize) so a mid-loop failure leaves the
    // edge cache reachable by the session owner's releaseAll; the success
    // path releases it eagerly below.
    //
    // Undirected doubling as ONE Generate over the pair stream, not
    // edges.union(edges.swapped) (r22 second wave): the union's two
    // branches each re-ran the ENTIRE upstream pair derivation — the 64×
    // q117 profile showed every pre-CC exchange of the near-dup chain
    // written twice, byte-identical (the swapped projection defeats
    // ReusedExchange, the r7 Decontam defect class). The explode emits
    // both orientations in-stage from one pass over the pairs.
    val undWide = graft.ops.Materialize.register(edges
      .select(explode(array(
        struct(col("a"), col("b")),
        struct(col("b").as("a"), col("a").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b")),
      StorageLevel.MEMORY_AND_DISK)
    // Size the edge list's partitioning to the GRAPH, not to the upstream
    // corpus shuffle: pair graphs are orders of magnitude smaller than the
    // corpus that produced them, and every round scans the edges twice — inherited
    // near-empty partitions multiply per-round task overhead by the width
    // of a shuffle sized for raw text. ~1M edges (≈16 MB) per partition;
    // a billion-edge graph still gets its full upstream width (coalesce
    // only narrows), so the 100 TB path is unchanged.
    val nEdges = undWide.count()
    val parts = math.max(1L, math.min(undWide.rdd.getNumPartitions.toLong,
      (nEdges + 999999L) / 1000000L)).toInt
    // coalesce is narrow: each round re-reads the cached wide blocks
    // through it, no second materialization needed.
    val und = undWide.coalesce(parts)
    // Round 1 computed directly from the edges: with labels₀(v) = v, the
    // first propagation is labels₁(v) = min(v, min over neighbors) — one
    // aggregate, no separate identity-label table to materialize first.
    var labels = und.groupBy(col("a").as("id"))
      .agg(least(min(col("a")), min(col("b"))).as("label"))
      .localCheckpoint()
    var converged = false
    var i = 1
    while (!converged && i < maxIters) {
      val viaNeighbors = und.join(labels, und("b") === labels("id"))
        .select(und("a").as("id"), col("label"), lit(false).as("self"))
      // The convergence probe rides the checkpoint job as an observe()
      // metric instead of a separate join+count action: `prev` (each
      // vertex's own incoming label) is carried through the aggregate, so
      // "did propagation change anything" costs zero extra jobs per
      // round. Propagation-stability ⟹ every adjacent pair agrees ⟹
      // labels are component-uniform (= the component minimum, since the
      // minimum vertex keeps its own id), so testing prop rather than
      // post-jump labels decides convergence soundly — the jump only
      // accelerates, it cannot change a prop-stable labeling.
      val obs = org.apache.spark.sql.Observation()
      // Checkpointed BEFORE the jump self-join: truncates the lineage and
      // gives the self-join a materialized plan (a union-derived frame
      // joined with itself trips Catalyst's constraint rewrite).
      val prop = labels
        .select(col("id"), col("label"), lit(true).as("self"))
        .union(viaNeighbors)
        .groupBy("id").agg(
          min("label").as("label"),
          min(when(col("self"), col("label"))).as("prev"))
        .observe(obs, count(when(col("label") < col("prev"), 1)).as("changed"))
        .localCheckpoint()
      // Pointer jump: label ← min(label, label(label)). Left join: a
      // label is always a vertex id, but the left side keeps the row if
      // the lookup misses mid-computation.
      val jump = prop.select(col("id").as("p_id"), col("label").as("p_label"))
      val next = prop.join(jump, col("label") === col("p_id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("p_label"), col("label"))).as("label"))
      labels = next
      converged = obs.get("changed").asInstanceOf[Long] == 0L
      i += 1
    }
    graft.ops.Materialize.release(Seq(undWide))
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIters rounds; " +
        "raise maxIters (the graph diameter exceeds 2^maxIters)")
    labels.select(col("id"), col("label").as("cluster"))
  }

  /** INCREMENTAL cluster maintenance (VERDICT r14 #1) — fold a landing
    * batch's near-dup pairs into a STANDING root assignment without
    * re-running connected components over the full pair set. The CC
    * chain was the dominant 64× term (~13.8 s) shared by five SCALING
    * rows because every consumer of cluster state (split, manifest,
    * canonicalize, telemetry) rebuilt it from scratch at each landing;
    * with a stored cluster table ([[CorpusWriter.writeClusters]]) the
    * per-landing cost becomes increment-sized.
    *
    * `stored` is the [[connectedComponents]] shape — `(id, cluster)`,
    * one row per vertex of the standing graph, `cluster` = minimum
    * reachable id. `newPairs` are the landing's edges (increment×corpus
    * and increment×increment pairs from the admission job). Returns the
    * same shape over the UNION graph, bit-equal to
    * `connectedComponents(oldPairs ∪ newPairs)` (DupClustersSpec pins it
    * on randomized splits; q118 oracle-gates it against full CC):
    *
    *  1. CONTRACT: each new edge's endpoints map through their standing
    *     root (vertices the standing assignment has never seen root
    *     themselves). Old components collapse to single vertices — their
    *     roots — so the contracted graph's size is bounded by the NEW
    *     edge count, never the corpus graph.
    *  2. Re-run [[connectedComponents]] over the contracted edges only
    *     — the "affected component subgraph": components untouched by
    *     new edges never enter this pass.
    *  3. RELABEL: a standing vertex whose root merged takes the root's
    *     new label (one left join of the standing table against the
    *     contracted-CC lookup — increment-sized, AQE-broadcast); new
    *     vertices (in a pair for the first time) take their contracted
    *     label directly.
    *
    * Label minimality is preserved exactly: each standing root IS the
    * minimum id of its old component, so the contracted component's
    * min over {old roots, new vertex ids} equals the union component's
    * min over ALL member ids — the write+append ≡ write-over-union
    * identity ([[CorpusWriter.appendToStratifiedIndex]]'s landing
    * discipline) applied to cluster state.
    *
    * Scale shape: the standing table is touched by the two root
    * lookups (new-edge endpoints against standing ids — bucket-local
    * SMJ probes when standing is the [[CorpusWriter.writeClusters]]
    * sidecar bucketed on id, no standing-side exchange) and the one
    * relabel join (against the increment-sized lookup — broadcast);
    * new-vertex membership is decided FROM the lookup misses rather
    * than by an anti-join against the standing ids, so no step ever
    * shuffles the standing table. The iterative chain runs over
    * contracted edges only. */
  def incrementalClusters(stored: DataFrame, newPairs: DataFrame,
      srcCol: String, dstCol: String, maxIters: Int = 25): DataFrame = {
    val standing = stored.select(col("id").cast("long").as("id"),
      col("cluster").cast("long").as("cluster"))
    val e = newPairs.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b"))
    // Contract endpoints through standing roots; a missed lookup (null
    // root) marks the endpoint as a vertex the standing assignment has
    // never seen. Materialized: both the contracted edge set and the
    // new-vertex set consume this increment-sized frame.
    val ra = standing.select(col("id").as("a"), col("cluster").as("__ra"))
    val rb = standing.select(col("id").as("b"), col("cluster").as("__rb"))
    val withRoots = graft.ops.Materialize.register(e
      .join(ra, Seq("a"), "left")
      .join(rb, Seq("b"), "left"))
    // Self-loops (both endpoints already share a standing root) merge
    // nothing, and a dup-dense landing contracts MANY edges onto the
    // same root pair (63 same-cluster neighbors → 63 copies of one
    // contracted edge), so dedup before the iterative chain: one
    // increment-sized shuffle that shrinks every CC round's join input
    // by the duplication factor. Dropping a root's self-loops cannot
    // lose it from the relabel: a root absent from the contracted CC
    // simply keeps its standing label (nothing merged), and new
    // vertices can never self-loop (a new id contracts to itself and
    // its partner is either a different new id or a standing root).
    val contracted = withRoots
      .select(coalesce(col("__ra"), col("a")).as("a"),
        coalesce(col("__rb"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val newIds = withRoots
      .select(when(col("__ra").isNull, col("a")).as("id"))
      .unionAll(withRoots.select(when(col("__rb").isNull, col("b")).as("id")))
      .filter(col("id").isNotNull).distinct()
    val cc = connectedComponents(contracted, "a", "b", maxIters)
    // Standing vertices: relabel where the root merged (missed lookup =
    // component untouched by this landing — label unchanged).
    val lookup = cc.select(col("id").as("__root"), col("cluster").as("__new"))
    val relabeled = standing
      .join(lookup, standing("cluster") === lookup("__root"), "left")
      .select(standing("id"),
        coalesce(col("__new"), standing("cluster")).as("cluster"))
    // Vertices first seen in this landing's pairs: the contracted graph's
    // vertex set is {standing roots} ∪ {new ids}, so a semi-join on the
    // lookup-miss set keeps exactly the genuinely-new rows of `cc` —
    // increment-sized on both sides.
    // withRoots stays registered (not eagerly released): the returned
    // plan still consumes it lazily through `newIds` — the session owner
    // reclaims it via Materialize.releaseAll once the result is consumed.
    val fresh = cc.join(newIds, Seq("id"), "left_semi")
    relabeled.unionAll(fresh.select(col("id"), col("cluster")))
  }

  /** The deduplicated corpus: drop every clustered document except its
    * cluster's minimum id; documents in no near-dup pair survive
    * untouched. One CC run + one left-anti join. The `dupMembers` side's
    * size is a runtime quantity (the dup rate), so no static broadcast
    * hint: AQE converts the anti-join to broadcast when members are
    * small (the common case — corpus unshuffled) and keeps a shuffle
    * join when dedup bites hard — exactly the adaptive behavior wanted
    * at 100 TB. */
  def canonicalize(docs: DataFrame, idCol: String, pairs: DataFrame,
      srcCol: String, dstCol: String): DataFrame = {
    val dupMembers = connectedComponents(pairs, srcCol, dstCol)
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    docs.join(dupMembers, Seq(idCol), "left_anti")
  }

  /** Quality-aware canonicalize: keep each cluster's BEST member — the
    * maximum of `scoreCol`, ties broken by the smallest id — instead of
    * [[canonicalize]]'s smallest id. The production keep-policy: dedup
    * should retain the cleanest / longest / highest-quality copy of a
    * duplicated page, not the numerically first one crawled. Documents
    * in no pair survive untouched, and with `scoreCol` monotone
    * DECREASING in id this degenerates to [[canonicalize]] exactly
    * (equivalence-pinned in DupClustersSpec).
    *
    * Scale shape: [[canonicalize]]'s exactly (r11 review) — the window
    * runs over the GRAPH-sized member table only (docs appearing in a
    * pair, id + score + cluster — three slim columns; unpaired
    * documents never enter it), picks each cluster's losers, and one
    * left-anti join drops them from the corpus. The corpus itself
    * never shuffles — a corpus-wide root-keyed window would push every
    * row INCLUDING the text payload through an exchange — and the
    * graph-sized loser side keeps the anti-join AQE-broadcast in the
    * common case. Near-dup graphs are many small clusters, so the
    * member window's partition count is the cluster count — wide, not
    * a skew wall. */
  def canonicalizeBest(docs: DataFrame, idCol: String, pairs: DataFrame,
      srcCol: String, dstCol: String, scoreCol: String): DataFrame = {
    val cc = connectedComponents(pairs, srcCol, dstCol)
      .select(col("id").as("cb_id"), col("cluster").as("cb_cluster"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cb_cluster")
      .orderBy(col("cb_score").desc, col("cb_id"))
    val losers = docs
      .select(col(idCol).cast("long").as("cb_doc"), col(scoreCol).as("cb_score"))
      .join(cc, col("cb_doc") === col("cb_id")) // inner: members only
      .withColumn("cb_rank", row_number().over(w))
      .filter(col("cb_rank") > 1)
      .select(col("cb_doc").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Leakage-safe train/validation split: every document receives the
    * split of its near-dup CLUSTER root (min id; documents in no pair
    * root themselves), so a held-out document's near-duplicates can
    * never land in training — the group-aware split that keeps eval
    * honest, where a row-wise random split leaks every duplicated
    * document across the boundary.
    *
    * The draw is the md5 idiom ([[Sampling]]): a root goes to `val`
    * when the first 4 hex nibbles of `md5(root)` fall below
    * `valFrac`'s fixed-length threshold — lexicographic on lowercase
    * fixed-width hex IS numeric order, so both engines compare the
    * same strings and no float or RNG is involved. Granularity is
    * 1/65536.
    *
    * Scale shape: the cluster table is GRAPH-sized (only documents
    * that appear in a pair), so the corpus-side left join is
    * AQE-broadcast in the common case and the corpus never reshuffles;
    * the split column is one scan-side hash of the root. */
  def groupSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
      srcCol: String, dstCol: String, valFrac: Double = 0.1): DataFrame =
    groupSplit(docs, idCol, connectedComponents(pairs, srcCol, dstCol), valFrac)

  /** The composition form of [[groupSplit]] (VERDICT r10): a pipeline
    * that has already materialized its cluster table (q37) splits from
    * it directly instead of re-running the whole CC chain — at 64× the
    * chain was measured as ~92% of the pairs-form's cost (SCALING.md),
    * all of it redundant for a user who holds the clusters. The
    * pairs-based overload above is now a pure delegation, so the two
    * forms cannot diverge. `clusters` is the [[connectedComponents]]
    * shape: (id, cluster), one row per document that appears in a pair.
    *
    * Scale shape unchanged: `clusters` is GRAPH-sized, so the
    * corpus-side left join is AQE-broadcast in the common case and the
    * corpus never reshuffles; the split is one scan-side md5 of the
    * root. */
  def groupSplit(docs: DataFrame, idCol: String, clusters: DataFrame,
      valFrac: Double): DataFrame = {
    require(valFrac > 0 && valFrac < 1, s"valFrac must be in (0,1): $valFrac")
    val threshold = f"${math.floor(valFrac * 65536).toLong}%04x"
    val cc = clusters
      .select(col("id").cast("long").as("doc_id"), col("cluster").cast("long"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(cc, Seq("doc_id"), "left")
      .withColumn("root", coalesce(col("cluster"), col("doc_id")))
      .select(col("doc_id"), col("root"),
        when(substring(md5(col("root").cast("string")), 1, 4) < threshold,
          "val").otherwise("train").as("split"))
      .orderBy("doc_id")
  }

  /** Split-leakage audit — the integrity meter run AFTER the
    * leakage-safe split: [[groupSplit]] keeps exact/near-dup CLUSTERS
    * on one side, but partial text overlap (a quoted paragraph, shared
    * boilerplate below the near-dup bar) can still cross the boundary;
    * this measures that residual. For every `val` document: its
    * distinct word n-grams, how many also occur in ANY `train`
    * document, and the leaked fraction — the number that decides
    * whether a benchmark built from the val side can be trusted
    * (the q93 eval-leak question posed at the split boundary).
    *
    * Scale shape: the split derivation is q59's (CC chain + scan-side
    * md5); the gram comparison is [[Novelty]]'s non-broadcast grain —
    * both sides tokenize map-side into 63-bit fingerprints, the train
    * side's distinct-gram frame is corpus-scale so the probe is a
    * gram-keyed equi-join, never a broadcast contract. */
  def splitLeakageReport(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, srcCol: String, dstCol: String, valFrac: Double,
      n: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val split = groupSplit(docs, idCol, connectedComponents(pairs, srcCol,
      dstCol), valFrac).select("doc_id", "split")
    val gramHashes =
      graft.functions.GraftFunctions.wordGramHashes(col(textCol), n)
    val grams = docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode_outer(gramHashes).as("gram_fp"))
      .filter(col("gram_fp").isNotNull)
      .join(split, "doc_id")
    val trainGrams = grams.filter(col("split") === "train")
      .select("gram_fp").distinct()
    grams.filter(col("split") === "val")
      .select("doc_id", "gram_fp").distinct()
      .join(trainGrams.withColumn("__seen", lit(1L)), Seq("gram_fp"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum(when(col("__seen").isNotNull, 1L)), lit(0L))
          .as("leaked"))
      .select(col("doc_id"), col("n_grams"), col("leaked"),
        (col("leaked").cast("double") / col("n_grams").cast("double"))
          .as("leak_frac"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[splitLeakageReport]] on table `documents`. */
  def splitLeakageOracleSql(minSim: Double, valFrac: Double, n: Int): String = {
    val threshold = f"${math.floor(valFrac * 65536).toLong}%04x"
    s"""${ccCtesSql(minSim)},
       |sp AS (
       |  SELECT d.doc_id,
       |    CASE WHEN substr(md5(CAST(coalesce(cc.cluster, d.doc_id) AS VARCHAR)),
       |                     1, 4) < '$threshold'
       |         THEN 'val' ELSE 'train' END AS split
       |  FROM documents d LEFT JOIN cc ON d.doc_id = cc.id),
       |tk AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t
       |  FROM documents),
       |gr AS (
       |  SELECT doc_id, ${graft.oracle.Duck.gramHash63Sql("gram")} AS gram_fp
       |  FROM (
       |    SELECT doc_id,
       |      unnest(list_transform(range(1, greatest(len(t) - ${n - 1}, 0) + 1),
       |        i -> array_to_string(t[i:i+${n - 1}], ' '))) AS gram
       |    FROM tk)),
       |tg AS (
       |  SELECT DISTINCT g.gram_fp FROM gr g
       |  JOIN sp ON sp.doc_id = g.doc_id WHERE sp.split = 'train'),
       |vg AS (
       |  SELECT DISTINCT g.doc_id, g.gram_fp FROM gr g
       |  JOIN sp ON sp.doc_id = g.doc_id WHERE sp.split = 'val'),
       |cnt AS (
       |  SELECT vg.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |    CAST(coalesce(sum(CASE WHEN tg.gram_fp IS NOT NULL THEN 1 END), 0)
       |      AS BIGINT) AS leaked
       |  FROM vg LEFT JOIN tg USING (gram_fp) GROUP BY vg.doc_id)
       |SELECT doc_id, n_grams, leaked,
       |  CAST(leaked AS DOUBLE) / CAST(n_grams AS DOUBLE) AS leak_frac
       |FROM cnt ORDER BY doc_id""".stripMargin
  }

  /** The dedup manifest — the training-data artifact the cluster chain
    * exists to produce, from ONE connected-components run: every
    * document with its cluster root, its leakage-safe split, and
    * whether it is the cluster's surviving canonical ([[canonicalize]]
    * keeps exactly the `doc_id = root` rows). Composes
    * [[connectedComponents]] with the clusters-form [[groupSplit]] —
    * where running q37 + q59 + q40 as separate queries pays the CC
    * chain three times, the manifest pays it once and derives all three
    * columns from the same cluster table. */
  def dedupManifest(docs: DataFrame, idCol: String, pairs: DataFrame,
      srcCol: String, dstCol: String, valFrac: Double = 0.1): DataFrame =
    groupSplit(docs, idCol, connectedComponents(pairs, srcCol, dstCol), valFrac)
      .withColumn("is_canonical", col("doc_id") === col("root"))

  /** DuckDB CTE chain ending in `cc(id, cluster)`: clusters over
    * [[MinHashDedup.nearDupPairs]] edges on table `documents`, computed
    * by a recursive reachability CTE + min aggregate (fine at oracle
    * scale; quadratic in cluster size). */
  /** Per-source duplication telemetry — the provenance report mixing
    * decisions read: for every source, how many documents it
    * contributes, how many are non-canonical duplicates (what
    * [[canonicalize]] would drop), how many duplicate CONTENT whose
    * cluster root lives in a DIFFERENT source (cross-source copying —
    * syndication, mirrors, scraped re-posts), and the duplicate rate.
    *
    * Scale shape: the CC chain is q37's (the dominant term, linear in
    * true edges); everything after is slim — the corpus joins the
    * graph-sized cluster table on id (AQE-broadcastable: the cluster
    * table is dup-sized, not corpus-sized), the root's source attaches
    * through one (root → source) long/string join, and the rollup is
    * one S-row aggregate. Text never moves past the pair generation. */
  def sourceDupReport(docs: DataFrame, idCol: String, srcCol: String,
      textCol: String, minSim: Double): DataFrame = {
    val pairs = MinHashDedup.nearDupPairs(docs, idCol, textCol, minSim)
    val cc = connectedComponents(pairs, "doc_a", "doc_b")
    val keyed = docs.select(col(idCol).cast("long").as("doc_id"),
      col(srcCol).cast("string").as("source"))
    val withRoot = keyed
      .join(cc.select(col("id").as("doc_id"), col("cluster")), Seq("doc_id"), "left")
      .withColumn("root", coalesce(col("cluster"), col("doc_id")))
    val rootSrc = keyed.select(col("doc_id").as("root"),
      col("source").as("root_source"))
    withRoot.join(rootSrc, "root")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("doc_id") =!= col("root"), 1L).otherwise(0L)).as("n_dup"),
        sum(when(col("root_source") =!= col("source"), 1L).otherwise(0L))
          .as("n_cross"))
      .select(col("source"), col("n_docs"), col("n_dup"), col("n_cross"),
        (col("n_dup").cast("double") / col("n_docs").cast("double"))
          .as("dup_rate"))
      .orderBy("source")
  }

  /** DuckDB oracle for [[sourceDupReport]] on table `documents`. */
  def sourceDupOracleSql(minSim: Double): String =
    s"""${ccCtesSql(minSim)},
       |j AS (SELECT d.doc_id, d.source,
       |    coalesce(cc.cluster, d.doc_id) AS root
       |  FROM documents d LEFT JOIN cc ON d.doc_id = cc.id),
       |rs AS (SELECT doc_id AS root, source AS root_source FROM documents)
       |SELECT j.source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(coalesce(sum(CASE WHEN j.doc_id <> j.root THEN 1 END), 0)
       |    AS BIGINT) AS n_dup,
       |  CAST(coalesce(sum(CASE WHEN rs.root_source <> j.source THEN 1 END), 0)
       |    AS BIGINT) AS n_cross,
       |  CAST(CAST(coalesce(sum(CASE WHEN j.doc_id <> j.root THEN 1 END), 0)
       |      AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS dup_rate
       |FROM j JOIN rs ON rs.root = j.root
       |GROUP BY j.source ORDER BY j.source""".stripMargin

  private def ccCtesSql(minSim: Double): String = {
    val prefix = MinHashDedup.ctePrefixSql.replaceFirst("^WITH ", "WITH RECURSIVE ")
    s"""$prefix,
       |${MinHashDedup.estCteSql},
       |pairs AS (SELECT doc_a, doc_b FROM est WHERE est_sim >= $minSim),
       |e AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |      UNION SELECT doc_b, doc_a FROM pairs),
       |reach(id, r) AS (
       |  SELECT a, a FROM e
       |  UNION
       |  SELECT e.a, rr.r FROM e JOIN reach rr ON e.b = rr.id),
       |cc AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id)""".stripMargin
  }

  /** DuckDB oracle for [[connectedComponents]] over near-dup pairs. */
  def clustersOracleSql(minSim: Double): String =
    s"""${ccCtesSql(minSim)}
       |SELECT id AS doc_id, cluster FROM cc ORDER BY doc_id""".stripMargin

  /** DuckDB oracle for [[canonicalize]] on table `documents`. */
  def canonicalOracleSql(minSim: Double): String =
    s"""${ccCtesSql(minSim)}
       |SELECT doc_id, lang, source, n_chars FROM documents
       |WHERE doc_id NOT IN (SELECT id FROM cc WHERE id <> cluster)
       |ORDER BY doc_id""".stripMargin

  /** DuckDB oracle for [[groupSplit]] on table `documents`. */
  def groupSplitOracleSql(minSim: Double, valFrac: Double): String = {
    val threshold = f"${math.floor(valFrac * 65536).toLong}%04x"
    s"""${ccCtesSql(minSim)}
       |SELECT d.doc_id, coalesce(cc.cluster, d.doc_id) AS root,
       |  CASE WHEN substr(md5(CAST(coalesce(cc.cluster, d.doc_id) AS VARCHAR)),
       |                   1, 4) < '$threshold'
       |       THEN 'val' ELSE 'train' END AS split
       |FROM documents d LEFT JOIN cc ON d.doc_id = cc.id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** DuckDB oracle for [[canonicalizeBest]] on table `documents`,
    * score = `scoreSql` (e.g. `n_chars` — keep the longest copy). */
  def canonicalBestOracleSql(minSim: Double, scoreSql: String): String =
    s"""${ccCtesSql(minSim)}
       |SELECT doc_id, lang, source, n_chars FROM (
       |  SELECT d.doc_id, d.lang, d.source, d.n_chars,
       |    row_number() OVER (
       |      PARTITION BY coalesce(cc.cluster, d.doc_id)
       |      ORDER BY ($scoreSql) DESC, d.doc_id) AS rn
       |  FROM documents d LEFT JOIN cc ON d.doc_id = cc.id)
       |WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** DuckDB oracle for [[dedupManifest]] on table `documents`. */
  def dedupManifestOracleSql(minSim: Double, valFrac: Double): String = {
    val threshold = f"${math.floor(valFrac * 65536).toLong}%04x"
    s"""${ccCtesSql(minSim)}
       |SELECT d.doc_id, coalesce(cc.cluster, d.doc_id) AS root,
       |  CASE WHEN substr(md5(CAST(coalesce(cc.cluster, d.doc_id) AS VARCHAR)),
       |                   1, 4) < '$threshold'
       |       THEN 'val' ELSE 'train' END AS split,
       |  (d.doc_id = coalesce(cc.cluster, d.doc_id)) AS is_canonical
       |FROM documents d LEFT JOIN cc ON d.doc_id = cc.id
       |ORDER BY d.doc_id""".stripMargin
  }
}
