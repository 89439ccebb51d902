package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed EXACT order statistics without a per-key sort — radix
  * selection: the scale path [[graft.pipeline.CorpusStats.lengthReport]]'s
  * scaladoc used to concede to approximate sketches. The q53 form
  * computes exact percentiles through a per-key sort window — correct
  * and spill-safe, but at 100 TB that is a full corpus shuffle into
  * per-key sorted runs. This op gets the SAME exact order statistics
  * with ZERO sorts and ZERO data shuffles: a fixed number of
  * column-pruned scan+aggregate passes (one per radix digit), each
  * narrowing every target rank's value prefix by `bitsPerPass` bits.
  *
  *  - Pass 0 counts rows per group → target ranks
  *    (`floor(p·(n−1))`, the q53 selection rule — same single IEEE
  *    multiply as the oracle's).
  *  - Each radix pass joins the rows to the ≤ |groups|·|percentiles|
  *    broadcast target table on group, keeps rows matching the
  *    target's current prefix (a scan-side filter that shrinks
  *    ~2^bitsPerPass× per pass), and counts the next digit — partial
  *    aggregation collapses everything map-side, so the one exchange
  *    per pass carries ≤ |targets|·2^bitsPerPass count rows.
  *  - The driver walks the digit histogram (|targets|·2^bitsPerPass
  *    integers) to extend each prefix; after the last pass the prefix
  *    IS the selected value.
  *
  * Shuffle-volume comparison at 100 TB: the sort-window form moves the
  * whole column through one exchange and sorts it; this moves
  * `passes × |targets| × 2^bitsPerPass` integers, full stop. The trade
  * is `passes` scans of a two-column projection — the right side of the
  * bargain whenever scan bandwidth beats shuffle+sort (always, at that
  * scale, and the scans read a columnar store's slim projection).
  *
  * Determinism: counts are integers; the only float op is the same
  * rank multiply q53 and the oracle perform; ties collapse into the
  * same radix cell so the selected VALUE is partition-order-free.
  * Contract: values in `[0, 2^(bitsPerPass·passes))`, group cardinality
  * driver-sized (a facet — language, source — not a key space; both
  * `require`d loudly). */
object ScalableQuantiles {

  /** Exact per-group order statistics of `valCol` (a nonnegative
    * integral column) at `ps` (0-based index `floor(p·(n−1))`), plus
    * per-group count and sum — q53's report columns, computed by radix
    * selection. Returns one row per group:
    * `(group, n_docs, total, <name per percentile>)`. */
  def orderStatistics(df: DataFrame, groupCol: String, valCol: String,
      ps: Seq[(Double, String)], bitsPerPass: Int = 11,
      passes: Int = 3, maxGroups: Int = 10000): DataFrame = {
    require(ps.nonEmpty && bitsPerPass > 0 && passes > 0 &&
      bitsPerPass * passes <= 62,
      s"need percentiles and bitsPerPass*passes in (0, 62]: $ps, " +
        s"$bitsPerPass, $passes")
    val spark = df.sparkSession
    val totalBits = bitsPerPass * passes
    val mask = (1L << bitsPerPass) - 1
    val vals = df.select(col(groupCol).cast("string").as("g"),
      col(valCol).cast("long").as("v"))

    // Pass 0: per-group count/sum/min/max — the contract checks and the
    // target ranks. |groups| rows to the driver (facet contract).
    val stats = vals.groupBy("g").agg(count(lit(1)).as("n"),
        sum("v").as("total"), min("v").as("mn"), max("v").as("mx"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    require(stats.size <= maxGroups,
      s"radix selection's group column is a facet contract: " +
        s"${stats.size} groups exceeds maxGroups=$maxGroups")
    stats.foreach { case (g, (_, _, mn, mx)) =>
      require(mn >= 0 && mx < (1L << totalBits),
        s"values of group '$g' outside [0, 2^$totalBits): min=$mn max=$mx")
    }

    // Mutable selection state per (group, percentile): the value prefix
    // built so far and the target's rank within the prefix population.
    // rank = floor(p·(n−1)) — the q53 rule, same IEEE multiply.
    val state = scala.collection.mutable.LinkedHashMap[(String, String),
      (Long, Long)]()
    for ((g, (n, _, _, _)) <- stats.toSeq.sortBy(_._1); (p, name) <- ps)
      state((g, name)) = (0L, math.floor(p * (n - 1).toDouble).toLong)

    for (pass <- 0 until passes) {
      val shift = totalBits - (pass + 1) * bitsPerPass
      import spark.implicits._
      val targets = state.toSeq.map { case ((g, name), (prefix, _)) =>
        (g, name, prefix)
      }.toDF("g", "t_name", "t_prefix")
      // Rows join their group's targets (broadcast, facet-sized), keep
      // prefix matches, count next digits: partial agg map-side, the
      // exchange carries ≤ |targets|·2^bitsPerPass rows.
      val hist = vals.join(broadcast(targets), "g")
        .filter(shiftright(col("v"), shift + bitsPerPass) === col("t_prefix"))
        .groupBy(col("g"), col("t_name"),
          shiftright(col("v"), shift).bitwiseAND(lit(mask)).as("digit"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
        .groupBy(_._1).map { case (k, rows) =>
          k -> rows.map(_._2).sortBy(_._1)
        }
      for ((key, digits) <- hist) {
        val (prefix, rank) = state(key)
        var cum = 0L
        var done = false
        for ((digit, c) <- digits if !done) {
          if (cum + c > rank) {
            state(key) = ((prefix << bitsPerPass) | digit, rank - cum)
            done = true
          } else cum += c
        }
        assert(done, s"radix walk exhausted digits for $key — count drift")
      }
    }

    // Assemble the q53-shaped report from driver state (facet-sized by
    // contract — the same altitude as q77's collected weights).
    import spark.implicits._
    val rows = stats.toSeq.sortBy(_._1).map { case (g, (n, total, _, _)) =>
      (g, n, total, ps.map { case (_, name) => state((g, name))._1 })
    }.map { case (g, n, total, pvals) => (g, n, total, pvals) }
    rows.toDF("g", "n_docs", "total", "pvals")
      .select(Seq(col("g").as(groupCol), col("n_docs"), col("total")) ++
        ps.zipWithIndex.map { case ((_, name), i) =>
          element_at(col("pvals"), i + 1).as(name)
        }: _*)
      .orderBy(groupCol)
  }
}
