package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** The two-phase pruned sample must equal the naive global window form,
  * and stay invariant under input partitioning. */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame, n: Int): Seq[(String, Long, Long)] =
    df.select(col("lang").as("stratum"), col("doc_id"),
        md5(col("doc_id").cast("string")).as("pick"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("stratum").orderBy("pick", "doc_id")).cast("long"))
      .filter(col("rn") <= n)
      .orderBy("stratum", "doc_id")
      .select("stratum", "doc_id", "rn").as[(String, Long, Long)].collect().toSeq

  test("pruned sample ≡ naive window on the fixture, across repartitions") {
    val docs = Tables.load(spark, TestSpark.Sf, "documents")
    val expect = naive(docs, 7)
    assert(expect.nonEmpty)
    for (p <- Seq(1, 5, 13)) {
      val got = Sampling.stratified(docs.repartition(p), "lang", "doc_id", 7)
        .as[(String, Long, Long)].collect().toSeq
      assert(got == expect, s"repartition=$p")
    }
  }

  test("n larger than every stratum returns all rows ranked") {
    val docs = Tables.load(spark, TestSpark.Sf, "documents")
    val total = docs.count()
    assert(Sampling.stratified(docs, "lang", "doc_id", 1000000).count() == total)
  }

  /** The integer quota arithmetic of temperatureMix, replayed in plain
    * Scala (Math.sqrt is the same correctly-rounded IEEE op the plan
    * uses): quota_i = min(n_i, budget·⌊√n_i·Scale⌋ div Σ⌊√n_j·Scale⌋). */
  private def naiveQuotas(sizes: Map[String, Long], budget: Long): Map[String, Long] = {
    val wt = sizes.map { case (s, n) =>
      s -> math.floor(math.sqrt(n.toDouble) * Sampling.MixScale).toLong }
    val tot = wt.values.sum
    sizes.map { case (s, n) => s -> math.min(n, budget * wt(s) / tot) }
  }

  /** temperatureMix registers its quota frame with Materialize; release
    * it per call so this suite leaves no cached plan behind — a leftover
    * sharing q57's exact plan would let MaterializeSpec's release
    * dissolve the common CacheManager entry and trip its registry
    * accounting (the cross-suite hazard Materialize's doc describes). */
  private def mixReleased[T](body: => T): T = {
    val (out, frames) = graft.ops.Materialize.collecting(body)
    graft.ops.Materialize.release(frames)
    out
  }

  test("temperatureMix ≡ naive quota + window draw, across repartitions") {
    val docs = Tables.load(spark, TestSpark.Sf, "documents")
    val quotas = naiveQuotas(docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap, budget = 120L)
    val expect = naive(docs, Int.MaxValue)
      .filter { case (stratum, _, rn) => rn <= quotas(stratum) }
    assert(expect.nonEmpty)
    for (p <- Seq(1, 5, 13)) {
      val got = mixReleased {
        Sampling.temperatureMix(docs.repartition(p), "lang", "doc_id", 120L)
          .as[(String, Long, Long)].collect().toSeq
      }
      assert(got == expect, s"repartition=$p")
    }
  }

  test("temperatureMix rebalances: dominant stratum under natural share, rare over") {
    val docs = Tables.load(spark, TestSpark.Sf, "documents")
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = sizes.values.sum
    val budget = 120L
    val drawn = mixReleased {
      Sampling.temperatureMix(docs, "lang", "doc_id", budget)
        .groupBy("stratum").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    assert(drawn.values.sum <= budget)
    // 'en' is ~44% of the fixture; its √n-weighted share must fall below
    // its natural share, and every rare stratum must rise above its own.
    val (big, _) = sizes.maxBy(_._2)
    assert(drawn(big).toDouble / budget < sizes(big).toDouble / total,
      s"$big not downweighted: $drawn vs $sizes")
    for ((s, n) <- sizes if s != big)
      assert(drawn(s).toDouble / budget > n.toDouble / total,
        s"$s not upweighted: $drawn vs $sizes")
  }

  test("temperatureMix ≡ naive across a budget sweep (quota-boundary hunt)") {
    // Quota floors shift with every budget; sweeping budgets hunts for
    // an off-by-one between the in-plan integer arithmetic and the
    // replayed Scala form at quota boundaries.
    val docs = Tables.load(spark, TestSpark.Sf, "documents")
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val all = naive(docs, Int.MaxValue)
    for (budget <- Seq(1L, 7L, 119L, 444L, 5000L)) {
      val quotas = naiveQuotas(sizes, budget)
      val expect = all.filter { case (stratum, _, rn) => rn <= quotas(stratum) }
      val got = mixReleased {
        Sampling.temperatureMix(docs, "lang", "doc_id", budget)
          .as[(String, Long, Long)].collect().toSeq
      }
      assert(got == expect, s"budget=$budget quotas=$quotas")
    }
  }

  test("targetMix follows the recipe, drops unlisted strata, caps at saturation") {
    val docs = Tables.load(spark, TestSpark.Sf, "documents")
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val recipe = Map("en" -> 30L, "de" -> 25L, "es" -> 25L, "fr" -> 20L)
    val partsTotal = recipe.values.sum
    for (budget <- Seq(200L, 5000L)) {
      val quotas = recipe.map { case (s, p) =>
        s -> math.min(sizes(s), budget * p / partsTotal) }
      val expect = naive(docs, Int.MaxValue).filter { case (stratum, _, rn) =>
        quotas.get(stratum).exists(rn <= _) }
      val got = mixReleased {
        Sampling.targetMix(docs, "lang", "doc_id", budget, recipe)
          .as[(String, Long, Long)].collect().toSeq
      }
      assert(got == expect, s"budget=$budget quotas=$quotas")
      // 'zh' is not in the recipe: zero drawn, however large the budget.
      assert(!got.exists(_._1 == "zh"))
      if (budget == 5000L) {
        // Every stratum saturates (quota = n); the shortfall is NOT
        // redistributed — the drawn mix never exceeds any recipe share.
        val drawn = got.groupBy(_._1).view.mapValues(_.size.toLong).toMap
        recipe.keys.foreach(s => assert(drawn(s) == sizes(s), s))
      }
    }
  }

  /** The waterfill rounds replayed in plain Scala on collected sizes —
    * the driver-side reference for the in-plan unrolled loop. */
  private def naiveWaterfill(sizes: Map[String, Long], budget: Long,
      parts: Map[String, Long]): Map[String, Long] = {
    var q = parts.keys.filter(sizes.contains).map(_ -> 0L).toMap
    for (_ <- 1 to Sampling.WaterfillRounds) {
      val rem = budget - q.values.sum
      val ap = q.collect { case (s, v) if v < sizes(s) => parts(s) }.sum
      q = q.map { case (s, v) =>
        s -> (if (v < sizes(s) && ap > 0)
          math.min(sizes(s), v + rem * parts(s) / ap) else v)
      }
    }
    q
  }

  test("tokenBudgetMix ≡ naive window form; never exceeds; drops unlisted strata") {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables.load(spark, TestSpark.Sf, "documents")
    val budgets = Map("en" -> 5000L, "de" -> 2000L, "fr" -> 2000L)
    val naiveForm = {
      val keyed = docs.select(col("lang").as("stratum"), col("doc_id"),
          TextStats.tokenCount(col("text")).cast("long").as("n_tokens"),
          md5(col("doc_id").cast("string")).as("pick"))
        .filter(col("stratum").isin(budgets.keys.toSeq: _*))
      val b = budgets.toSeq.toDF("stratum", "token_budget")
      keyed.withColumn("cum_tokens", coalesce(sum("n_tokens").over(
          Window.partitionBy("stratum").orderBy("pick", "doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .join(b, "stratum")
        .filter(col("cum_tokens") + col("n_tokens") <= col("token_budget"))
        .orderBy("stratum", "doc_id")
        .select("stratum", "doc_id", "n_tokens", "cum_tokens")
        .as[(String, Long, Long, Long)].collect().toSeq
    }
    assert(naiveForm.nonEmpty)
    for (p <- Seq(1, 7)) {
      val got = Sampling.tokenBudgetMix(docs.repartition(p), "lang", "doc_id",
          TextStats.tokenCount(col("text")), budgets)
        .as[(String, Long, Long, Long)].collect().toSeq
      assert(got == naiveForm, s"repartition=$p")
    }
    // Budget holds as a hard cap per stratum, and the cut is TIGHT: the
    // next md5-ordered document would overflow it.
    val byStratum = naiveForm.groupBy(_._1)
    budgets.foreach { case (s, b) =>
      val drawn = byStratum.get(s).map(_.map(_._3).sum).getOrElse(0L)
      assert(drawn <= b, s"$s drew $drawn > $b")
    }
    val en = byStratum("en")
    assert(en.map(_._3).sum <= 5000L && en.nonEmpty)
    // es/zh unlisted → absent.
    assert(!naiveForm.exists(r => r._1 == "es" || r._1 == "zh"))
  }

  test("waterfillMix redistributes saturated shortfall; ≡ naive round replay") {
    val docs = Tables.load(spark, TestSpark.Sf, "documents")
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val recipe = Map("en" -> 30L, "de" -> 25L, "es" -> 25L, "fr" -> 20L)
    for (budget <- Seq(340L, 400L, 5000L)) {
      val quotas = naiveWaterfill(sizes, budget, recipe)
      val expect = naive(docs, Int.MaxValue).filter { case (stratum, _, rn) =>
        quotas.get(stratum).exists(rn <= _) }
      val got = mixReleased {
        Sampling.waterfillMix(docs, "lang", "doc_id", budget, recipe)
          .as[(String, Long, Long)].collect().toSeq
      }
      assert(got == expect, s"budget=$budget quotas=$quotas")
      // Per-stratum caps hold and unlisted strata stay at zero.
      val drawn = got.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      drawn.foreach { case (s, d) => assert(d <= sizes(s), s) }
      assert(!got.exists(_._1 == "zh"))
      val capacity = recipe.keys.map(sizes).sum
      if (budget <= capacity) {
        // The redistribution's point: the budget is spent to within the
        // documented flooring residual (< Σ parts — a stalled round has
        // every alloc floor to 0), where targetMix leaves the whole
        // saturated shortfall undrawn.
        val residual = budget - got.size.toLong
        assert(residual >= 0 && residual < recipe.values.sum,
          s"budget=$budget drew ${got.size}")
      } else assert(got.size.toLong == capacity)
      val plain = mixReleased {
        Sampling.targetMix(docs, "lang", "doc_id", budget, recipe).count() }
      assert(got.size >= plain, s"budget=$budget")
    }
  }

  test("waterfillMix ≡ naive across a budget sweep (cascade/stall boundary hunt)") {
    // Sweep budgets across the saturation boundaries of every stratum —
    // each crossing changes which round a stratum saturates in and
    // where integer flooring stalls; the in-plan rounds must track the
    // driver-side replay through all of them.
    val docs = Tables.load(spark, TestSpark.Sf, "documents")
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val recipe = Map("en" -> 30L, "de" -> 25L, "es" -> 25L, "fr" -> 20L)
    val ranked = naive(docs, Int.MaxValue)
    for (budget <- 37L to 437L by 40L) {
      val quotas = naiveWaterfill(sizes, budget, recipe)
      val expect = ranked.filter { case (stratum, _, rn) =>
        quotas.get(stratum).exists(rn <= _) }
      val got = mixReleased {
        Sampling.waterfillMix(docs, "lang", "doc_id", budget, recipe)
          .as[(String, Long, Long)].collect().toSeq
      }
      assert(got == expect, s"budget=$budget quotas=$quotas")
    }
  }

  test("targetMix oracle SQL ''-escapes a quoting stratum name") {
    // targetMix itself handles ANY stratum string; the VALUES literal in
    // its oracle must too (ADVICE r10) — an embedded quote would either
    // break the oracle's parse or, worse, silently diverge it.
    val sql = Sampling.targetMixOracleSql(10L, Map("o'brien" -> 1L))
    assert(sql.contains("('o''brien', 1::BIGINT)"), sql)
  }

  test("temperatureMix with budget ≥ corpus keeps every document") {
    val docs = Tables.load(spark, TestSpark.Sf, "documents")
    assert(mixReleased {
      Sampling.temperatureMix(docs, "lang", "doc_id", 10000000L).count()
    } == docs.count())
  }

  test("temperatureMix raises the in-plan overflow guard, not a wrapped quota") {
    // budget near Long.MaxValue drives wtCap below any real weight —
    // the plan must raise the contract error instead of silently
    // wrapping budget*wt in non-ANSI mode.
    val docs = Tables.load(spark, TestSpark.Sf, "documents")
    mixReleased {
      val e = intercept[Exception] {
        Sampling.temperatureMix(docs, "lang", "doc_id",
          Long.MaxValue / 1000).count()
      }
      assert(e.getMessage.contains("overflows"), e.getMessage)
    }
  }

  test("temperatureMix on an empty corpus returns an empty frame") {
    val docs = Tables.load(spark, TestSpark.Sf, "documents")
    mixReleased {
      val out = Sampling.temperatureMix(docs.filter(lit(false)), "lang", "doc_id", 10L)
      assert(out.columns.toSeq == Seq("stratum", "doc_id", "rn"))
      assert(out.count() == 0)
    }
  }
}
