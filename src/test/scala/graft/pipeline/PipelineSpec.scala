package graft.pipeline

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("minhash finds a planted near-duplicate and not the unrelated doc") {
    val base = "the quick brown fox jumps over the lazy dog and keeps running far away " * 4
    val nearDup = base.replace("lazy", "idle") // one token changed
    val unrelated = "completely different content about spark catalyst optimizer internals " * 4
    val docs = Seq((0L, base), (1L, nearDup), (2L, unrelated)).toDF("doc_id", "text")
    val pairs = MinHashDedup.nearDupPairs(docs, "doc_id", "text", minSim = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("degenerate hot cell fails loud past spark.graft.maxCellMembers") {
    // An identical-document flood collapses to ONE signature → one cell
    // holding every member: the shape that would hang a single task in
    // the quadratic scan (SCALING.md caveat). Past the configurable
    // bound the job must fail with the contract error, not hang.
    val flood = (0L until 10L).map(i =>
      (i, "the same boilerplate page body repeated verbatim " * 4))
      .toDF("doc_id", "text")
    spark.conf.set("spark.graft.maxCellMembers", "4")
    try {
      val e = intercept[Exception] {
        MinHashDedup.nearDupPairs(flood, "doc_id", "text", minSim = 0.5).collect()
      }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else t.toString +: chain(t.getCause)
      assert(chain(e).exists(_.contains("maxCellMembers")), e.toString)
    } finally spark.conf.unset("spark.graft.maxCellMembers")
    // Under the default bound the same flood is legal: 10 identical docs
    // pair completely (45 pairs, all from their first agreeing band).
    assert(MinHashDedup.nearDupPairs(flood, "doc_id", "text", minSim = 0.5)
      .count() == 45)
  }

  test("grouped-cell candidatePairs ≡ the band self-join, est_sim bits included") {
    import org.apache.spark.sql.functions.{concat, lit}
    // Fixture + planted replica families across repartitions — replicas
    // agree on many bands, the shape where the join form overproduces.
    val base = graft.core.Tables.load(spark, graft.TestSpark.Sf, "documents")
      .select(col("doc_id"), col("text")).limit(200)
    val planted = base.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 600000L).as("doc_id"),
        concat(lit("r1 "), col("text")).as("text"))
    val corpus = base.unionAll(planted).repartition(7)
    val sig = MinHashDedup.signatures(corpus, "doc_id", "text").cache()
    def run(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
      f(sig).orderBy("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSeq
    val grouped = run(MinHashDedup.candidatePairs)
    val joined = run(MinHashDedup.joinCandidatePairs)
    assert(grouped == joined)
    assert(grouped.nonEmpty)
  }

  test("grouped ≡ join candidates/jaccard on randomized shared-fragment corpora") {
    // Random corpora built from a shared fragment vocabulary — bucket
    // structure varies per seed (partial overlaps, chains, singletons),
    // covering collision/agreement shapes no planted fixture fixes.
    val frags = IndexedSeq(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "sphinx of black quartz judge my vow",
      "how vexingly quick daft zebras jump",
      "bright vixens jump dozy fowl quack")
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val docs = (0L until 40L).map { id =>
        val text = Seq.fill(3 + rnd.nextInt(3))(frags(rnd.nextInt(frags.length)))
          .mkString(" ") + s" tail${rnd.nextInt(4)}"
        (id, text)
      }.toDF("doc_id", "text").repartition(5)
      val sig = MinHashDedup.signatures(docs, "doc_id", "text").cache()
      def bits(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("doc_a", "doc_b").collect()
          .map(r => (r.getLong(0), r.getLong(1),
            java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSeq
      assert(bits(MinHashDedup.candidatePairs(sig)) ==
        bits(MinHashDedup.joinCandidatePairs(sig)), s"candidates seed $seed")
      assert(bits(MinHashDedup.jaccardPairs(docs, "doc_id", "text", 0.3)) ==
        bits(MinHashDedup.joinJaccardPairs(docs, "doc_id", "text", 0.3)),
        s"jaccard seed $seed")
    }
  }

  test("containment ≥ jaccard on the same LSH candidates; an exact prefix scores 1.0") {
    import spark.implicits._
    val (_, frames) = graft.ops.Materialize.collecting {
      // Same randomized-corpus generator as the equivalence gate above.
      val frags = IndexedSeq(
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "sphinx of black quartz judge my vow",
        "how vexingly quick daft zebras jump",
        "bright vixens jump dozy fowl quack")
      val rnd = new scala.util.Random(7)
      val docs = (0L until 40L).map { id =>
        val text = Seq.fill(3 + rnd.nextInt(3))(frags(rnd.nextInt(frags.length)))
          .mkString(" ") + s" tail${rnd.nextInt(4)}"
        (id, text)
      }.toDF("doc_id", "text").repartition(5)
      val jac = MinHashDedup.jaccardPairs(docs, "doc_id", "text", 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val cont = MinHashDedup.containmentPairs(docs, "doc_id", "text", 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
      // Same candidate pairs (same banding, same first-band uniqueness),
      // and inter/min dominates inter/union pointwise.
      assert(cont.keySet == jac.keySet)
      assert(cont.nonEmpty)
      cont.foreach { case (k, (na, nb, c)) =>
        assert(c >= jac(k) - 1e-12 && c <= 1.0 + 1e-12, s"$k: $c vs ${jac(k)}")
        assert(na > 0 && nb > 0)
      }
      // Planted subsumption: B is an exact character prefix of A, so every
      // shingle of B is a shingle of A — containment exactly 1.0 while
      // Jaccard only reports the size ratio.
      val rnd2 = new scala.util.Random(11)
      val a = Seq.fill(400)(('a' + rnd2.nextInt(26)).toChar).mkString
      val planted = Seq((100L, a), (101L, a.take(300))).toDF("doc_id", "text")
      val pc = MinHashDedup.containmentPairs(planted, "doc_id", "text", 0.9)
        .collect()
      assert(pc.exists(r => r.getLong(0) == 100L && r.getLong(1) == 101L &&
        r.getDouble(4) == 1.0), pc.mkString(","))
      val pj = MinHashDedup.jaccardPairs(planted, "doc_id", "text", 0.0)
        .collect().find(r => r.getLong(0) == 100L).map(_.getDouble(2))
      assert(pj.exists(j => j < 1.0), s"prefix pair jaccard: $pj")
    }
    graft.ops.Materialize.release(frames)
  }

  test("native minhash_sig ≡ the composed HOF formulation on fixture docs") {
    import org.apache.spark.sql.functions.expr
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.core.Tables.load(spark, graft.TestSpark.Sf, "documents")
      .limit(100)
    val K = MinHashDedup.ShingleK
    val hofSig = (0 until MinHashDedup.NumHashes)
      .map(j => s"array_min(transform(sh, s -> (s * ${MinHashDedup.A(j)}L + ${MinHashDedup.B(j)}L) % ${MinHashDedup.P}L))")
      .mkString("array(", ", ", ")")
    val both = docs
      .withColumn("sh", expr(
        s"array_distinct(transform(sequence(1, char_length(text) - ${K - 1}), " +
          s"i -> rolling_hash(substring(text, i, $K))))"))
      .selectExpr("doc_id", s"$hofSig AS hof", "minhash_sig(text) AS native")
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"doc ${r.getLong(0)}")
    }
    assert(both.length == 100)
  }

  test("native shingle_set ≡ the composed HOF formulation on fixture docs") {
    val docs = graft.core.Tables.load(spark, graft.TestSpark.Sf, "documents")
      .limit(100)
    // Native emits the SORTED distinct set as 32-bit-wrapped ints (the
    // merge-intersection shape); the HOF mirror emits first-occurrence
    // longs in 0..2^32 — equal as SETS through the bijective wrap.
    val native = MinHashDedup.shingled(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val hof = MinHashDedup.hofShingled(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native.size == 100)
    native.foreach { case (id, s) =>
      assert(s == s.sorted, s"doc $id not sorted")
      assert(s.toSet == hof(id).map(_.toInt).toSet, s"doc $id set mismatch")
      assert(s.size == hof(id).size, s"doc $id wrap collision")
    }
  }

  test("native sig_agree_count / sig_band_mask ≡ composed formulations") {
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.core.Tables.load(spark, graft.TestSpark.Sf, "documents")
      .limit(60)
    val sig = MinHashDedup.signatures(docs, "doc_id", "text")
    // All pairs over a small slice: agreeing AND disagreeing signatures.
    val b = MinHashDedup.Bands
    val r = MinHashDedup.RowsPerBand
    val bandAgreeTerms = (0 until b).map { p =>
      val slots = (0 until r)
        .map(j => s"a.sig[${p * r + j}] = b.sig[${p * r + j}]")
        .mkString("(", " AND ", ")")
      s"(CASE WHEN $slots THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")
    val rows = sig.as("a").crossJoin(sig.as("b"))
      .selectExpr(
        "sig_agree_count(a.sig, b.sig) AS native_cnt",
        "size(filter(zip_with(a.sig, b.sig, (x, y) -> x = y), v -> v)) AS hof_cnt",
        "sig_band_mask(a.sig, b.sig) AS native_mask",
        s"$bandAgreeTerms AS hof_mask")
      .collect()
    assert(rows.length == 3600)
    rows.foreach { row =>
      assert(row.getInt(0) == row.getInt(1), "agree count mismatch")
      assert(row.getInt(2) == row.getInt(3), "band mask mismatch")
    }
    assert(rows.exists(_.getInt(2) == (1 << b) - 1)) // self-pairs all-agree
    assert(rows.exists(_.getInt(2) == 0))            // unrelated docs none
  }

  test("identical texts give identical signatures (est_sim = 1.0)") {
    val t = "alpha beta gamma delta epsilon zeta eta theta " * 3
    val docs = Seq((10L, t), (20L, t)).toDF("doc_id", "text")
    val pairs = MinHashDedup.nearDupPairs(docs, "doc_id", "text", 0.99).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Double]("est_sim") == 1.0)
  }

  test("LSH-bucketed cosine near-dup finds planted duplicate vectors") {
    val dim = 8
    val v = Array.tabulate(dim)(i => (i + 1).toFloat)
    val almost = v.clone(); almost(0) = v(0) * 1.0001f
    val other = Array.tabulate(dim)(i => (if (i % 2 == 0) -1f else 1f) * (dim - i))
    val df = Seq((1L, v.toSeq), (2L, almost.toSeq), (3L, other.toSeq))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.bucketedNearDupPairs(df, "vec_id", "embedding", dim, 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("q33 perturbed family: recovered pairs include one found via a NON-first band") {
    val got = graft.SparkEntry.queries("q33_sign_lsh_pairs")(spark, graft.TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val perturbedPairs = got.filter { case (a, b, _) => b == a + 2000000L }
    assert(perturbedPairs.nonEmpty, got.mkString(", "))
    // cos strictly below 1 but above the 1/sqrt(1+eps²) bound: the
    // perturbation is real, not an identical copy in disguise.
    perturbedPairs.foreach { case (_, _, c) => assert(c < 1.0 && c >= 0.9995, c) }

    // Recompute band buckets with the test mirror (same fold order as
    // vec_dot) and assert at least one recovered pair DISAGREES on band 0
    // while agreeing on a later band — the band-OR recall path, which an
    // identical-signature plant could never exercise (VERDICT r5 item 6).
    val base = graft.core.Tables.load(spark, graft.TestSpark.Sf, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS emb")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val viaLaterBand = perturbedPairs.filter { case (a, _, _) =>
      val sa = Similarity.bandBuckets(base(a), base(a).length)
      val sb = Similarity.bandBuckets(Similarity.perturb(base(a)), base(a).length)
      sa.head != sb.head && sa.tail.zip(sb.tail).exists { case (x, y) => x == y }
    }
    assert(viaLaterBand.nonEmpty,
      s"no perturbed pair flipped a band-0 bit yet matched a later band: $perturbedPairs")
  }

  test("brute-force top-k ranks an exact duplicate first with cos ≈ 1") {
    val dim = 8
    val q = Array.tabulate(dim)(i => (i + 1).toFloat)
    val vecs = Seq(
      (0L, q.toSeq),
      (1L, q.map(_ * 2f).toSeq), // same direction → cos 1
      (2L, Array.tabulate(dim)(i => (dim - i).toFloat).toSeq),
      (3L, Array.tabulate(dim)(i => (if (i == 0) 1f else 0f)).toSeq))
    val df = vecs.toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(df, "vec_id", "embedding", queryId = 0L, k = 2).collect()
    assert(top.head.getAs[Long]("vec_id") == 1L)
    assert(math.abs(top.head.getAs[Double]("cos") - 1.0) < 1e-12)
  }

  test("batch top-k ≡ per-query brute force, across repartitions") {
    val emb = graft.core.Tables.load(spark, graft.TestSpark.Sf, "embeddings")
    val qids = Seq(0L, 1L, 2L)
    def brute(qid: Long): Seq[(Long, Long, Double)] =
      Similarity.bruteForceTopK(emb, "vec_id", "embedding", qid, 5)
        .collect().map(r => (qid, r.getLong(0), r.getDouble(1))).toSeq
    val expect = qids.flatMap(brute).sortBy(t => (t._1, t._2))
    for (p <- Seq(1, 7)) {
      val got = Similarity.batchTopK(emb.repartition(p), "vec_id", "embedding", qids, 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got == expect, s"repartition=$p")
    }
  }

  test("hard negatives: same-label rows (incl. the query) are excluded; " +
      "rest ≡ batch top-k over the filtered corpus") {
    import org.apache.spark.sql.functions._
    val emb = graft.core.Tables.load(spark, graft.TestSpark.Sf, "embeddings")
    val qids = Seq(0L, 1L)
    val got = Similarity.hardNegatives(emb, "vec_id", "embedding", "label",
        qids, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // No returned neighbor shares its query's label.
    val labels = emb.select(col("vec_id"), col("label").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.forall { case (qid, id, _) => labels(id) != labels(qid) })
    // Equivalent to batchTopK where the corpus is pre-filtered per query.
    val expect = qids.flatMap { qid =>
      Similarity.batchTopK(
        emb.filter(col("label").cast("long") =!= labels(qid))
          .unionAll(emb.filter(col("vec_id") === qid)),
        "vec_id", "embedding", Seq(qid), 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }.sortBy(t => (t._1, t._2))
    assert(got === expect)
  }

  test("semantic decontam: planted eval near-copy flags; best eval match ≡ brute force") {
    import org.apache.spark.sql.functions._
    val emb = graft.core.Tables.load(spark, graft.TestSpark.Sf, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    // Plant a scaled copy of eval vector 0 as corpus id 900001: cosine is
    // scale-invariant, so its nearest eval neighbor is exact (cos = 1
    // up to float error) and it must flag at any sane tau.
    val planted = emb.unionAll(
      emb.filter(col("vec_id") === 0L)
        .select(lit(900001L).as("vec_id"), expr("transform(emb, x -> x * 2.0d)").as("emb")))
    val r = Similarity.semanticDecontam(planted, "vec_id", "emb",
        col("vec_id") % 97 === 0, tau = 0.95)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2), x.getBoolean(3))).toMap
    val (evalId, cos, flagged) = r(900001L)
    assert(evalId === 0L && cos > 0.999 && flagged)
    // Every non-eval vector reports exactly once (annotation form).
    assert(r.size === planted.filter(col("vec_id") % 97 =!= 0).count())
    // Spot-check a corpus vector's best match against per-pair brute force.
    val some = 1L
    val best = planted.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("eval_id"), col("emb").as("qv"))
      .crossJoin(planted.filter(col("vec_id") === some).select(col("emb")))
      .selectExpr("eval_id",
        "vec_dot(emb, qv) / (sqrt(vec_dot(emb, emb)) * sqrt(vec_dot(qv, qv))) AS cos")
      .orderBy(desc("cos"), col("eval_id")).head()
    assert(r(some)._1 === best.getLong(0) && r(some)._2 === best.getDouble(1))
  }

  test("langId picks the dominant stopword profile") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(
      "the cat and the dog sat in the garden and it is warm",
      "der hund und die katze das ist nicht ein problem mit",
      "el perro y la casa de que los gatos una vez por dia",
      "le chat et les chiens dans une maison est grande des arbres",
      "xyzzy plugh 12345").toDF("text")
    val out = df.select(TextStats.langId(col("text")).as("lang")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("en", "de", "es", "fr", "und"))
  }

  test("grouped top-pair ≡ the self-join + window formulation, bits included") {
    val emb = graft.core.Tables.load(spark, graft.TestSpark.Sf, "embeddings")
    val fast = Similarity.topPairPerGroup(emb, "vec_id", "embedding", "label")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val hof = Similarity.hofTopPairPerGroup(emb, "vec_id", "embedding", "label")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(fast.nonEmpty && fast.toSeq == hof.toSeq)
  }

  test("repetition score flags self-repeating text, keeps diverse text") {
    val docs = Seq(
      (0L, "a b c a b c a b c"),   // 7 grams, 3 distinct → rep ≈ 0.571
      (1L, "the quick brown fox jumps over a lazy dog"), // all distinct
      (2L, "one two")              // < 3 tokens → no grams
    ).toDF("doc_id", "text")
    val got = TextStats.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4)))
    assert(got(0) == ((0L, 7L, 3L, Some(1.0 - 3.0 / 7.0), false)))
    assert(got(1)._2 == 7L && got(1)._3 == 7L && got(1)._4 == Some(0.0) && got(1)._5)
    assert(got(2) == ((2L, 0L, 0L, None, false)))
  }

  test("pii scrub counts and redacts emails/phones/IPs/CCNs; clean text untouched") {
    val docs = Seq(
      (0L, "write to jane.doe@example.org or +1-555-0777 anytime"),
      (1L, "no contact info in this sentence at all"),
      (2L, "from 10.0.0.1 card 4111111111111111 ref 4111111111111112")
    ).toDF("doc_id", "text")
    val got = TextStats.piiScrub(docs, "doc_id", "text").collect()
    // Row layout: doc_id, n_emails, n_phones, n_ips, n_ccns, clean_len, scrub_fp.
    assert(got(0).getLong(1) == 1L && got(0).getLong(2) == 1L)
    assert(got(0).getLong(3) == 0L && got(0).getLong(4) == 0L)
    // "<EMAIL>"(7) + "<PHONE>"(7) replace the 20-char email + 11-char phone.
    val t0 = "write to jane.doe@example.org or +1-555-0777 anytime"
    assert(got(0).getLong(5) == t0.length - 20 + 7 - 11 + 7)
    assert(got(1).getLong(1) == 0L && got(1).getLong(2) == 0L &&
      got(1).getLong(3) == 0L && got(1).getLong(4) == 0L)
    assert(got(1).getLong(5) == "no contact info in this sentence at all".length)
    // Unchanged text fingerprints to the raw rolling hash.
    val fp = graft.functions.RollingHashExpr
    assert(got(1).getLong(6) == fp.hash("no contact info in this sentence at all".getBytes))
    // IP redacted; only the Luhn-VALID 16-digit run redacted.
    assert(got(2).getLong(3) == 1L && got(2).getLong(4) == 1L)
    assert(got(2).getLong(6) == fp.hash(
      "from <IP> card <CCN> ref 4111111111111112".getBytes))
  }

  test("native pii_scrub ≡ the regexp formulation on adversarial text") {
    val fixture = graft.core.Tables.load(spark, graft.TestSpark.Sf, "documents")
      .limit(60).selectExpr("doc_id",
        "concat(text, element_at(array('', ' contact bob.smith@example.com today', " +
          "' call +1-555-0142 now', ' mail a.b@mail.org or dial +1-555-09', " +
          "' from 10.0.12.255 and 999.1234.5.6.7', " +
          "' card 4111111111111111 not 4111111111111112 or 1.2.3.4'), " +
          "cast(doc_id % 6 + 1 AS INT))) AS text")
    val adversarial = Seq(
      (1000L, "x@y.za@b.cd"),              // tld greedily eats into next local
      (1001L, "a@@b.c .. ..ab@c.de"),      // double @, leading dots in local
      (1002L, "a@b..c A@B.COM é@b.cé"),    // empty domain tail, case, multibyte
      (1003L, "+1-555-0 and ++1-555-0142 and +1-555-01+1-555-02"), // no-digit, double +, adjacent
      (1004L, "x@y.z@w.com plus jane.doe@sub9.mail"),              // resume-at-end
      (1005L, ""),                         // empty
      (1006L, "1234.5.6.7 1.2.3.45678 999.999.999.999"), // mid-run start, greedy last octet, no value check
      (1007L, "1.2.3.4.5.6.7.8 ...1.1.1.1 2.2.2.2."),    // adjacent quads, leading/trailing dots
      (1008L, "4111111111111111 4111 1111 1111 1111"),   // valid CCN; spaced groups stay
      (1009L, "94111111111111111 41111111111111112222"), // embedded-in-longer-run, >19 digits
      (1010L, "079927398713 0079927398713"),             // 12-digit Luhn (short) vs 13-digit valid
      (1011L, "1.2.3.4111111111111111 10.0.0.1é中4111111111111111") // IP eats CCN head; multibyte boundary
    ).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame, f: (org.apache.spark.sql.DataFrame, String, String) => org.apache.spark.sql.DataFrame) =
      f(df, "doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(run(fixture, TextStats.piiScrub) == run(fixture, TextStats.hofPiiScrub))
    assert(run(adversarial, TextStats.piiScrub) == run(adversarial, TextStats.hofPiiScrub))
  }

  test("token and subword counters") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq("hello, world! this is  spark").toDF("text")
    val r = df.select(
      TextStats.tokenCount(col("text")).as("t"),
      TextStats.punctCount(col("text")).as("p"),
      TextStats.subwordCount(col("text")).as("s")).head()
    assert(r.getAs[Long]("t") == 5L)
    assert(r.getAs[Long]("p") == 2L) // BIGINT since punct joined token_stats
    assert(r.getAs[Int]("s") >= 7) // 4-char chunks + symbols
  }
}
