package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The size-stratified containment generator (q62) against planted
  * subsumption fixtures — including the small-inside-large case the
  * symmetric band generator (q60) PROVABLY misses on these exact
  * fixtures, which is the reason the stratified index exists. */
class StratifiedContainmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randText(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
  }

  private def released[T](body: => T): T = {
    val (out, frames) = graft.ops.Materialize.collecting(body)
    graft.ops.Materialize.release(frames)
    out
  }

  test("finds a 60-char quote inside a 3500-char page; symmetric bands miss it") {
    // Stratum gap: quote t=2 (53 windows), page t=8 (3493 windows) —
    // exactly StrataSpan apart, the widest in-scope ratio (~66×).
    val page = randText(42, 3500)
    val quote = page.substring(1000, 1060)
    val docs = Seq((1L, page), (2L, quote)).toDF("doc_id", "text")
    val found = released {
      MinHashDedup.stratifiedContainmentPairs(docs, "doc_id", "text", 0.9)
        .collect()
    }
    assert(found.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L &&
      r.getDouble(4) == 1.0), found.mkString(","))
    // The symmetric generator's structural miss, deterministically: at
    // est-Jaccard ≈ 53/3546 no band agrees, so even minCont = 0 finds
    // nothing — the planted fixture the SNIPPETS brief asked to prove.
    val sym = released {
      MinHashDedup.containmentPairs(docs, "doc_id", "text", 0.0).collect()
    }
    assert(!sym.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      sym.mkString(","))
  }

  test("a stratum gap beyond StrataSpan is the documented out-of-scope case") {
    // Huge page t=9, quote t=2: gap 7 > StrataSpan — no common active
    // level, no cells, no pair; the contract is bounded index cost, not
    // unbounded recall.
    val page = randText(7, 5000)
    val quote = page.substring(2000, 2060)
    val docs = Seq((1L, page), (2L, quote)).toDF("doc_id", "text")
    assert(released {
      MinHashDedup.stratifiedContainmentPairs(docs, "doc_id", "text", 0.0)
        .count()
    } == 0L)
    // The span knob (VERDICT r11 item 2): the SAME fixture flips to
    // found at span = 8 — the gap-7 pair is in scope, the quote's full
    // containment scores 1.0, and the widened index agrees with the
    // span-parameterized reference generator. Cost model: only the page
    // (t=9 > span) pays the wider floor; the quote's emission is
    // unchanged.
    val wide = released {
      MinHashDedup.stratifiedContainmentPairs(docs, "doc_id", "text", 0.9, span = 8)
        .collect()
    }
    assert(wide.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L &&
      r.getDouble(4) == 1.0), wide.mkString(","))
    val expect = referencePairs(Seq((1L, page), (2L, quote)), 0.9, span = 8)
    assert(wide.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4))).toSet == expect)
  }

  test("same-stratum prefix pair: stratified and symmetric agree to the bit") {
    val a = randText(11, 400)
    val docs = Seq((100L, a), (101L, a.take(300))).toDF("doc_id", "text")
    def row(df: org.apache.spark.sql.DataFrame) = df.collect()
      .find(r => r.getLong(0) == 100L && r.getLong(1) == 101L)
      .map(r => (r.getLong(2), r.getLong(3),
        java.lang.Double.doubleToLongBits(r.getDouble(4))))
    val strat = released { row(
      MinHashDedup.stratifiedContainmentPairs(docs, "doc_id", "text", 0.9)) }
    val sym = released { row(
      MinHashDedup.containmentPairs(docs, "doc_id", "text", 0.9)) }
    // Both generators catch a same-stratum subsumption, and the SHARED
    // verify stage makes their (n_a, n_b, containment) bit-identical.
    assert(strat.nonEmpty && strat == sym, s"$strat vs $sym")
    assert(strat.exists(_._3 == java.lang.Double.doubleToLongBits(1.0)))
  }

  test("MaxKeyDf drops boilerplate shingles: 70 sharers pruned, 3 kept") {
    // An identical-document flood: every sampled-shingle cell's df
    // equals the flood size. Past MaxKeyDf they are ALL dropped as
    // stop-shingles — mass-duplicated boilerplate is exact dedup's job
    // (q20), not the containment index's — so the flood produces no
    // pairs instead of an all-pairs scan. The SAME text at df = 3 is
    // below the bound: every cell survives and all 3 pairs report
    // containment 1.0.
    val body = randText(23, 100)
    def flock(n: Int) = (0L until n.toLong).map((_, body)).toDF("doc_id", "text")
    assert(released {
      MinHashDedup.stratifiedContainmentPairs(flock(70), "doc_id", "text", 0.3)
        .count()
    } == 0L)
    val small = released {
      MinHashDedup.stratifiedContainmentPairs(flock(3), "doc_id", "text", 0.3)
        .collect()
    }
    assert(small.length == 3, small.mkString(","))
    assert(small.forall(_.getDouble(4) == 1.0))
  }

  test("incremental containment: cross-side only, both directions, q62-consistent") {
    // Corpus holds a page and a small note; the increment brings a
    // quote FROM the page (new-inside-held) and a page CONTAINING the
    // note (held-inside-new) — both directions must surface, and
    // corpus-internal / increment-internal subsumption must NOT.
    val page = randText(31, 3000)
    val note = randText(37, 80)
    val corpus = Seq((1L, page), (2L, note), (3L, page.substring(100, 160)))
      .toDF("doc_id", "text") // doc 3: corpus-internal quote of doc 1
    val increment = Seq((10L, page.substring(1500, 1560)),
      (11L, randText(41, 2500) + note + randText(43, 400)))
      .toDF("doc_id", "text")
    val got = released {
      MinHashDedup.incrementalContainmentPairs(corpus, increment,
        "doc_id", "text", 0.9).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    }
    assert(got.exists(p => p._1 == 10L && p._2 == 1L && p._3 == 1.0),
      got.mkString(",")) // new quote inside held page
    assert(got.exists(p => p._1 == 11L && p._2 == 2L && p._3 == 1.0),
      got.mkString(",")) // held note inside new page
    // Never a same-side pair: every inc_id is from the increment,
    // every corp_id from the corpus.
    assert(got.forall(p => p._1 >= 10L && p._2 < 10L), got.mkString(","))
    // The full-corpus q62 on the union sees the same cross pairs with
    // identical scores (plus the within-side ones q65 excludes).
    val all = released {
      MinHashDedup.stratifiedContainmentPairs(corpus.unionAll(increment),
        "doc_id", "text", 0.9).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSet
    }
    got.foreach { case (inc, corp, c) =>
      val (a, b) = if (inc < corp) (inc, corp) else (corp, inc)
      assert(all.contains((a, b, c)), s"($inc,$corp)")
    }
    assert(all.exists(p => p._1 == 1L && p._2 == 3L), all.mkString(","))
  }

  /** Independent full-semantics reference of the stratified generator —
    * strata, one-per-shingle emissions, active levels, hot filter
    * (2..MaxKeyDf + possible probe), in-cell gates and exact scoring,
    * all re-derived from the scaladoc in plain driver Scala. The
    * randomized gate below plays the role the band path's join-mirror
    * equivalence tests play for q22/q27. */
  private def referencePairs(docs: Seq[(Long, String)], minCont: Double,
      span: Int = MinHashDedup.StrataSpan): Set[(Long, Long, Long, Long, Double)] =
    referenceCore(docs, minCont, None, span)

  /** Two-sided variant — the reference for
    * [[MinHashDedup.incrementalContainmentPairs]]: the hot filter adds
    * the both-sides requirement, pairs are cross-side only, ordered
    * (inc, corp). */
  private def referenceCross(docs: Seq[(Long, String)], incIds: Set[Long],
      minCont: Double): Set[(Long, Long, Long, Long, Double)] =
    referenceCore(docs, minCont, Some(incIds), MinHashDedup.StrataSpan)

  private def referenceCore(docs: Seq[(Long, String)], minCont: Double,
      incIds: Option[Set[Long]], span: Int): Set[(Long, Long, Long, Long, Double)] = {
    val k = MinHashDedup.ShingleK
    def rh(s: String): Long = {
      var h = 0L
      s.getBytes("UTF-8").foreach(b => h = (h * 31 + (b & 0xff)) & 0xFFFFFFFFL)
      h
    }
    val info = docs.filter(_._2.length >= k).map { case (id, text) =>
      val set = (0 to text.length - k).map(i => rh(text.substring(i, i + k))).toSet
      val m = math.max((text.length - k + 1) / MinHashDedup.SampleTarget, 1L)
      val t = (63 - java.lang.Long.numberOfLeadingZeros(m)).toInt
      (id, set, t)
    }
    val active = info.map(_._3).toSet
    def lo(t: Int) = math.max(t - span, 0)
    val mem = info.flatMap { case (id, set, t) =>
      set.toSeq.filter(u => active.exists(a =>
        a >= lo(t) && a <= t && (u & ((1L << a) - 1)) == 0)).map(u => (u, id, t))
    }
    val byId = info.map(i => i._1 -> i).toMap
    mem.groupBy(_._1).toSeq
      .filter { case (u, ms) => ms.size >= 2 && ms.size <= MinHashDedup.MaxKeyDf &&
        ms.exists { case (_, _, t) => (u & ((1L << t) - 1)) == 0 } &&
        incIds.forall(inc => ms.exists(m => inc(m._2)) && ms.exists(m => !inc(m._2))) }
      .flatMap { case (u, ms) =>
        val z = java.lang.Long.numberOfTrailingZeros(u)
        for {
          Seq((_, a, ta), (_, b, tb)) <- ms.sortBy(_._2).combinations(2).toSeq
          if z >= math.min(ta, tb) && math.abs(ta - tb) <= span
          if incIds.forall(inc => inc(a) != inc(b)) // cross-side only
          inter = (byId(a)._2 & byId(b)._2).size
          nA = byId(a)._2.size; nB = byId(b)._2.size
          c = inter / math.min(nA, nB).toDouble
          if c >= minCont
          (x, y, nX, nY) = incIds match {
            case Some(inc) if inc(b) => (b, a, nB, nA) // inc first
            case _ => (a, b, nA, nB)
          }
        } yield (x, y, nX.toLong, nY.toLong, c)
      }.toSet
  }

  test("Spark pipeline ≡ the independent reference on randomized corpora") {
    val frags = IndexedSeq(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "sphinx of black quartz judge my vow",
      "how vexingly quick daft zebras jump",
      "bright vixens jump dozy fowl quack")
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      // Mixed strata: word-salad docs of 1-6 fragments, occasionally
      // inflated 10x so size ratios spread across several strata, plus
      // planted substrings for true subsumption.
      val base = (0L until 30L).map { id =>
        val body = Seq.fill(1 + rnd.nextInt(6))(frags(rnd.nextInt(frags.length)))
          .mkString(" ")
        (id, (if (id % 7 == 0) body * 10 else body) + s" tail${rnd.nextInt(5)}")
      }
      val planted = base.take(4).zipWithIndex.collect {
        case ((_, text), i) if text.length > 120 =>
          (100L + i, text.substring(30, 30 + 60 + rnd.nextInt(30)))
      }
      val corpus = base ++ planted
      val expect = referencePairs(corpus, 0.3)
      val got = released {
        MinHashDedup.stratifiedContainmentPairs(
          corpus.toDF("doc_id", "text").repartition(5), "doc_id", "text", 0.3)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getDouble(4))).toSet
      }
      assert(got == expect,
        s"seed $seed: extra=${got -- expect} missing=${expect -- got}")
      assert(expect.nonEmpty, s"seed $seed produced an empty reference")

      // The incremental form against its own two-sided reference on the
      // same corpus, split doc_id % 5 (the q65 registration's split).
      val incIds = corpus.map(_._1).filter(_ % 5 == 0).toSet
      val expectX = referenceCross(corpus, incIds, 0.3)
      val gotX = released {
        MinHashDedup.incrementalContainmentPairs(
          corpus.filterNot(d => incIds(d._1)).toDF("doc_id", "text"),
          corpus.filter(d => incIds(d._1)).toDF("doc_id", "text"),
          "doc_id", "text", 0.3)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getDouble(4))).toSet
      }
      assert(gotX == expectX,
        s"seed $seed cross: extra=${gotX -- expectX} missing=${expectX -- gotX}")

      // The stored-sidecar overload (q67) on the same split: write the
      // corpus index, admit the same increment, and require the answer
      // BIT-EQUAL to the text form — the superset→filter identity under
      // randomized corpora.
      val tbl = s"graft_test_sc_$seed"
      CorpusWriter.writeStratifiedIndex(
        corpus.filterNot(d => incIds(d._1)).toDF("doc_id", "text"),
        "doc_id", "text", tbl, buckets = 4)
      val gotS = released {
        MinHashDedup.incrementalContainmentPairs(spark, tbl,
          corpus.filter(d => incIds(d._1)).toDF("doc_id", "text"),
          "doc_id", "text", 0.3, MinHashDedup.StrataSpan)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getDouble(4))).toSet
      }
      assert(gotS == expectX,
        s"seed $seed sidecar: extra=${gotS -- expectX} missing=${expectX -- gotS}")

      // Incremental landing (r12): the same sidecar built in TWO
      // landings — write half the corpus, append the other half — must
      // admit bit-identically (per-document emissions: write+append ≡
      // one write over the union; the reader re-distincts `_levels`).
      val tblA = s"graft_test_sc_append_$seed"
      val corpusDocs = corpus.filterNot(d => incIds(d._1))
      val (landA, landB) = corpusDocs.partition(_._1 % 2 == 0)
      CorpusWriter.writeStratifiedIndex(
        landA.toDF("doc_id", "text"), "doc_id", "text", tblA, buckets = 4)
      CorpusWriter.appendToStratifiedIndex(
        landB.toDF("doc_id", "text"), "doc_id", "text", tblA)
      val gotA = released {
        MinHashDedup.incrementalContainmentPairs(spark, tblA,
          corpus.filter(d => incIds(d._1)).toDF("doc_id", "text"),
          "doc_id", "text", 0.3, MinHashDedup.StrataSpan)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getDouble(4))).toSet
      }
      assert(gotA == expectX,
        s"seed $seed append: extra=${gotA -- expectX} missing=${expectX -- gotA}")
    }
  }

  test("sidecar admission survives an increment stratum the corpus lacks") {
    // Corpus strata = {5} only; the increment's tiny quote (t = 2) adds
    // an active level the stored `_levels` table has never seen. The
    // reader must form the active set from the UNION, which activates
    // stored floor rows a corpus-only view would filter out — the edge
    // that forces the sidecar to store the superset, not the filtered
    // emission.
    val page = randText(51, 500)
    val corpus = Seq((1L, page), (2L, randText(53, 450))).toDF("doc_id", "text")
    val increment = Seq((10L, page.substring(100, 160))).toDF("doc_id", "text")
    val tbl = "graft_test_sc_newlevel"
    CorpusWriter.writeStratifiedIndex(corpus, "doc_id", "text", tbl, buckets = 4)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    val stored = released { rows(
      MinHashDedup.incrementalContainmentPairs(spark, tbl, increment,
        "doc_id", "text", 0.9, MinHashDedup.StrataSpan)) }
    val inline = released { rows(
      MinHashDedup.incrementalContainmentPairs(corpus, increment,
        "doc_id", "text", 0.9)) }
    assert(stored == inline, s"stored=$stored inline=$inline")
    assert(stored.exists(p => p._1 == 10L && p._2 == 1L && p._5 == 1.0),
      stored.mkString(","))
    // The meta contract fails loudly on a span mismatch instead of
    // silently answering a differently-indexed question.
    val err = intercept[IllegalArgumentException] {
      MinHashDedup.incrementalContainmentPairs(spark, tbl, increment,
        "doc_id", "text", 0.9, span = 3)
    }
    assert(err.getMessage.contains("writeStratifiedIndex"))
  }

  test("reported scores match driver-side brute force on a random corpus") {
    val frags = IndexedSeq(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "sphinx of black quartz judge my vow",
      "how vexingly quick daft zebras jump",
      "bright vixens jump dozy fowl quack")
    val rnd = new scala.util.Random(13)
    val docs = (0L until 40L).map { id =>
      (id, Seq.fill(2 + rnd.nextInt(4))(frags(rnd.nextInt(frags.length)))
        .mkString(" ") + s" tail${rnd.nextInt(4)}")
    }.toDF("doc_id", "text").repartition(5)
    val sets = MinHashDedup.shingled(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSet).toMap
    val out = released {
      MinHashDedup.stratifiedContainmentPairs(docs, "doc_id", "text", 0.3)
        .collect()
    }
    assert(out.nonEmpty)
    // Precision: every reported row carries the exact set sizes and the
    // exact inter/min the full sets give — no candidate-stage artifact
    // ever leaks into a score.
    out.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a < b)
      assert(r.getLong(2) == sets(a).size && r.getLong(3) == sets(b).size)
      val expect = (sets(a) & sets(b)).size.toDouble /
        math.min(sets(a).size, sets(b).size)
      assert(r.getDouble(4) == expect, s"($a,$b)")
    }
    // Determinism: a second run reproduces the rows bit for bit.
    val again = released {
      MinHashDedup.stratifiedContainmentPairs(docs, "doc_id", "text", 0.3)
        .collect()
    }
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
