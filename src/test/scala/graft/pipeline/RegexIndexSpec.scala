package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The trigram regex index (q194/q195): the factor compiler's
  * soundness (conservative, never over-claiming), candidate
  * nomination as a provable superset, indexed search ≡ full-scan
  * rlike, landing identities, the O(deleted) takedown, compaction
  * invisibility, and the loud unanalyzable edge. */
class RegexIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val docs =
    graft.core.Tables.load(spark, TestSpark.Sf, "documents")

  private def drop(t: String): Unit =
    Seq(t, s"${t}_meta").foreach { x =>
      spark.sql(s"DROP TABLE IF EXISTS $x")
      spark.sql(s"DROP TABLE IF EXISTS ${x}_srcs")
    }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.collect().map(_.getLong(0)).toSeq

  private def lits(p: String) = RegexIndex.requiredLiterals(p)

  test("factor compiler: literal runs, quantifiers, classes, groups, escapes") {
    assert(lits("abc") == Some(Seq(Seq("abc"))))
    assert(lits("abcd|xyzw") == Some(Seq(Seq("abcd"), Seq("xyzw"))))
    // Class + quantifier break runs; both flanks stay required.
    assert(lits("slow [a-z]+ join") == Some(Seq(Seq("slow ", " join"))))
    // `?` and `*` drop the preceding literal; `+` keeps it.
    assert(lits("ab?cdef") == Some(Seq(Seq("cdef"))))
    assert(lits("abc*def") == Some(Seq(Seq("def"))))
    assert(lits("abc+def") == Some(Seq(Seq("abc", "def"))))
    assert(lits("abc+?def") == Some(Seq(Seq("abc", "def"))))
    // Counted repeats: {0,n} drops, {m>=1,...} keeps.
    assert(lits("abcd{0,3}efg") == Some(Seq(Seq("abc", "efg"))))
    assert(lits("abc{2,3}def") == Some(Seq(Seq("abc", "def"))))
    // Punctuation escapes contribute their literal.
    assert(lits("""foo\.bar""") == Some(Seq(Seq("foo.bar"))))
    // Class-like escapes break without claiming.
    assert(lits("""\d{3}-code""") == Some(Seq(Seq("-code"))))
    // Dot breaks.
    assert(lits("ab.cde") == Some(Seq(Seq("cde"))))
    // Groups are skipped wholesale (their alternation never splits
    // the top level); flanks stay required.
    assert(lits("foo(bar|baz)qux") == Some(Seq(Seq("foo", "qux"))))
    assert(lits("(?:abc)defg") == Some(Seq(Seq("defg"))))
    assert(lits("a(b(c|d))efg") == Some(Seq(Seq("efg"))))
    // Anchors break, claim nothing.
    assert(lits("^abcd$") == Some(Seq(Seq("abcd"))))
    // A LEADING (?i) flags the whole pattern: analyzable (the index
    // is case-folded); factors keep their case for the confirm.
    assert(lits("(?i)ABcd|efGH") == Some(Seq(Seq("ABcd"), Seq("efGH"))))
  }

  test("factor compiler bails to None rather than over-claim") {
    assert(lits("").isEmpty)
    assert(lits("[a-z]+").isEmpty)            // no literal at all
    assert(lits("ab|cdef").isEmpty)           // one branch factorless
    assert(lits("abc|").isEmpty)              // empty branch matches all
    assert(lits("ab(?i)cd").isEmpty)          // mid-pattern flag group
    assert(lits("(?=abc)def").isEmpty)        // lookaround
    assert(lits("(?<name>abc)def").isEmpty)   // named group
    assert(lits("""\p{Lu}abc""").isEmpty)     // operand-carrying escape
    assert(lits("""\x41bcd""").isEmpty)
    assert(lits("""(abc""").isEmpty)          // unbalanced
    assert(lits("""abc)""").isEmpty)
    assert(lits("*abc").isEmpty)              // dangling quantifier
    assert(lits("abc{bad}def").isEmpty)       // malformed braces
  }

  test("candidates are a superset; rlike confirm makes search exact") {
    import spark.implicits._
    val crafted = Seq(
      (1L, "qq abc def pp"),    // true match of "abc def"
      (2L, "qq def abc dpp"),   // every trigram present, NOT contiguous
      (3L, "abc only here"),    // half the trigrams
      (4L, "nothing at all"),
      (5L, "abc defg")          // match inside a longer token
    ).toDF("doc_id", "text")
    val tbl = "graft_test_regex_superset"
    drop(tbl)
    RegexIndex.writeRegexIndex(crafted, "doc_id", "text", tbl, buckets = 4)
    val pattern = "abc def"
    val cands = ids(RegexIndex.candidatesFromIndex(spark, tbl, pattern)
      .get.orderBy("doc_id"))
    // Doc 2 holds all five trigrams without the contiguous factor —
    // nominated by construction, rejected by the confirm.
    assert(cands == Seq(1L, 2L, 5L), cands.toString)
    val got = ids(RegexIndex.searchFromIndex(spark, tbl, crafted,
      "doc_id", "text", pattern))
    assert(got == Seq(1L, 5L), got.toString)
    drop(tbl)
  }

  test("indexed search ≡ full-scan rlike across pattern shapes; write+append ≡ one write; replay skipped") {
    val tbl = "graft_test_regex"
    drop(tbl)
    RegexIndex.writeRegexIndex(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", tbl, buckets = 8)
    RegexIndex.appendToRegexIndex(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", tbl, src = "spec:odds")
    val patterns = Seq(
      "slow [a-z]+ join|fast (table|key) order",
      "vector window batch|customer data group",
      "data (line|row)",
      "big [a-z]+ [a-z]+ merge",
      "window dup$")
    patterns.foreach { p =>
      val viaIndex = ids(RegexIndex.searchFromIndex(spark, tbl, docs,
        "doc_id", "text", p))
      val viaScan = ids(docs.filter(col("text").rlike(p))
        .select(col("doc_id")).orderBy("doc_id"))
      assert(viaIndex == viaScan, s"pattern '$p'")
      assert(viaScan.nonEmpty || p.contains("$"), s"dead fixture for '$p'")
    }
    // Replayed landing src: skipped.
    val before = spark.table(tbl).count()
    RegexIndex.appendToRegexIndex(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", tbl, src = "spec:odds")
    assert(spark.table(tbl).count() == before)
    drop(tbl)
  }

  test("unanalyzable pattern refuses loudly; allowScan states and pays the scan") {
    val tbl = "graft_test_regex_scan"
    drop(tbl)
    RegexIndex.writeRegexIndex(docs.limit(50), "doc_id", "text", tbl,
      buckets = 4)
    val p = "(line|row) [a-z]+" // groups claim nothing; no factor >= 3
    val e = intercept[IllegalArgumentException] {
      RegexIndex.searchFromIndex(spark, tbl, docs, "doc_id", "text", p)
    }
    assert(e.getMessage.contains("no required literal factor"))
    val got = ids(RegexIndex.searchFromIndex(spark, tbl, docs,
      "doc_id", "text", p, allowScan = true))
    val want = ids(docs.filter(col("text").rlike(p))
      .select(col("doc_id")).orderBy("doc_id"))
    assert(got == want && got.nonEmpty)
    drop(tbl)
  }

  test("case-folded index serves leading-(?i) patterns and keeps case-sensitive confirms exact") {
    import spark.implicits._
    val crafted = Seq(
      (1L, "xx SLOW deep JOIN yy"),  // (?i) match, case-sensitive miss
      (2L, "xx slow deep join yy"),  // both match
      (3L, "xx slow JOIN yy")        // neither (no middle word)
    ).toDF("doc_id", "text")
    val tbl = "graft_test_regex_ci"
    drop(tbl)
    RegexIndex.writeRegexIndex(crafted, "doc_id", "text", tbl, buckets = 4)
    val ci = ids(RegexIndex.searchFromIndex(spark, tbl, crafted,
      "doc_id", "text", "(?i)SLOW [a-z]+ JOIN"))
    assert(ci == Seq(1L, 2L), ci.toString)
    // Same factors, case-sensitive: the folded index nominates doc 1
    // too, the confirm rejects it.
    val cs = ids(RegexIndex.searchFromIndex(spark, tbl, crafted,
      "doc_id", "text", "slow [a-z]+ join"))
    assert(cs == Seq(2L), cs.toString)
    // Non-ASCII factors bail to None (folding agreement unprovable).
    assert(RegexIndex.candidatesFromIndex(spark, tbl, "straße").isEmpty)
    drop(tbl)
  }

  test("retire ≡ write-on-remaining; compaction answer-invisible; over-retire raises") {
    val tbl = "graft_test_regex_ret"
    val ref = "graft_test_regex_ret_ref"
    drop(tbl); drop(ref)
    val deleted = docs.filter(col("doc_id") % 3 === 0)
    val remaining = docs.filter(col("doc_id") % 3 =!= 0)
    RegexIndex.writeRegexIndex(docs, "doc_id", "text", tbl, buckets = 8)
    RegexIndex.retireFromRegexIndex(deleted, "doc_id", "text", tbl,
      src = "spec:del")
    RegexIndex.writeRegexIndex(remaining, "doc_id", "text", ref,
      buckets = 8)
    val pattern = "slow [a-z]+ join"
    // Probe CANDIDATES (not the confirmed search) so a stale
    // nomination of a retired doc cannot hide behind the rlike.
    def probe(t: String) = ids(RegexIndex.candidatesFromIndex(spark, t,
      pattern).get.orderBy("doc_id"))
    assert(probe(tbl) == probe(ref) && probe(tbl).nonEmpty)
    // A retire reusing its batch's own landing tag still happens
    // (op-namespaced markers), and each op's replay stays skipped.
    RegexIndex.retireFromRegexIndex(deleted, "doc_id", "text", tbl,
      src = "spec:del")
    assert(probe(tbl) == probe(ref))
    RegexIndex.compactRegexIndex(spark, tbl)
    assert(probe(tbl) == probe(ref))
    // Post-compaction: one row per (gram, doc_id).
    val p = spark.table(tbl).select("gram", "doc_id").collect()
      .map(_.toSeq)
    assert(p.length == p.distinct.length)
    // Over-retirement (docs never landed) raises at the read fold.
    val tbl2 = "graft_test_regex_bad"
    drop(tbl2)
    RegexIndex.writeRegexIndex(docs.filter(col("doc_id") % 4 === 0),
      "doc_id", "text", tbl2, buckets = 8)
    RegexIndex.retireFromRegexIndex(docs.filter(col("doc_id") % 8 === 1),
      "doc_id", "text", tbl2, src = "spec:bad")
    val e = intercept[Exception] {
      RegexIndex.candidatesFromIndex(spark, tbl2, pattern).get.collect()
    }
    assert((e.getMessage != null && e.getMessage.contains("below zero")) ||
      e.getCause != null, s"unexpected: $e")
    drop(tbl); drop(ref); drop(tbl2)
  }

  test("batched search ≡ union of single-pattern searches; unanalyzable member raises naming itself") {
    val tbl = "graft_test_regex_batch"
    drop(tbl)
    RegexIndex.writeRegexIndex(docs, "doc_id", "text", tbl, buckets = 8)
    val pats = Seq(
      "slow [a-z]+ join",
      "vector window batch|customer data group",
      "(?i)FAST (TABLE|KEY) ORDER")
    val (got, frames) = graft.ops.Materialize.collecting {
      RegexIndex.searchManyFromIndex(spark, tbl, docs, "doc_id", "text",
        pats).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    val (want, frames2) = graft.ops.Materialize.collecting {
      pats.zipWithIndex.flatMap { case (p, i) =>
        ids(RegexIndex.searchFromIndex(spark, tbl, docs, "doc_id",
          "text", p)).map(d => (i.toLong, d))
      }
    }
    graft.ops.Materialize.release(frames)
    graft.ops.Materialize.release(frames2)
    assert(got.nonEmpty && got == want)
    // One unanalyzable member poisons the BATCH promise — raise, name it.
    val e = intercept[IllegalArgumentException] {
      RegexIndex.searchManyFromIndex(spark, tbl, docs, "doc_id", "text",
        Seq("slow [a-z]+ join", "[0-9]+"))
    }
    assert(e.getMessage.contains("pattern 1"))
    drop(tbl)
  }

  test("conjunctive search ≡ ANDed scan; unanalyzable member tolerated; all-unanalyzable refuses") {
    val tbl = "graft_test_regex_conj"
    drop(tbl)
    RegexIndex.writeRegexIndex(docs, "doc_id", "text", tbl, buckets = 8)
    def scanAll(pats: Seq[String]) = ids(
      pats.foldLeft(docs.select(col("doc_id").cast("long").as("doc_id"),
          col("text")))((df, p) => df.filter(col("text").rlike(p)))
        .select("doc_id").orderBy("doc_id"))
    val cases = Seq(
      Seq("slow [a-z]+ join", "customer [a-z]+"),        // both analyzable
      Seq("slow [a-z]+ join", "(line|row) [a-z]+"),      // 2nd unanalyzable
      Seq("(?i)SLOW [a-z]+ JOIN", "customer [a-z]+ data"))
    cases.foreach { pats =>
      val (got, frames) = graft.ops.Materialize.collecting {
        ids(RegexIndex.searchAllFromIndex(spark, tbl, docs, "doc_id",
          "text", pats))
      }
      graft.ops.Materialize.release(frames)
      assert(got == scanAll(pats), pats.toString)
      assert(got.nonEmpty, s"dead fixture for $pats")
    }
    // Intersection shrinks: the conjunction is a subset of each member.
    val (both, frames) = graft.ops.Materialize.collecting {
      (ids(RegexIndex.searchAllFromIndex(spark, tbl, docs, "doc_id",
          "text", Seq("slow [a-z]+ join", "customer [a-z]+"))),
        ids(RegexIndex.searchFromIndex(spark, tbl, docs, "doc_id",
          "text", "slow [a-z]+ join")))
    }
    graft.ops.Materialize.release(frames)
    assert(both._1.toSet.subsetOf(both._2.toSet) &&
      both._1.size < both._2.size)
    // No analyzable member at all: loud, or explicit scan.
    val e = intercept[IllegalArgumentException] {
      RegexIndex.searchAllFromIndex(spark, tbl, docs, "doc_id", "text",
        Seq("(line|row) [a-z]+", "[0-9]+"))
    }
    assert(e.getMessage.contains("cannot nominate"))
    val viaScan = ids(RegexIndex.searchAllFromIndex(spark, tbl, docs,
      "doc_id", "text", Seq("(line|row) [a-z]+", "big [a-z]+"),
      allowScan = true))
    assert(viaScan == scanAll(Seq("(line|row) [a-z]+", "big [a-z]+")))
    drop(tbl)
  }

  test("doc store: store path ≡ index path; fetch bound raises loudly; reclaim after index retire") {
    val idx = "graft_test_regex_store_idx"
    val store = "graft_test_regex_store"
    drop(idx); drop(store)
    RegexIndex.writeRegexIndex(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", idx, buckets = 8)
    RegexIndex.appendToRegexIndex(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", idx, src = "spec:odds")
    RegexIndex.writeDocStore(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", store, buckets = 8)
    RegexIndex.appendToDocStore(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", store, src = "spec:odds")
    val p = "slow [a-z]+ join"
    val viaStore = ids(RegexIndex.searchFromStore(spark, idx, store, p))
    val viaIndex = ids(RegexIndex.searchFromIndex(spark, idx, docs,
      "doc_id", "text", p))
    assert(viaStore.nonEmpty && viaStore == viaIndex)
    // The store fetch is a PUSHED literal predicate, not a join.
    val plan = RegexIndex.searchFromStore(spark, idx, store, p)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.linesIterator.exists(l => l.contains("PushedFilters") &&
      l.contains("doc_id")), plan)
    // Nomination wider than the bound refuses loudly (maxLiteralIds=0
    // forces the join path, where the candidate-count gate lives).
    val e = intercept[IllegalArgumentException] {
      RegexIndex.searchFromStore(spark, idx, store, p, maxCandidates = 1,
        maxLiteralIds = 0)
    }
    assert(e.getMessage.contains("scan in disguise"))
    // The over-wide fetch degrades to the broadcast semi-join, same
    // answer (maxLiteralIds=0 forces it without a huge fixture).
    assert(ids(RegexIndex.searchFromStore(spark, idx, store, p,
      maxLiteralIds = 0)) == viaIndex)
    // Append replay is skipped.
    val before = spark.table(store).count()
    RegexIndex.appendToDocStore(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", store, src = "spec:odds")
    assert(spark.table(store).count() == before)
    // Retire from the INDEX: the store path stops serving those docs
    // (nomination gone) even while their store rows still stand; the
    // store rewrite then reclaims the bytes without changing answers.
    RegexIndex.retireFromRegexIndex(docs.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", idx, src = "spec:del")
    val remaining = ids(docs.filter(col("doc_id") % 3 =!= 0)
      .filter(col("text").rlike(p)).select(col("doc_id").cast("long"))
      .orderBy("doc_id"))
    assert(ids(RegexIndex.searchFromStore(spark, idx, store, p)) == remaining)
    RegexIndex.retireFromDocStore(spark, store,
      docs.filter(col("doc_id") % 3 === 0), "doc_id")
    assert(ids(RegexIndex.searchFromStore(spark, idx, store, p)) == remaining)
    // Store compaction: answer-invisible, one file set, replay still
    // skipped after the fold erased the live tags.
    RegexIndex.compactDocStore(spark, store)
    assert(ids(RegexIndex.searchFromStore(spark, idx, store, p)) == remaining)
    val afterCompact = spark.table(store).count()
    RegexIndex.appendToDocStore(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", store, src = "spec:odds")
    assert(spark.table(store).count() == afterCompact)
    drop(idx); drop(store)
  }

  test("index-targeted scrub ≡ full-scan replace; non-candidates pass through untouched; refusal path") {
    import spark.implicits._
    val tbl = "graft_test_regex_scrub"
    drop(tbl)
    RegexIndex.writeRegexIndex(docs, "doc_id", "text", tbl, buckets = 8)
    val (p, r) = ("slow [a-z]+ join", "[X]")
    val (got, frames) = graft.ops.Materialize.collecting {
      RegexIndex.scrubFromIndex(spark, tbl, docs, "doc_id", "text", p, r)
        .collect().map(row => (row.getLong(0), row.getString(1))).toSeq
    }
    graft.ops.Materialize.release(frames)
    val want = docs.select(col("doc_id").cast("long"),
        regexp_replace(col("text"), p, r)).orderBy("doc_id")
      .collect().map(row => (row.getLong(0), row.getString(1))).toSeq
    assert(got == want && got.size == docs.count())
    assert(got.exists(_._2.contains("[X]")), "dead fixture")
    // Docs the index does not nominate flow through BYTE-identical.
    val untouched = docs.filter(!col("text").rlike(p))
      .select(col("doc_id").cast("long"), col("text"))
      .collect().map(row => (row.getLong(0), row.getString(1))).toMap
    got.filter(x => untouched.contains(x._1)).foreach { case (id, t) =>
      assert(t == untouched(id))
    }
    // Unanalyzable: loud, or the stated full rewrite.
    val e = intercept[IllegalArgumentException] {
      RegexIndex.scrubFromIndex(spark, tbl, docs, "doc_id", "text",
        "(line|row) [a-z]+", r)
    }
    assert(e.getMessage.contains("cannot target"))
    val viaScan = RegexIndex.scrubFromIndex(spark, tbl, docs, "doc_id",
        "text", "(line|row) [a-z]+", r, allowScan = true)
      .collect().map(row => (row.getLong(0), row.getString(1))).toSeq
    val wantScan = docs.select(col("doc_id").cast("long"),
        regexp_replace(col("text"), "(line|row) [a-z]+", r))
      .orderBy("doc_id")
      .collect().map(row => (row.getLong(0), row.getString(1))).toSeq
    assert(viaScan == wantScan)
    drop(tbl)
  }

  test("stopword-common grams drop from nomination under spark.graft.regexMaxGramDf; superset + exactness hold") {
    import spark.implicits._
    // Every doc carries the stopword run "the " (corpus-wide posting
    // slices for its grams); only doc 1 matches the pattern.
    val crafted = (1L to 20L).map { i =>
      (i, if (i == 1L) "the quick fox" else s"the slow cat $i")
    }.toDF("doc_id", "text")
    val tbl = "graft_test_regex_stopgram"
    drop(tbl)
    RegexIndex.writeRegexIndex(crafted, "doc_id", "text", tbl, buckets = 4)
    val pattern = "the quick"
    def cands() = ids(RegexIndex.candidatesFromIndex(spark, tbl, pattern)
      .get.orderBy("doc_id"))
    val full = cands()
    try {
      spark.conf.set("spark.graft.regexMaxGramDf", "5")
      val pruned = cands()
      // Nomination is conjunctive, so dropping grams only GROWS the
      // candidate superset…
      assert(full.toSet.subsetOf(pruned.toSet), s"$full vs $pruned")
      // …and the selective grams ("qui" etc., df = 1) survive, so the
      // probe never reads the corpus-wide "the"/"he " posting slices
      // yet still nominates exactly the matching doc.
      assert(pruned == Seq(1L), pruned.toString)
      assert(ids(RegexIndex.searchFromIndex(spark, tbl, crafted,
        "doc_id", "text", pattern)) == Seq(1L))
      // Every gram common (bound 0): the branch is unservable — bail
      // to the stated scan, never a corpus-sized fetch in disguise.
      spark.conf.set("spark.graft.regexMaxGramDf", "0")
      assert(RegexIndex.candidatesFromIndex(spark, tbl, pattern).isEmpty)
      assert(ids(RegexIndex.searchFromIndex(spark, tbl, crafted,
        "doc_id", "text", pattern, allowScan = true)) == Seq(1L))
      intercept[IllegalArgumentException] {
        RegexIndex.searchManyFromIndex(spark, tbl, crafted,
          "doc_id", "text", Seq(pattern))
      }
    } finally {
      spark.conf.unset("spark.graft.regexMaxGramDf")
      drop(tbl)
    }
  }

  test("short docs index no trigrams and are never nominated") {
    import spark.implicits._
    val crafted = Seq((1L, "ab"), (2L, ""), (3L, "abc")).toDF("doc_id", "text")
    val tbl = "graft_test_regex_short"
    drop(tbl)
    RegexIndex.writeRegexIndex(crafted, "doc_id", "text", tbl, buckets = 4)
    assert(spark.table(tbl).filter(col("doc_id").isin(1L, 2L)).isEmpty)
    val got = ids(RegexIndex.searchFromIndex(spark, tbl, crafted,
      "doc_id", "text", "abc"))
    assert(got == Seq(3L))
    drop(tbl)
  }
}
