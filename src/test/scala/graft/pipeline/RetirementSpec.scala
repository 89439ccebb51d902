package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Sidecar retirement (r17): every family's delete must equal the
  * sidecar written on the remaining corpus — the q67 landing identity
  * in reverse — with the cheapest discipline each layout admits. */
class RetirementSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val docs =
    graft.core.Tables.load(spark, TestSpark.Sf, "documents")
  private lazy val emb =
    graft.core.Tables.load(spark, TestSpark.Sf, "embeddings")

  private def rows(t: String): Set[String] =
    spark.table(t).collect().map(_.mkString("|")).toSet

  private def drop(ts: String*): Unit =
    ts.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  test("SQ8: retire(full, odds) member rows ≡ full minus odds; grid untouched") {
    val t = "graft_ret_sq8"
    drop(t, s"${t}_grid", s"${t}_meta")
    CorpusWriter.writeSq8Index(emb, "vec_id", "embedding", dim = 64, t,
      buckets = 8)
    val before = rows(t)
    val gridBefore = rows(s"${t}_grid")
    CorpusWriter.retireFromSq8Index(spark, t,
      emb.filter(col("vec_id") % 2 === 1), "vec_id")
    val odds = emb.filter(col("vec_id") % 2 === 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val expect = before.filterNot(r => odds.contains(r.takeWhile(_ != '|').toLong))
    assert(rows(t) == expect)
    assert(rows(s"${t}_grid") == gridBefore)
    // Retiring already-retired (or never-present) ids is a no-op.
    CorpusWriter.retireFromSq8Index(spark, t,
      emb.filter(col("vec_id") % 2 === 1), "vec_id")
    assert(rows(t) == expect)
    drop(t, s"${t}_grid", s"${t}_meta")
  }

  test("IVF: partition-scoped retire — rows match, untouched cell files untouched, emptied cells dropped") {
    import spark.implicits._
    // Hand-built corpus with a cell whose members ALL retire: vectors
    // cluster tightly by construction (k seeds = 4 lowest ids).
    def vec(seed: Int): Seq[Float] =
      (0 until 64).map(i => (((seed * 37 + i * 13) % 11) - 5).toFloat / 5f)
    val corpus = (0 until 24).map { id =>
      (id.toLong, vec(id % 4).map(v => v + (id / 4) * 0.001f))
    }.toDF("vec_id", "embedding")
    val t = "graft_ret_ivf"
    drop(t, s"${t}_cent", s"${t}_meta")
    CorpusWriter.writeIvfIndex(corpus, "vec_id", "embedding", t,
      k = 4, rounds = 2)
    val cellOf = spark.table(t).select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Retire one whole cell plus one member of another.
    val doomCell = cellOf(0L)
    val doomIds = cellOf.collect { case (id, c) if c == doomCell => id }.toSeq ++
      cellOf.collectFirst { case (id, c) if c != doomCell => id }.toSeq
    val partnerCell = cellOf(doomIds.last)
    val untouched = cellOf.values.toSet -- Set(doomCell, partnerCell)
    assert(untouched.nonEmpty, s"need an untouched cell: $cellOf")
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(t)
    val loc = spark.sessionState.catalog.getTableMetadata(ident).location
    def cellFiles(c: Long): Set[String] = {
      val p = new org.apache.hadoop.fs.Path(loc.toString, s"cell=$c")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) Set.empty
      else fs.listStatus(p).map(s => s.getPath.getName + ":" + s.getModificationTime).toSet
    }
    val untouchedBefore = untouched.map(c => c -> cellFiles(c)).toMap
    val before = rows(t)
    CorpusWriter.retireFromIvfIndex(spark, t,
      doomIds.toDF("vec_id"), "vec_id")
    val expect = before.filterNot(r => doomIds.contains(r.takeWhile(_ != '|').toLong))
    assert(rows(t) == expect)
    // Untouched cells: same files, same mtimes — the rewrite was scoped.
    untouched.foreach(c => assert(cellFiles(c) == untouchedBefore(c),
      s"cell $c was rewritten"))
    // The fully-retired cell's directory is gone from the catalog.
    val liveCells = spark.table(t).select("cell").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(!liveCells.contains(doomCell))
    drop(t, s"${t}_cent", s"${t}_meta")
  }

  test("IVF-PQ: retire ≡ member rows minus ids; probe excludes them and stays consistent") {
    val t = "graft_ret_ivfpq"
    drop(t, s"${t}_coarse", s"${t}_books", s"${t}_meta")
    CorpusWriter.writeIvfPqIndex(emb, "vec_id", "embedding", t,
      kCoarse = 8, coarseRounds = 2, m = 8, k = 16, pqRounds = 2, dim = 64)
    val before = rows(t)
    val doomed = emb.filter(col("vec_id") % 3 === 1)
    val doomedIds = doomed.select("vec_id").collect().map(_.getLong(0)).toSet
    CorpusWriter.retireFromIvfPqIndex(spark, t, doomed, "vec_id")
    val expect = before.filterNot(r => doomedIds.contains(r.takeWhile(_ != '|').toLong))
    assert(rows(t) == expect)
    val probe = ProductQuant.ivfAdcTopKFromIndex(spark, t,
        emb.filter(col("vec_id").isin(0L, 2L)), "vec_id", "embedding",
        nprobe = 3, topK = 10)
      .collect().map(_.getLong(1)).toSet
    assert(probe.intersect(doomedIds).isEmpty)
    drop(t, s"${t}_coarse", s"${t}_books", s"${t}_meta")
  }

  test("LM: subtract landing + compaction ≡ model written on the remaining train set") {
    val t = "graft_ret_lm"
    val tRef = "graft_ret_lm_ref"
    drop(t, s"${t}_meta", s"${t}_srcs", tRef, s"${tRef}_meta")
    val a = docs.filter(col("doc_id") % 4 === 0)
    val b = docs.filter(col("doc_id") % 4 === 2)
    CorpusWriter.writeLmModel(a, "text", t, buckets = 8)
    CorpusWriter.appendToLmModel(b, "text", t, src = "retspec:land-b")
    CorpusWriter.retireFromLmModel(b, "text", t, src = "retspec:retire-b")
    CorpusWriter.writeLmModel(a, "text", tRef, buckets = 8)
    def scores(tbl: String): Seq[String] = {
      val (r, frames) = graft.ops.Materialize.collecting {
        TrigramModel.scoreFromModel(docs.filter(col("doc_id") % 2 === 1),
            "doc_id", "text", spark.table(tbl))
          .collect().map(_.mkString("|")).toSeq
      }
      graft.ops.Materialize.release(frames)
      r
    }
    // Pre-compaction: the reader's sum + zero-skip already nets out.
    assert(scores(t) == scores(tRef))
    // Post-compaction: the stored ROWS equal the remaining-train model.
    CorpusWriter.compactLmModel(spark, t)
    assert(rows(t) == rows(tRef))
    assert(scores(t) == scores(tRef))
    drop(t, s"${t}_meta", s"${t}_srcs", tRef, s"${tRef}_meta")
  }

  test("LM: over-retirement (docs that never trained) raises at compaction") {
    val t = "graft_ret_lm_bad"
    drop(t, s"${t}_meta", s"${t}_srcs")
    CorpusWriter.writeLmModel(docs.filter(col("doc_id") % 4 === 0), "text",
      t, buckets = 8)
    CorpusWriter.retireFromLmModel(docs.filter(col("doc_id") % 4 === 1),
      "text", t, src = "retspec:bad")
    val e = intercept[Exception] { CorpusWriter.compactLmModel(spark, t) }
    assert(e.getMessage != null &&
      e.getMessage.contains("below zero") || e.getCause != null,
      s"unexpected: $e")
    drop(t, s"${t}_meta", s"${t}_srcs", s"${t}__compact")
  }

  private def dataFiles(t: String): Set[String] = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(t)
    val loc = spark.sessionState.catalog.getTableMetadata(ident).location
    val p = new org.apache.hadoop.fs.Path(loc.toString)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filterNot(_.getPath.getName.startsWith("_"))
      .map(s => s.getPath.getName + ":" + s.getModificationTime).toSet
  }

  test("gram index: retire(deleted) subtract landing ≡ write(remaining) — no remaining scan, no rewrite") {
    val t = "graft_ret_gram"
    val tRef = "graft_ret_gram_ref"
    drop(t, s"${t}_meta", s"${t}_srcs", tRef, s"${tRef}_meta")
    val all = docs.filter(col("doc_id") % 7 =!= 0)
    val deleted = all.filter(col("doc_id") % 2 === 1)
    val remaining = all.filter(col("doc_id") % 2 === 0)
    CorpusWriter.writeGramIndex(all, "text", n = 4, t, buckets = 8)
    val filesBefore = dataFiles(t)
    // The retire signature takes ONLY the deleted docs (r18): the
    // refcount layout needs no remaining-corpus re-tokenize.
    CorpusWriter.retireFromGramIndex(deleted, "text", t,
      src = "retspec:gram-del")
    // O(deleted) pin: the subtract landing only ADDED files — every
    // pre-existing data file survives by name AND mtime (no rewrite).
    assert(filesBefore.subsetOf(dataFiles(t)), "retire rewrote the index")
    CorpusWriter.writeGramIndex(remaining, "text", n = 4, tRef, buckets = 8)
    // Live fold equals the remaining-corpus index from the commit on...
    def live(tbl: String): Set[Long] =
      CorpusWriter.readGramIndex(spark, tbl).collect().map(_.getLong(0)).toSet
    assert(live(t) == live(tRef))
    // ...and compaction makes the stored ROWS equal too.
    CorpusWriter.compactGramIndex(spark, t)
    assert(rows(t) == rows(tRef))
    drop(t, s"${t}_meta", s"${t}_srcs", tRef, s"${tRef}_meta")
  }

  test("gram index: over-retirement (docs never landed) raises at read and compaction") {
    val t = "graft_ret_gram_bad"
    drop(t, s"${t}_meta", s"${t}_srcs")
    CorpusWriter.writeGramIndex(docs.filter(col("doc_id") % 4 === 0),
      "text", n = 4, t, buckets = 8)
    CorpusWriter.retireFromGramIndex(docs.filter(col("doc_id") % 4 === 1),
      "text", t, src = "retspec:gram-bad")
    val e = intercept[Exception] {
      CorpusWriter.readGramIndex(spark, t).collect()
    }
    assert((e.getMessage != null &&
      e.getMessage.contains("below zero")) || e.getCause != null,
      s"unexpected: $e")
    val e2 = intercept[Exception] { CorpusWriter.compactGramIndex(spark, t) }
    assert((e2.getMessage != null &&
      e2.getMessage.contains("below zero")) || e2.getCause != null,
      s"unexpected: $e2")
    drop(t, s"${t}_meta", s"${t}_srcs", s"${t}__compact")
  }

  test("winnow index: retire(deleted) subtract landing ≡ write(remaining)") {
    val t = "graft_ret_winnow"
    val tRef = "graft_ret_winnow_ref"
    drop(t, s"${t}_meta", s"${t}_srcs", tRef, s"${tRef}_meta")
    val deleted = docs.filter(col("doc_id") % 2 === 1)
    val remaining = docs.filter(col("doc_id") % 2 === 0)
    CorpusWriter.writeWinnowIndex(docs, "doc_id", "text", n = 4, w = 4, t,
      buckets = 8)
    val filesBefore = dataFiles(t)
    CorpusWriter.retireFromWinnowIndex(deleted, "doc_id", "text", t,
      src = "retspec:win-del")
    assert(filesBefore.subsetOf(dataFiles(t)), "retire rewrote the index")
    CorpusWriter.writeWinnowIndex(remaining, "doc_id", "text", n = 4, w = 4,
      tRef, buckets = 8)
    def live(tbl: String): Set[Long] =
      CorpusWriter.readWinnowIndex(spark, tbl).collect()
        .map(_.getLong(0)).toSet
    assert(live(t) == live(tRef))
    CorpusWriter.compactWinnowIndex(spark, t)
    assert(rows(t) == rows(tRef))
    drop(t, s"${t}_meta", s"${t}_srcs", tRef, s"${tRef}_meta")
  }

  test("srcApplied crash-window fallback: the src predicate reaches PushedFilters (footer pruning, r19 #6 / VERDICT r20 #4)") {
    val t = "graft_ret_srcprobe"
    drop(t, s"${t}_meta", s"${t}_srcs")
    CorpusWriter.writeGramIndex(docs.filter(col("doc_id") % 2 === 0),
      "text", n = 4, t, buckets = 8)
    CorpusWriter.appendToGramIndex(docs.filter(col("doc_id") % 2 === 1),
      "text", t, src = "probe:odds")
    // The fallback's exact filter shape must reach the parquet scan as
    // pushed predicates: each landing's files carry ONE constant src
    // (min = max = the tag) and initial-write files are all-null, so
    // footer stats prune every row group except a true replay's own —
    // the O(files) claim the r20 verdict asked to make testable.
    val tag = CorpusWriter.landTag("probe:odds")
    val probe = spark.table(t)
      .filter(col("src").isNotNull && col("src") === tag)
    val p = probe.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("IsNotNull(src)") &&
      p.contains(s"EqualTo(src,$tag)"), p)
    // And the fallback actually answers through it when `_srcs` is gone
    // (the crash window: landing committed, recordSrc not yet run).
    spark.sql(s"DROP TABLE IF EXISTS ${t}_srcs")
    assert(CorpusWriter.srcApplied(spark, t, tag))
    assert(!CorpusWriter.srcApplied(spark, t,
      CorpusWriter.landTag("probe:never")))
    drop(t, s"${t}_meta", s"${t}_srcs")
  }

  test("additive landings are idempotent per src: replayed subtract/append batches are skipped, even across compaction") {
    val t = "graft_ret_lm_replay"
    val tRef = "graft_ret_lm_replay_ref"
    drop(t, s"${t}_meta", s"${t}_srcs", tRef, s"${tRef}_meta")
    val a = docs.filter(col("doc_id") % 4 === 0)
    val b = docs.filter(col("doc_id") % 4 === 2)
    CorpusWriter.writeLmModel(a, "text", t, buckets = 8)
    CorpusWriter.appendToLmModel(b, "text", t, src = "land:0")
    // Replayed append (same src): skipped.
    CorpusWriter.appendToLmModel(b, "text", t, src = "land:0")
    CorpusWriter.retireFromLmModel(b, "text", t, src = "retire:0")
    // Replayed subtract (same src): skipped — the ADVICE r17 fix.
    CorpusWriter.retireFromLmModel(b, "text", t, src = "retire:0")
    CorpusWriter.writeLmModel(a, "text", tRef, buckets = 8)
    def scores(tbl: String): Seq[String] = {
      val (r, frames) = graft.ops.Materialize.collecting {
        TrigramModel.scoreFromModel(docs.filter(col("doc_id") % 2 === 1),
            "doc_id", "text", spark.table(tbl))
          .collect().map(_.mkString("|")).toSeq
      }
      graft.ops.Materialize.release(frames)
      r
    }
    assert(scores(t) == scores(tRef))
    // Compaction folds the tagged rows away but records their srcs —
    // a replay arriving after it must STILL be recognized and skipped.
    CorpusWriter.compactLmModel(spark, t)
    CorpusWriter.retireFromLmModel(b, "text", t, src = "retire:0")
    CorpusWriter.appendToLmModel(b, "text", t, src = "land:0")
    assert(scores(t) == scores(tRef))
    drop(t, s"${t}_meta", s"${t}_srcs", tRef, s"${tRef}_meta")
  }

  test("a retire reusing its batch's own landing tag still happens — markers are op-namespaced (r20)") {
    // ADVICE r19: append and retire used to share one src namespace per
    // table, so a takedown tagged with the batch's own landing tag was
    // read as a replay and silently skipped. land:/retire: prefixes
    // make the two operations unshadowable.
    val t = "graft_ret_lm_samesrc"
    val tRef = "graft_ret_lm_samesrc_ref"
    drop(t, s"${t}_meta", s"${t}_srcs", tRef, s"${tRef}_meta")
    val a = docs.filter(col("doc_id") % 4 === 0)
    val b = docs.filter(col("doc_id") % 4 === 2)
    CorpusWriter.writeLmModel(a, "text", t, buckets = 8)
    CorpusWriter.appendToLmModel(b, "text", t, src = "batch7")
    // The natural tag reuse: the operator deletes the batch it just
    // landed, under the batch's own name.
    CorpusWriter.retireFromLmModel(b, "text", t, src = "batch7")
    CorpusWriter.writeLmModel(a, "text", tRef, buckets = 8)
    def scores(tbl: String): Seq[String] = {
      val (r, frames) = graft.ops.Materialize.collecting {
        TrigramModel.scoreFromModel(docs.filter(col("doc_id") % 2 === 1),
            "doc_id", "text", spark.table(tbl))
          .collect().map(_.mkString("|")).toSeq
      }
      graft.ops.Materialize.release(frames)
      r
    }
    assert(scores(t) == scores(tRef),
      "same-tag retire was silently skipped as an append replay")
    // And each op's OWN replay protection still holds under reuse.
    CorpusWriter.retireFromLmModel(b, "text", t, src = "batch7")
    CorpusWriter.appendToLmModel(b, "text", t, src = "batch7")
    CorpusWriter.retireFromLmModel(b, "text", t, src = "batch7")
    assert(scores(t) == scores(tRef))
    drop(t, s"${t}_meta", s"${t}_srcs", tRef, s"${tRef}_meta")
  }

  test("gram/winnow batch appends: same-src double-append leaves the fold unchanged (the r19 seatbelt)") {
    val tg = "graft_ret_gram_dup"
    val tw = "graft_ret_win_dup"
    drop(tg, s"${tg}_meta", s"${tg}_srcs", tw, s"${tw}_meta", s"${tw}_srcs")
    val a = docs.filter(col("doc_id") % 4 === 0)
    val b = docs.filter(col("doc_id") % 4 === 2)
    CorpusWriter.writeGramIndex(a, "text", n = 4, tg, buckets = 8)
    CorpusWriter.appendToGramIndex(b, "text", tg, src = "dup:land")
    def gfold(): Map[Long, Long] =
      spark.table(tg).groupBy("gram_fp").agg(sum("c").as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = gfold()
    // A batch re-landed under its own tag (retry, operator error) is a
    // skipped no-op — pre-r19 this silently inflated refcounts, leaving
    // a doc's fps live after its retirement.
    CorpusWriter.appendToGramIndex(b, "text", tg, src = "dup:land")
    assert(gfold() === before)
    // And the skip survives a compaction folding the tags away.
    CorpusWriter.compactGramIndex(spark, tg)
    CorpusWriter.appendToGramIndex(b, "text", tg, src = "dup:land")
    assert(gfold() === before)

    CorpusWriter.writeWinnowIndex(a, "doc_id", "text", n = 4, w = 4, tw,
      buckets = 8)
    CorpusWriter.appendToWinnowIndex(b, "doc_id", "text", tw,
      src = "dup:wland")
    def wfold(): Map[Long, Long] =
      spark.table(tw).groupBy("fp").agg(sum("c").as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wBefore = wfold()
    CorpusWriter.appendToWinnowIndex(b, "doc_id", "text", tw,
      src = "dup:wland")
    assert(wfold() === wBefore)
    drop(tg, s"${tg}_meta", s"${tg}_srcs", tw, s"${tw}_meta", s"${tw}_srcs")
  }

  test("stratified index: retire(ids) — member/payload rows ≡ write(remaining); probe bit-equal despite the _levels superset") {
    val t = "graft_ret_strat"
    val tRef = "graft_ret_strat_ref"
    Seq(t, tRef).foreach(x => Seq("_mem", "_payload", "_levels", "_meta")
      .foreach(sfx => spark.sql(s"DROP TABLE IF EXISTS $x$sfx")))
    val inc = col("doc_id") % 5 === 0
    val all = docs.filter(!inc)
    val deleted = all.filter(col("doc_id") % 2 === 1)
    val remaining = all.filter(col("doc_id") % 2 === 0)
    CorpusWriter.writeStratifiedIndex(all, "doc_id", "text", t, buckets = 8)
    CorpusWriter.retireFromStratifiedIndex(spark, t, deleted, "doc_id")
    CorpusWriter.writeStratifiedIndex(remaining, "doc_id", "text", tRef,
      buckets = 8)
    assert(rows(s"${t}_mem") == rows(s"${tRef}_mem"))
    assert(rows(s"${t}_payload") == rows(s"${tRef}_payload"))
    def probe(tbl: String): Seq[String] = {
      val (r, frames) = graft.ops.Materialize.collecting {
        MinHashDedup.incrementalContainmentPairs(spark, tbl,
            docs.filter(inc), "doc_id", "text", 0.6,
            MinHashDedup.StrataSpan)
          .collect().map(_.mkString("|")).toSeq
      }
      graft.ops.Materialize.release(frames)
      r
    }
    assert(probe(t) == probe(tRef))
    Seq(t, tRef).foreach(x => Seq("_mem", "_payload", "_levels", "_meta")
      .foreach(sfx => spark.sql(s"DROP TABLE IF EXISTS $x$sfx")))
  }

  test("admission index: retire(ids) ≡ write(remaining)") {
    val t = "graft_ret_adm"
    val tRef = "graft_ret_adm_ref"
    drop(t, tRef)
    CorpusWriter.writeAdmissionIndex(docs, "doc_id", "text", t, buckets = 8)
    CorpusWriter.retireFromAdmissionIndex(spark, t,
      docs.filter(col("doc_id") % 2 === 1), "doc_id")
    CorpusWriter.writeAdmissionIndex(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", tRef, buckets = 8)
    assert(rows(t) == rows(tRef))
    drop(t, tRef)
  }
}
