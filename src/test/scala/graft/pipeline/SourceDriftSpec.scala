package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Source drift: hand-computed toy distances, the zero-distance twin
  * case, and the fixture replayed against a local reference. */
class SourceDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Local reference: same tokenize, top-v gate, ppm DIV, L1. */
  private def refDrift(rows: Seq[(String, String)], v: Int)
      : Map[(String, String), Long] = {
    val toks = rows.flatMap { case (src, text) =>
      text.toLowerCase.split("\\s+").filter(_.nonEmpty).map(src -> _)
    }
    val st = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val vocab = st.groupBy(_._1._2).view.mapValues(_.values.sum).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(v).map(_._1)
    val ns = toks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val srcs = ns.keys.toSeq.sorted
    val f = (for (s <- srcs; t <- vocab)
      yield (s, t) -> st.getOrElse((s, t), 0L) * 1000000L / ns(s)).toMap
    (for {
      i <- srcs.indices; j <- (i + 1) until srcs.length
      a = srcs(i); b = srcs(j)
    } yield (a, b) -> vocab.map(t => math.abs(f((a, t)) - f((b, t)))).sum)
      .toMap
  }

  private def run(rows: Seq[(String, String)], v: Int)
      : Map[(String, String), Long] = {
    import spark.implicits._
    val docs = rows.zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }
      .toDF("doc_id", "source", "text")
    SourceDrift.termDrift(docs, "source", "text", v).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
  }

  test("hand toy: disjoint vocabularies are maximally distant") {
    // s1 is all 'aa', s2 all 'bb': each ppm vector is 10^6 on its own
    // term and 0 on the other's → L1 = 2·10^6.
    val rows = Seq(("s1", "aa aa aa"), ("s2", "bb bb"))
    assert(run(rows, 4) === Map(("s1", "s2") -> 2000000L))
  }

  test("identical distributions have zero distance") {
    val rows = Seq(("s1", "x y x"), ("s2", "x y x x y x"))
    assert(run(rows, 8) === Map(("s1", "s2") -> 0L))
  }

  test("three sources: all pairs present, local reference agrees") {
    val rows = Seq(("a", "p q r p"), ("b", "p p q"), ("c", "r r q z"))
    val v = 3
    assert(run(rows, v) === refDrift(rows, v))
  }

  test("fixture corpus matches the local reference (v=64)") {
    val docs = graft.core.Tables.load(spark, TestSpark.Sf, "documents")
    val rows = docs.select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val got = SourceDrift.termDrift(docs, "source", "text", 64).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === refDrift(rows, 64))
    // L1 over ppm distributions is bounded by 2·10^6 (truncation only
    // shrinks it).
    assert(got.values.forall(d => d >= 0L && d <= 2000000L))
  }
}
