package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.SpaceSaving

/** SpaceSaving heavy hitters: frequency guarantees on zipf data, merge
  * path, distributed aggregate + vocabSketch plumbing.
  */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark

  // zipf-ish corpus: token i has weight ~ 1/(i+1)
  private def zipfTokens(n: Int, vocab: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val weights = (0 until vocab).map(i => 1.0 / (i + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    (0 until n).map { _ =>
      val x = rnd.nextDouble() * total
      val i = cum.indexWhere(_ >= x)
      s"tok$i"
    }
  }

  test("SpaceSaving guarantee: freq > n/k items present, est in [true, true+n/k]") {
    val toks = zipfTokens(50000, 5000, 31)
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val s = new SpaceSaving(100)
    toks.foreach(s.insert)
    assert(s.n === toks.size)
    val bound = toks.size / 100
    val est = s.topK(100).map(t => t._1 -> (t._2, t._3)).toMap
    for ((tok, f) <- exact if f > bound) {
      assert(est.contains(tok), s"$tok freq=$f must be present (bound=$bound)")
      val (e, err) = est(tok)
      assert(e >= f && e <= f + bound, s"$tok est=$e true=$f")
      assert(e - err <= f, s"reported error must cover the overestimate")
    }
  }

  test("16-way merge keeps the guarantee (bounds sum)") {
    val toks = zipfTokens(80000, 8000, 32)
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val parts = toks.grouped(5000).map { c =>
      val s = new SpaceSaving(200); c.foreach(s.insert); s
    }.toSeq
    val merged = parts.reduce { (a, b) => a.merge(b); a }
    assert(merged.n === toks.size)
    // min-count-additive merge: overestimate ≤ Σ per-part mins ≤ n/k overall
    val bound = toks.size / 200
    val est = merged.topK(200).map(t => t._1 -> t._2).toMap
    for ((tok, f) <- exact if f > bound) {
      assert(est.contains(tok), s"$tok freq=$f bound=$bound")
      assert(est(tok) >= f && est(tok) <= f + bound, s"$tok est=${est(tok)} true=$f")
    }
  }

  test("merge never underestimates items tracked on only one side") {
    // round-2 advice counterexample, deterministic: "solo" has 5 true
    // occurrences ABSORBED into summary A's evictions (it was tracked, then
    // evicted — its mass lives inside A's surviving counters) plus 7 tracked
    // in B. A plain union-sum-truncate merge reports est(solo) = 7 < 12 —
    // an UNDERestimate. The min-count-additive merge must stay one-sided.
    val a = new SpaceSaving(2)
    for (_ <- 0 until 10) { a.insert("a"); a.insert("b") }
    for (_ <- 0 until 5) a.insert("solo")  // evicts "a", solo est 15 err 10
    a.insert("d")                           // evicts "b"
    for (_ <- 0 until 16) a.insert("e")     // evicts "d"
    for (_ <- 0 until 16) a.insert("f")     // evicts "solo" — now absent from A
    assert(!a.topK(2).exists(_._1 == "solo"))
    val aMin = a.topK(2).map(_._2).min
    assert(aMin >= 5L, "absent item's true count must be <= A's min counter")
    val b = new SpaceSaving(2)
    for (_ <- 0 until 7) b.insert("solo")
    val trueSolo = 12L // 5 absorbed in A + 7 in B
    a.merge(b)
    val sm = a.topK(2).map(t => t._1 -> (t._2, t._3)).toMap
    assert(sm.contains("solo"), "heaviest merged item must survive truncation")
    val (e, err) = sm("solo")
    assert(e >= trueSolo, s"est=$e must not underestimate true=$trueSolo")
    assert(e - err <= trueSolo, s"err=$err must cover the overestimate")
  }

  test("serialize roundtrip preserves counters") {
    val s = new SpaceSaving(50)
    zipfTokens(5000, 500, 33).foreach(s.insert)
    val r = SpaceSaving.deserialize(s.serialize())
    assert(r.n === s.n)
    assert(r.topK(50).toSeq === s.topK(50).toSeq)
  }

  test("vocabSketch: top tokens per group match exact top-k on fixture docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sk = graft.operators.TextAnalysis.vocabSketch(docs, col("text"), col("lang"),
        k = 500, m = 5)
      .collect().groupBy(_.getString(0))
    // exact top-5 per lang (small corpus ⇒ sketch must agree on the head)
    val exact = docs.select(col("lang"), explode(
        graft.operators.Dedup.tokens(lower(col("text")))).as("tok"))
      .groupBy("lang", "tok").count()
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy(col("count").desc, col("tok"))))
      .where(col("rank") <= 5)
      .collect().groupBy(_.getString(0))
    for ((lang, rows) <- exact) {
      val exTop = rows.sortBy(_.getInt(3)).map(r => r.getString(1)).toSeq
      val skTop = sk(lang).sortBy(_.getLong(1)).map(_.getString(2)).toSeq
      assert(skTop === exTop, s"lang=$lang")
    }
  }
}
