package graft.tools

import org.apache.spark.sql.functions._
import graft.BenchCore
import graft.operators.Dedup
import graft.functions.TextFunctions._

/** Ad-hoc stage profiler for the near-dup pipeline at a given sfDir. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = BenchCore.session("32")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def t(name: String)(body: => Any): Unit = {
      val cold = BenchCore.timed(body)
      val warm = BenchCore.timed(body)
      println(f"$name%-30s cold $cold%.3f s   warm $warm%.3f s")
    }

    val toks = docs.select(col("doc_id"), Dedup.tokens(col("text")).as("t"))
    t("tokenize+count") { toks.agg(sum(size(col("t")))).collect() }
    val sh = docs.select(col("doc_id"),
        shingleHashes(Dedup.tokens(col("text")), 3).as("gha"))
      .where(size(col("gha")) > 0)
      .select(col("doc_id"), col("gha"), size(col("gha")).as("sz"))
    t("shingle+hash+sort") { sh.agg(sum(col("sz"))).collect() }
    val ex = sh.select(col("doc_id"), explode(col("gha")).as("gh"))
    t("explode") { ex.agg(count(lit(1))).collect() }
    val dfreq = ex.groupBy("gh").agg(count(lit(1)).as("df"))
    t("dfreq") { println("  distinct shingles: " + dfreq.count()) }
    t("dfreq stats") {
      dfreq.agg(max("df"), expr("percentile(df, 0.99)"), avg("df")).show()
    }
    val tNum = 5000
    val prefix = ex.join(dfreq, "gh")
      .groupBy("doc_id").agg(array_sort(collect_list(struct(col("df"), col("gh")))).as("o"),
        count(lit(1)).as("sz"))
      .withColumn("alpha", floor((col("sz") * tNum + lit(10000 - 1)) / lit(10000)).cast("long"))
      .withColumn("pref", slice(col("o"), lit(1), (col("sz") - col("alpha") + 1).cast("int")))
      .select(col("doc_id"), col("sz"), explode(col("pref")).as("p"))
      .select(col("doc_id"), col("sz"), col("p.gh"))
    t("prefix build") { println("  prefix rows: " + prefix.count()) }
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id") &&
        col("a.sz") * tNum <= col("b.sz") * 10000 &&
        col("b.sz") * tNum <= col("a.sz") * 10000)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b")).distinct()
    t("candidates") { println("  candidate pairs: " + cand.count()) }
    t("full q44") {
      println("  pairs: " + Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"), 3, 0.5).count())
    }
    t("full q45") {
      println("  pairs: " + Dedup.minhashLshPairs(docs, col("doc_id"), col("text"), 3, 0.5).count())
    }
    spark.stop()
  }
}
