package graft.tools

import org.apache.spark.sql.functions._
import graft.BenchCore
import graft.fixtures.Fixtures
import graft.operators.TextAnalysis

/** One-off stage decomposition of packTokens at 8M (builder tooling). */
object TokenProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 8000000L
    val spark = BenchCore.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val out = body
      println(f"[probe] $label: $out in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      out
    }

    val docs = Fixtures.images(spark, n).select(
        xxhash64(col("image_id")).as("doc_id"),
        col("caption").as("text"))
      .localCheckpoint()

    // stage A: tokenize + count only (no exchange)
    t("A tokenize+count (map only)") {
      docs.select(col("doc_id"),
        concat(array_remove(split(col("text"), "\\s+"), ""),
          array(lit(TextAnalysis.EosToken))).as("t"))
        .select(sum(size(col("t")))).collect()(0).getLong(0)
    }

    // stage B: manifest (offsets over narrow frame, wordpiece kernel)
    t("B packSequences manifest") {
      TextAnalysis.packSequences(docs, col("doc_id"), col("text"),
        seqLen = 2048, salt = "p").count()
    }

    // stage C: full materialization, 3 timed runs in one JVM; GC between
    // runs so ContextCleaner can release the previous run's localCheckpoint
    // blocks (tests the accumulated-checkpoint-pressure hypothesis)
    (1 to 3).foreach { i =>
      System.gc(); Thread.sleep(2000)
      t(s"C packTokens run$i") {
        TextAnalysis.packTokens(docs, col("doc_id"), col("text"),
          seqLen = 2048, salt = "p").count()
      }
    }

    spark.stop()
  }
}
