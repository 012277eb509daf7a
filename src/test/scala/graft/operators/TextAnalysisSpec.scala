package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.TextHash

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("charHash kernel matches the documented DuckDB formula on 'abc'") {
    // list_reduce(list_prepend(7,[97,98,99]),(acc,c)->(acc*31+c)%1000000007) = 304891
    assert(TextHash.charHash("abc") === 304891L)
    assert(TextHash.charHash("") === 7L)
  }

  test("langId: marker-dominant texts classified, ties deterministic") {
    val df = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "der hund und die katze ist da und der"),
      (3L, "le chat et la maison les des le"),
      (4L, "xyzzy plugh")).toDF("doc_id", "text")
    val got = TextAnalysis.langId(df, col("doc_id"), col("text"))
      .select("doc_id", "pred_lang").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "en")
    assert(got(2L) === "de")
    assert(got(3L) === "fr")
    assert(got(4L) === "de") // all-zero tie → first language in sorted order
  }

  test("quality metrics: hand-computed doc") {
    val df = Seq((1L, "the quick brown fox jumps over a lazy dog again today ok")).toDF("doc_id", "text")
    val r = TextAnalysis.quality(df, col("doc_id"), col("text")).collect().head
    val m = r.getValuesMap[Any](r.schema.fieldNames.toIndexedSeq)
    assert(m("n_tokens") === 12)
    assert(m("n_stop") === 2) // the, a
    assert(m("keep") === true)
    val meanLen = m("mean_token_len").asInstanceOf[Double]
    assert(math.abs(meanLen - 45.0 / 12) < 1e-12) // Σ token lengths = 45
  }

  test("tokenCounts: wordpiece regex counts letter runs, digit runs, punct") {
    val df = Seq((1L, "abc de-f 12 x9!")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(df, col("doc_id"), col("text")).collect().head
    assert(r.getInt(1) === 4) // ws tokens
    // pieces: abc | de | - | f | 12 | x | 9 | !
    assert(r.getInt(2) === 8)
  }

  test("fingerprints: min-shingle matches in-JVM kernel") {
    val text = "a b c d e f"
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val r = TextAnalysis.fingerprints(df, col("doc_id"), col("text")).collect().head
    val grams = text.split(" ").sliding(3).map(_.mkString(" ")).toSeq
    assert(r.getLong(1) === TextHash.charHash(text))
    assert(r.getLong(2) === grams.map(TextHash.charHash).min)
  }
}
