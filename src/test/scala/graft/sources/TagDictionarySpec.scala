package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A4 broadcast dictionary: deterministic ids, encode/decode roundtrip,
  * broadcast plan shape, aggregate-on-ints parity with direct string agg.
  */
class TagDictionarySpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "residential"), (2L, "primary"), (3L, "residential"), (4L, "service"),
    (5L, "primary"), (6L, "residential"), (7L, null.asInstanceOf[String])
  ).toDF("id", "highway")

  test("ids are dense, 0-based, sorted by value, nulls excluded") {
    val d = TagDictionary.build(df, col("highway"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(d.toSeq === Seq((0L, "primary"), (1L, "residential"), (2L, "service")))
  }

  test("encode/decode roundtrip preserves values; unknown → null") {
    val dict = TagDictionary.build(df, col("highway"))
    val enc = TagDictionary.encode(df, col("highway"), dict)
    val back = TagDictionary.decode(enc.drop("highway"), col("tag_id"), dict, "highway2")
    val got = back.select("id", "highway2").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val exp = df.collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got === exp) // null highway stays null through encode+decode
  }

  test("encode is a broadcast hash join (big side never shuffles strings)") {
    val dict = TagDictionary.build(df, col("highway"))
    val plan = TagDictionary.encode(df, col("highway"), dict)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1000))
    assert(!plan.contains("SortMergeJoin"), plan.take(1000))
  }

  test("aggregate on int ids + decode == direct string aggregate") {
    val dict = TagDictionary.build(df, col("highway"))
    val viaIds = TagDictionary.decode(
        TagDictionary.encode(df, col("highway"), dict)
          .where(col("tag_id").isNotNull)
          .groupBy("tag_id").agg(count(lit(1)).as("n")),
        col("tag_id"), dict)
      .select("tag", "n").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val direct = df.where(col("highway").isNotNull).groupBy("highway").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaIds === direct)
  }
}
