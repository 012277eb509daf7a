package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{TextHash, ZGrid}

/** SQL surface: every registered graft function callable from spark.sql,
  * agreeing with the shared kernels / Column API.
  */
class GraftSqlSpec extends AnyFunSuite {
  lazy val spark = {
    val s = graft.SparkTestSession.spark
    GraftSql.registerAll(s)
    s
  }

  test("scalar kernels via SQL match the shared kernels") {
    val r = spark.sql(
      """SELECT char_hash('abc') AS ch, char_hash64('abc') AS ch64,
        |simhash64(array('a','b','a')) AS sh,
        |zcell(1000000L, 2000000L, 12) AS zc,
        |dot_q(array(2L, 3L), array(5L, 7L)) AS dq""".stripMargin).collect().head
    assert(r.getLong(0) === TextHash.charHash("abc"))
    assert(r.getLong(1) === TextHash.charHash64("abc"))
    assert(r.getLong(2) === TextHash.simhash64(
      Array("a", "b", "a").map(TextHash.charHash),
      Array("a", "b", "a").map(TextHash.charHash2)))
    assert(r.getLong(3) === ZGrid.cellAt(12, 1000000L, 2000000L))
    assert(r.getLong(4) === 2L * 5 + 3L * 7)
  }

  test("normalize_text and repetition_stats via SQL match the kernels") {
    val r = spark.sql(
      """SELECT normalize_text(' A!!b  C ') AS nt,
        |repetition_stats(array('a','b','a','b','a','b','c'), 2) AS rs""".stripMargin)
      .collect().head
    assert(r.getString(0) === "ab c")
    assert(r.getSeq[Long](1) === Seq(6L, 3L, 3L))
  }

  test("quality_stats and wordpiece_counts via SQL match the kernels") {
    val r = spark.sql(
      """SELECT quality_stats('the cat a1b!') AS qs,
        |wordpiece_counts('a1b! x') AS wc""".stripMargin).collect().head
    // 12 chars; tokens the/cat/a1b!; 8 letters; 1 stopword; tok_chars 3+3+4
    assert(r.getSeq[Long](0) === Seq(12L, 3L, 8L, 1L, 10L))
    // a1b! x -> ws tokens 2; wordpieces: a,1,b,! ,x = 5
    assert(r.getSeq[Long](1) === Seq(2L, 5L))
  }

  test("SQL zcell over a table equals the Column API") {
    import spark.implicits._
    Seq((1L, -20000000L, 10000000L), (2L, 5000000L, -5000000L))
      .toDF("id", "lonm", "latm").createOrReplaceTempView("pts")
    val viaSql = spark.sql("SELECT id, zcell(lonm, latm, 12) AS c FROM pts ORDER BY id")
      .collect().map(_.getLong(1)).toSeq
    val expect = spark.table("pts").orderBy("id")
      .select(GraftFunctions.zcell(col("lonm"), col("latm"), 12).as("c"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql === expect)
  }

  test("kll_quantile works as a SQL aggregate") {
    spark.range(1, 10001).selectExpr("id % 4 AS g", "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("kq")
    val rows = spark.sql(
      "SELECT g, kll_quantile(v, 0.5) AS med FROM kq GROUP BY g ORDER BY g")
      .collect()
    assert(rows.length === 4)
    // median of each residue class is ~5000; sketch rank error <= 2%
    rows.foreach(r => assert(math.abs(r.getDouble(1) - 5000.0) < 400.0, r.toString))
  }

  test("sketch aggregates accept non-double / non-string SQL columns") {
    // round-2 advice: the SQL builders passed the child uncast, so an INT
    // column hit asInstanceOf[Double] / [UTF8String] with an opaque
    // ClassCastException; the builders now Cast like the Scala API does
    spark.range(1, 1001).selectExpr("id % 3 AS g", "CAST(id AS INT) AS vi", "id AS vl")
      .createOrReplaceTempView("sqlcast")
    val med = spark.sql(
      "SELECT g, kll_quantile(vi, 0.5) AS med FROM sqlcast GROUP BY g ORDER BY g").collect()
    assert(med.length === 3)
    med.foreach(r => assert(math.abs(r.getDouble(1) - 500.0) < 100.0, r.toString))
    val hh = spark.sql(
      "SELECT heavy_hitters(vl % 5, 10, 3) AS hh FROM sqlcast").collect().head
    assert(hh.getSeq[org.apache.spark.sql.Row](0).length === 3)
  }

  test("bloom_agg + bloom_contains via SQL: no false negatives, scalar probe works") {
    spark.range(0, 500).selectExpr("id AS k").createOrReplaceTempView("bloomsql")
    // build in SQL, probe in SQL — members all probe true (no false negatives)
    val misses = spark.sql(
      """WITH f AS (SELECT bloom_agg(k, 8192, 7) AS bf FROM bloomsql)
        |SELECT count(*) AS miss FROM bloomsql, f
        |WHERE NOT bloom_contains(f.bf, bloomsql.k)""".stripMargin).collect().head.getLong(0)
    assert(misses === 0L)
    // grouped form (the bucketed deployment shape) returns one filter per group
    val grouped = spark.sql(
      "SELECT k % 4 AS b, bloom_agg(k, 2048) AS bf FROM bloomsql GROUP BY 1").collect()
    assert(grouped.length === 4)
    assert(grouped.forall(_.getAs[Array[Byte]](1).length === 8 + 2048 / 8))
  }

  test("vec_sum works as a SQL aggregate incl. grouped form") {
    spark.range(0, 100).selectExpr("id % 2 AS g", "array(id, 1L) AS v")
      .createOrReplaceTempView("vecsql")
    val got = spark.sql("SELECT g, vec_sum(v) AS s FROM vecsql GROUP BY 1 ORDER BY g")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(0L) === Seq((0L until 100L by 2).sum, 50L))
    assert(got(1L) === Seq((1L until 100L by 2).sum, 50L))
    // array<int> implicit-casts to array<bigint> at analysis (ImplicitCastInputTypes)
    val cast = spark.sql("SELECT vec_sum(array(CAST(1 AS INT), CAST(2 AS INT))) AS s")
      .collect().head.getSeq[Long](0)
    assert(cast === Seq(1L, 2L))
    // a non-array argument fails at ANALYSIS with a type error, not a
    // runtime unboxing crash inside the aggregate buffer
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_sum('oops')").collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"))
  }

  test("non-literal plan-time argument fails with a clear message") {
    import spark.implicits._
    Seq((1L, 4)).toDF("lonm", "lvl").createOrReplaceTempView("badargs")
    val e = intercept[Exception] {
      spark.sql("SELECT zcell(lonm, lonm, lvl) FROM badargs").collect()
    }
    assert(e.getMessage.contains("literal") || e.getMessage.toLowerCase.contains("constant"))
  }
}
