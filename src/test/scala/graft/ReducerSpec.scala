package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.api.Reducer

class ReducerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val df = Seq(
    ("a", 1.0, 2.0), ("a", 3.0, 1.0), ("b", 10.0, 4.0), ("b", 20.0, 0.0), ("a", 1.0, 1.0)
  ).toDF("k", "x", "w")

  test("count/sum/average/weightedAverage golden values") {
    val r = Reducer.on(df).aggregateBy("k", $"k")
    assert(r.count("c").collect().map(x => (x.getString(0), x.getLong(1))).toSet ==
      Set(("a", 3L), ("b", 2L)))
    assert(r.sum($"x", "s").collect().map(x => (x.getString(0), x.getDouble(1))).toSet ==
      Set(("a", 5.0), ("b", 30.0)))
    assert(r.average($"x", "m").collect().map(x => (x.getString(0), x.getDouble(1))).toSet ==
      Set(("a", 5.0 / 3), ("b", 15.0)))
    // wavg(a) = (1*2 + 3*1 + 1*1)/(2+1+1) = 6/4; b: (10*4 + 0)/4 = 10
    assert(r.weightedAverage($"x", $"w", "wa").collect()
      .map(x => (x.getString(0), x.getDouble(1))).toSet == Set(("a", 1.5), ("b", 10.0)))
  }

  test("uniq and countUniq") {
    val r = Reducer.on(df).aggregateBy("k", $"k")
    assert(r.uniq($"x", "v").collect().map(x => (x.getString(0), x.getDouble(1))).toSet ==
      Set(("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 20.0)))
    assert(r.countUniq($"x", "n").collect().map(x => (x.getString(0), x.getLong(1))).toSet ==
      Set(("a", 2L), ("b", 2L)))
  }

  test("zerofill inserts identity rows for missing keys") {
    val r = Reducer.on(df.where($"k" === "a")).aggregateBy("k", $"k")
    val counted = r.count("c")
    val domain = Seq("a", "b", "c").toDF("k")
    val filled = r.zerofill(counted, domain, Map("c" -> lit(0L)))
      .collect().map(x => (x.getString(0), x.getLong(1))).toSet
    assert(filled == Set(("a", 3L), ("b", 0L), ("c", 0L)))
  }

  test("nested index = multi-column groupBy (D12)") {
    val r = Reducer.on(df).aggregateBy("k", $"k").aggregateBy("w", $"w")
    assert(r.count("c").collect().length == 5 - 1) // (a,1.0) appears twice
  }

  test("typed Aggregator fold (D8 reduce contract)") {
    import org.apache.spark.sql.{Encoder, Encoders, Row}
    val agg = new org.apache.spark.sql.expressions.Aggregator[Row, (Double, Long), Double] {
      def zero = (0.0, 0L)
      def reduce(b: (Double, Long), r: Row) = (b._1 + r.getAs[Double]("x"), b._2 + 1)
      def merge(a: (Double, Long), b: (Double, Long)) = (a._1 + b._1, a._2 + b._2)
      def finish(b: (Double, Long)) = if (b._2 == 0) 0.0 else b._1 / b._2
      def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
    val got = Reducer.on(df).aggregateBy("k", $"k").reduce(agg, "m")
      .collect().map(x => (x.getString(0), x.getDouble(1))).toSet
    assert(got == Set(("a", 5.0 / 3), ("b", 15.0)))
  }
}
