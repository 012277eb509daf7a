package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md O6: co-located joins via bucketing — both sides bucketed on
  * the join key join WITHOUT an Exchange (the storage-partitioned-join
  * layout an Iceberg deployment would use; bucketed Hive-style tables are
  * the sandbox stand-in).
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("join of two tables bucketed on the key has no shuffle exchange") {
    val a = (0L until 20000L).map(i => (i % 997, i)).toDF("cell", "va")
    val b = (0L until 5000L).map(i => (i % 997, i * 7)).toDF("cell", "vb")
    spark.sql("DROP TABLE IF EXISTS bj_a"); spark.sql("DROP TABLE IF EXISTS bj_b")
    // a previous crashed run can leave the managed location behind
    for (t <- Seq("bj_a", "bj_b")) {
      val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), t)
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    a.write.mode("overwrite").bucketBy(8, "cell").sortBy("cell").saveAsTable("bj_a")
    b.write.mode("overwrite").bucketBy(8, "cell").sortBy("cell").saveAsTable("bj_b")
    // force the shuffle-join planner path — the point is that bucketing
    // replaces the shuffle, not that broadcast avoids it
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("bj_a").join(spark.table("bj_b"), "cell")
      .groupBy("cell").agg(count(lit(1)).as("n"))
    val plan = try joined.queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // the join itself must not shuffle either side (only the final agg may)
    val joinPart = plan.split("HashAggregate").last
    assert(joinPart.contains("SortMergeJoin") || joinPart.contains("ShuffledHashJoin"),
      plan.take(800))
    assert(!joinPart.contains("Exchange"), s"bucketed join still shuffles:\n${plan.take(1500)}")
    // and produces correct results
    val direct = a.join(b, "cell").groupBy("cell").agg(count(lit(1)).as("n"))
    assert(joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      direct.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }
}
