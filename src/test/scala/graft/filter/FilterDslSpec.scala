package graft.filter

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class FilterDslSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  lazy val df = Seq(
    ("R", "F", 10.0, Some("x")), ("R", "O", 25.0, None),
    ("N", "F", 40.0, Some("y")), ("A", "O", 5.0, Some("x"))
  ).toDF("flag", "status", "qty", "tag")

  def run(f: String): Set[Double] =
    df.where(FilterDsl.toColumn(f, df.schema)).select("qty").collect().map(_.getDouble(0)).toSet

  test("equality / inequality / wildcard") {
    assert(run("flag=R") == Set(10.0, 25.0))
    assert(run("flag!=R") == Set(40.0, 5.0))
    assert(run("tag=*") == Set(10.0, 40.0, 5.0))
    assert(run("tag!=*") == Set(25.0))
    assert(run("tag!=x") == Set(25.0, 40.0)) // null-safe: absent counts as != x
  }

  test("in / range / id-colon forms") {
    assert(run("flag in (R, N)") == Set(10.0, 25.0, 40.0))
    assert(run("qty:(10..30)") == Set(10.0, 25.0))
    assert(run("qty:(..10)") == Set(10.0, 5.0))
    assert(run("qty:(25..)") == Set(25.0, 40.0))
    assert(run("flag:R") == Set(10.0, 25.0))
  }

  test("boolean algebra with parens and not") {
    assert(run("flag=R and status=F") == Set(10.0))
    assert(run("flag=R or flag=N") == Set(10.0, 25.0, 40.0))
    assert(run("not (flag=R or flag=N)") == Set(5.0))
    assert(run("not flag=R and status=O") == Set(5.0))
    assert(run("(flag=R or flag=N) and qty:(20..50)") == Set(25.0, 40.0))
  }

  test("quoted values") {
    val d2 = Seq(("hello world", 1.0), ("x", 2.0)).toDF("name", "v")
    val got = d2.where(FilterDsl.toColumn("name=\"hello world\"", d2.schema))
      .select("v").collect().map(_.getDouble(0)).toSet
    assert(got == Set(1.0))
  }

  test("normalize: negation pushed, DNF distribution, semantics preserved") {
    val e = FilterDsl.parse("not (flag=R or (status=F and not tag=*))")
    val n = FilterDsl.normalize(e)
    // semantics preserved
    val a = df.where(FilterDsl.compile(e, df.schema)).select("qty").collect().map(_.getDouble(0)).toSet
    val b = df.where(FilterDsl.compile(n, df.schema)).select("qty").collect().map(_.getDouble(0)).toSet
    assert(a == b)
    // no FNot above leaves, no FAnd above FOr
    def ok(x: FExpr): Boolean = x match {
      case FNot(FIn(_, _)) | FNot(FRange(_, _, _)) => true
      case FNot(_) => false
      case FAnd(p, q) => !p.isInstanceOf[FOr] && !q.isInstanceOf[FOr] && ok(p) && ok(q)
      case FOr(p, q) => ok(p) && ok(q)
      case _ => true
    }
    assert(ok(n), s"not in DNF: $n")
  }

  test("pushdown: compiled filter reaches the parquet scan") {
    val tmp = java.nio.file.Files.createTempDirectory("dsl").toString
    df.write.mode("overwrite").parquet(tmp)
    val scan = spark.read.parquet(tmp).where(FilterDsl.toColumn("flag=R and qty:(10..30)", df.schema))
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(flag), IsNotNull(qty), EqualTo(flag,R)"),
      s"filters not pushed:\n$plan")
  }

  test("virtual-key bindings: geometry/metric predicates on computed columns") {
    import org.apache.spark.sql.types._
    // 'area' is VIRTUAL — bound to qty*2, not a schema column; 'geometry'
    // bound to the flag column (upstream geometry:polygon shape)
    val bindings = Map(
      "area" -> (col("qty") * 2, DoubleType: DataType),
      "geometry" -> (lower(col("flag")), StringType: DataType))
    def runB(f: String): Set[Double] =
      df.where(FilterDsl.toColumn(f, df.schema, bindings))
        .select("qty").collect().map(_.getDouble(0)).toSet
    assert(runB("area:(20..60)") == Set(10.0, 25.0))       // qty*2 in [20,60]
    assert(runB("geometry=r") == Set(10.0, 25.0))
    assert(runB("geometry in (r, n) and not area:(..30)") == Set(25.0, 40.0))
    // schema keys still resolve when not shadowed by a binding
    assert(runB("geometry=r and status=F") == Set(10.0))
  }

  test("parse errors are informative") {
    intercept[IllegalArgumentException](FilterDsl.parse("flag="))
    intercept[IllegalArgumentException](FilterDsl.parse("flag=R extra"))
    intercept[IllegalArgumentException](FilterDsl.parse("(flag=R"))
  }
}
