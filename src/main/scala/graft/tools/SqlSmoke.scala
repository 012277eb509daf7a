package graft.tools

import org.apache.spark.sql.SparkSession

/** spark-submit smoke for the `spark.sql.extensions=graft.functions.GraftExtensions`
  * path: the graft SQL functions must resolve WITHOUT any in-session
  * registration call. Exits nonzero on mismatch.
  */
object SqlSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().getOrCreate()
    val r = spark.sql(
      "SELECT char_hash('abc') AS ch, zcell(1000000L, 2000000L, 12) AS zc, " +
        "normalize_text(' A!!b  C ') AS nt").collect().head
    require(r.getLong(0) == graft.core.TextHash.charHash("abc"), "char_hash mismatch")
    require(r.getLong(1) == graft.core.ZGrid.cellAt(12, 1000000L, 2000000L), "zcell mismatch")
    require(r.getString(2) == "ab c", "normalize_text mismatch")
    println(s"SQLSMOKE OK ch=${r.getLong(0)} zc=${r.getLong(1)} nt='${r.getString(2)}'")
    spark.stop()
  }
}
