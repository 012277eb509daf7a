package graft.tools

/** Dump SparkEntry.oracleSql entries to files for local DuckDB checks
  * without running the full Verify sweep:
  * runMain graft.tools.DumpOracle <outDir> [name ...]   (default: all)
  */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    new java.io.File(outDir).mkdirs()
    val names = if (args.length > 1) args.drop(1).toSeq else graft.SparkEntry.oracleSql.keys.toSeq
    names.foreach { n =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$n.sql"), graft.SparkEntry.oracleSql(n))
    }
  }
}
