package graft

/** Focused correctness dump for ONE query:
  * `runMain graft.DumpOne <queryName> [sfDir] [outDir]` — writes the
  * query result to `outDir/<queryName>` exactly as [[Verify]] would, so
  * `tools/check.py` (pointed at outDir) can oracle-compare a single
  * query without paying the full ~100-query Verify pass while iterating.
  */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 2) args(2) else "/tmp/dump_one"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.Sessions.local(cpus)
    SparkEntry.queries(name)(spark, sfDir).coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/$name")
    val sql = SparkEntry.oracleSql.get(name)
      .map(s => "{\"" + name + "\": " + ujsonQuote(s) + "}")
      .getOrElse("{}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), sql): Unit
    spark.stop()
  }

  // same escaping contract as Verify's
  private def ujsonQuote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
