package graft

/** Multi-query correctness dump: like [[DumpOne]] but amortizes one Spark
  * session over a list of queries and writes a MERGED oracle_sql.json, so
  * `tools/check.py <sfDir> <outDir>` can gate a whole batch of new queries
  * in one pass while iterating.
  *
  * `runMain graft.DumpMany <sfDir> <outDir> <name> [<name> ...]`
  */
object DumpMany {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.Sessions.local(cpus)
    names.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      println(f"DUMPED $name in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val sql = names.flatMap(n => SparkEntry.oracleSql.get(n).map(n -> _))
      .map { case (n, s) => "\"" + n + "\": " + quote(s) }
      .mkString("{", ", ", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), sql): Unit
    spark.stop()
  }

  private def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
