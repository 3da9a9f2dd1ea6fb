package graft

/** Batch plan dumper: `runMain graft.ExplainMany <outDir> <name>...` —
  * writes each query's `explain("formatted")` output to
  * `<outDir>/<name>.txt` in ONE JVM (Explain spins a session per query,
  * which at ~40 s of sbt+JVM startup each makes a 20-plan audit an
  * hour; this makes it one startup). Same session recipe and sfDir
  * convention as the other mains. */
object ExplainMany {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.core.Sessions.local(cpus)
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val plan =
        try {
          val qe = SparkEntry.queries(name)(spark, sfDir).queryExecution
          qe.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        } catch {
          case e: Throwable => s"EXPLAIN FAILED: ${e.getMessage}"
        }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"$name.txt"), plan)
      println(s"[explain] wrote $name")
    }
    spark.stop()
  }
}
