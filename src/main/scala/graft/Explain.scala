package graft


/** Plan inspector: `runMain graft.Explain <queryName> [sfDir]` prints the
  * formatted physical plan for one SparkEntry query — the per-operator
  * feedback loop for shuffle/pushdown/codegen auditing. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.Sessions.local(cpus)
    SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
