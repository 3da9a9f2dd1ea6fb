package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary profiling harness (not part of the library surface)
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.Dedup
    import graft.core.Tables

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warmup
    queries.Rel.q1Agg(spark, sfDir).count()

    time("pipeline 1")(
      println("bz=" + queries.Pipeline.blindZone(spark, sfDir).count()))
    time("pipeline 2")(
      println("bz=" + queries.Pipeline.blindZone(spark, sfDir).count()))

    // pipeline stages
    import graft.ops.{PatternExtraction, TrajectoryClustering}
    val fleet = Tables.load(spark, sfDir, "events")
      .withColumn("ts_us", expr("ts div 1000"))
      .filter(col("event_type") === "click")
      .select(
        concat(lit("V"), col("user_id")).as("id"),
        concat(lit("L"), col("user_id") % 8).as("linenumber"),
        (lit(114.0) + (col("ts_us") % 86400000000L) / lit(86400000000.0) * 0.2).as("lng"),
        (lit(22.5) + (col("user_id") % 8).cast("double") * 0.01).as("lat"),
        timestamp_micros(col("ts_us")).as("t"))
    val pats = time("patternExtraction")(
      { val p = PatternExtraction.run(fleet, None,
          PatternExtraction.Config(qualify = false)).persist(); println("pats=" + p.count()); p })
    val params = (0 until 8)
      .map(i => s"L$i" -> TrajectoryClustering.Params(5.0, 2)).toMap
    val asm = time("assemble")(
      { val a = TrajectoryClustering.assemble(pats).persist(); println("trajs=" + a.count()); a })
    time("cluster")(
      println("clustered=" + TrajectoryClustering.cluster(pats, params).count()))
    time("run (attach)")(
      println("attached=" + TrajectoryClustering.run(pats, params).count()))
    spark.stop()
  }
}
