package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query timed at
  * SPARK_GRAFT_SF_DIR, one JSON line to stdout.
  *
  * Measurement discipline (round-2 verdict items):
  *  - queries run in SORTED name order — per-query numbers are comparable
  *    across rounds (a HashMap walk made round-1 order, and thus which
  *    query absorbed JVM warmup, nondeterministic);
  *  - one untimed warmup action first (JIT + codegen + parquet footer
  *    caches), so the first timed query isn't charged for JVM startup;
  *  - caches persist ACROSS queries by design: the dedup ladder stages its
  *    pair relation once (queries.Ext) and the later dedup queries reuse
  *    it — the bench measures the suite the way a real pipeline runs it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // untimed warmup: the flagship aggregate touches parquet scan, shuffle,
    // codegen, and AQE once before anything is timed
    try { SparkEntry.queries("q1_agg")(spark, sfDir).count() } catch { case _: Throwable => () }

    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // untimed, between queries: with a large fixed heap the JVM may not
      // GC for the whole run, so Spark's ContextCleaner (weak-ref driven)
      // never releases finished queries' shuffle/broadcast state — by the
      // ~50th query the accumulated bookkeeping inflated later queries up
      // to 4x. This is spark.cleaner.periodicGC at bench cadence.
      System.gc()
      (name, dt, ok)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
