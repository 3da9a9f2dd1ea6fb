package graft

import org.apache.spark.sql.functions._

/** Diagnostic bisect harness for warm-JVM degradation (not part of the
  * product surface): times the IVF Lloyd training loop — the operation
  * whose in-query form inflated 2.5s → 59s late in a ~200-query bench
  * JVM (round-5) — before and after a selectable prelude family of
  * registered queries. Usage: runMain graft.DegradeProbe <family>
  * [rounds], family ∈ rel | dedup | stream | text | all.
  *
  * Round-5 findings with this harness: NO prelude reproduces the
  * degradation against a bare training loop — stream×2 / dedup×2 /
  * rel×2 / text×2 / all×2 (= 192 queries) all leave training at
  * 0.6–1.2s warm, and live threads grow to ~700 with no effect. The
  * blow-up therefore required the OLD in-query pattern the r5 fix
  * removed (persist(MEMORY_AND_DISK) of the exact baseline + inline
  * train + broadcast create/destroy inside the measured query), not
  * accumulated session state acting on training alone. Kept for the
  * next degradation hunt: add the suspect op to [[timeTrain]]'s slot
  * and bisect prelude families the same way.
  */
object DegradeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val family = args.headOption.getOrElse("all")
    val rounds = args.lift(1).map(_.toInt).getOrElse(1)
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def cpuNow(): Long = graft.core.PhaseLog.cpuNanos()
    def timeTrain(tag: String): Unit = {
      val t0 = System.nanoTime(); val c0 = cpuNow()
      graft.ext.Similarity.trainCentroids(
        graft.core.Tables.load(spark, sfDir, "embeddings")
          .select(col("vec_id"), col("embedding")), nlist = 64, iters = 2)
      println(f"[probe] train $tag wall=${(System.nanoTime() - t0) / 1e9}%.2f " +
        f"cpu=${(cpuNow() - c0) / 1e9}%.2f threads=${Thread.activeCount()}")
    }

    val keys = SparkEntry.queries.keys.toSeq.sorted
    val names = family match {
      case "rel" => keys.filter(k => Seq("agg_", "win_", "join_", "proj_",
        "fn_", "sort", "set_", "scalar", "q1", "gen_", "sql_", "skew").exists(k.startsWith))
      case "dedup" => keys.filter(k => k.startsWith("dedup_") || k.startsWith("sim_"))
      case "stream" => keys.filter(_.startsWith("stream_"))
      case "text" => keys.filter(k => k.startsWith("text_") || k.startsWith("mm_")
        || k.startsWith("sample_") || k.startsWith("split_"))
      case "all" => keys
      case other =>
        System.err.println(
          s"[probe] unknown family '$other' — use rel|dedup|stream|text|all")
        spark.stop()
        sys.exit(2)
    }
    println(s"[probe] family=$family n=${names.size} rounds=$rounds")
    timeTrain("cold")
    timeTrain("warm")
    (1 to rounds).foreach { r =>
      names.foreach { n =>
        try { SparkEntry.queries(n)(spark, sfDir).count(): Unit }
        catch { case e: Throwable =>
          println(s"[probe] $n failed: ${e.getMessage}") }
        System.gc()
      }
      timeTrain(s"after_round$r")
      timeTrain(s"after_round${r}_again")
    }
    spark.stop()
  }
}
