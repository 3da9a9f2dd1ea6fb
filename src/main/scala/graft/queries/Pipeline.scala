package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{BlindZone, PatternExtraction, TrajectoryClustering}

/** Flagship end-to-end pipeline query: the reference's full three-stage
  * blind-zone analysis (pattern extraction → trajectory clustering →
  * signal grading) over a GPS fleet synthesized deterministically from the
  * `events` table, so it runs at any scale factor the driver picks.
  *
  * No SQL oracle (DBSCAN + trajectory distance are not SQL-expressible);
  * the driver's rows-only check applies, and `PipelineSpec` asserts the
  * stage semantics on hand-built fixtures.
  */
object Pipeline {

  /** events → GPS pings: vehicle = user, line = user%8, position advances
    * with time-of-day along the line's track; real inter-event gaps supply
    * the signal-loss structure. */
  private def syntheticFleet(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .withColumn("ts_us", expr("ts div 1000"))
      .filter(col("event_type") === "click")
      .select(
        concat(lit("V"), col("user_id")).as("id"),
        concat(lit("L"), col("user_id") % 8).as("linenumber"),
        (lit(114.0) + (col("ts_us") % 86400000000L) / lit(86400000000.0) * 0.2)
          .as("lng"),
        (lit(22.5) + (col("user_id") % 8).cast("double") * 0.01).as("lat"),
        timestamp_micros(col("ts_us")).as("t"))

  def blindZone(s: SparkSession, dir: String): DataFrame = {
    import graft.core.Stage
    import s.implicits._
    // Stage boundaries are leaf-materialized (Stage.materialize), not
    // plain persist: each stage's consumers branch several times
    // (clustering scans patterns 4x, grading scans clusters across ~10
    // window/agg subtrees), and with persist every branch re-ANALYZES
    // the full upstream lineage — measured ~3 s of driver-side Catalyst
    // work at sf0.1 on top of the cached execution. The leaf plan makes
    // analysis/planning O(1) per consumer, and the explicit RDD handles
    // release the blocks deterministically below (weak-ref cleaning
    // alone may never run under a large fixed heap — NOTES.md).
    // no terminus geography in the synthetic feed → qualification off
    // (the reference's standalone variant uses an allowlist here)
    val (pats, patsStore) = Stage.materialize(
      PatternExtraction.run(syntheticFleet(s, dir), busLine = None,
        cfg = PatternExtraction.Config(qualify = false)))
    val params = (0 until 8)
      .map(i => s"L$i" -> TrajectoryClustering.Params(eps = 5.0, minSamples = 2))
      .toMap
    val (clustered, clusteredStore) = Stage.materialize(
      TrajectoryClustering.run(pats, params))
    val signals = BlindZone.run(clustered)
    // stable per-stage rollup — ONE aggregate action per stage
    // (countDistinct(when(...)) ≡ filter+distinct+count, null-ignoring)
    def stats(df: DataFrame, group: org.apache.spark.sql.Column): (Long, Long) = {
      val r = df.agg(countDistinct(group).as("g"), count(lit(1)).as("n")).head()
      (r.getLong(0), r.getLong(1))
    }
    val logPhase = graft.core.PhaseLog.start("pipeline")
    val s1 = stats(pats, struct(col("id"), col("patternID")))
    logPhase("patterns")
    val s2 = stats(clustered, when(col("cluster") =!= -1, col("cluster")))
    logPhase("clustered")
    val s3 = stats(signals, when(col("signal").isNotNull, col("cluster")))
    logPhase("signals")
    val out = Seq(
      ("1_patterns", s1._1, s1._2),
      ("2_clustered", s2._1, s2._2),
      ("3_signals", s3._1, s3._2))
      .toDF("stage", "n_groups", "n_rows")
    // every consumer of the staged frames has executed (the stats above
    // are eager), so the blocks can be released deterministically
    patsStore.unpersist(false)
    clusteredStore.unpersist(false)
    out
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_blindzone" -> blindZone _)
}
