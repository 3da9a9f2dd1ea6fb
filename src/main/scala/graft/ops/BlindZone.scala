package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Geo, Quantifiers, TimeOps}

/** Stage 3 — blind-zone confidence grading, from `Standalone/Blind Zone
  * Detection.scala` (semantic ground truth; the parallel variant drifts,
  * SURVEY.md §5).
  *
  * Spark-first differences:
  *  - the reference's driver-side `distinct().count()` scalar
  *    (BZ-S:58–59) becomes a broadcast cross join — no driver round-trip,
  *    one job, same value;
  *  - haversine speed is fused column math, not a UDF (BZ-S:49);
  *  - time deltas are exact µs, not whole seconds (BZ-S:84 truncates to
  *    seconds — documented deviation: speeds here are exact);
  *  - `lineScoped` (default true) keys clusters as (linenumber, cluster)
  *    and measures coverage against the line's own fleet. The reference
  *    groups by bare `cluster` (BZ-S:62), but DBSCAN labels are assigned
  *    per line (TC-S:176–184), so cluster 0 of two different lines
  *    silently merges and coverage is measured against the whole city's
  *    fleet — a correctness bug at any scale. Set lineScoped=false for
  *    bug-compatible behavior.
  *
  * Signal semantics preserved exactly (BZ-S:103–165):
  *  step 1  fastest ping of each (cluster, vehicle, pattern) → 0.5;
  *  step 2  if EVERY vehicle in a cluster has a 0.5 ping faster than
  *          10 m/s, upgrade those pings to 0.75 (∀∃ quantifier);
  *  step 3  if EVERY (vehicle, pattern) in the cluster then carries a
  *          0.75, upgrade to 1.0;
  *  step 4  one-step propagation: a null-signal ping directly after a
  *          graded ping inherits its grade. (As committed this fills
  *          exactly one row per graded ping — a single `lag` on the
  *          pre-fill column, not a running fill — preserved as-is.)
  */
object BlindZone {

  case class Config(
      coverageFraction: Double = 0.75, // BZ-S:59
      upgradeSpeedMps: Double = 10.0,  // BZ-S:116
      lineScoped: Boolean = true)

  private val byPattern = Window.partitionBy("id", "patternID").orderBy("t")

  private def clusterKey(cfg: Config): Seq[String] =
    if (cfg.lineScoped) Seq("linenumber", "cluster") else Seq("cluster")

  /** Keep clusters covering ≥ coverage×(fleet) and compute point-to-next
    * speed (BZ-S:52–101). Input: stage-2 output with `cluster`
    * (int, −1 = noise). */
  def qualifyAndSpeed(clustered: DataFrame, cfg: Config = Config()): DataFrame = {
    val pts = clustered.filter(col("cluster").isNotNull && col("cluster") =!= -1)
    val key = clusterKey(cfg)

    // coverage threshold (BZ-S:58–59 collects a scalar to the driver;
    // .toInt truncation preserved via floor). Line-scoped: per-line fleet.
    val perCluster = pts.groupBy(key.map(col): _*)
      .agg(countDistinct(col("id")).as("_idc"))
    val qualified = (if (cfg.lineScoped) {
      val fleet = pts.groupBy("linenumber")
        .agg(floor(countDistinct(col("id")) * cfg.coverageFraction).as("_threshold"))
      perCluster.join(broadcast(fleet), Seq("linenumber"))
    } else {
      val fleet = pts.select(
        floor(countDistinct(col("id")) * cfg.coverageFraction).as("_threshold"))
      perCluster.crossJoin(broadcast(fleet))
    })
      .filter(col("_idc") >= col("_threshold"))
      .select(key.map(col): _*)
    val kept = pts.join(broadcast(qualified), key, "left_semi")

    val dtSec = (TimeOps.micros(lead(col("t"), 1).over(byPattern)) -
      TimeOps.micros(col("t"))).cast("double") / 1e6
    kept
      .withColumn("_dt", coalesce(dtSec, lit(0.0)))
      .withColumn("_dist", coalesce(
        Geo.haversineMeters(col("lat"), col("lng"),
          lead(col("lat"), 1).over(byPattern), lead(col("lng"), 1).over(byPattern)),
        lit(0.0)))
      .withColumn("speed",
        when(col("_dt") === 0.0, 0.0).otherwise(col("_dist") / col("_dt")))
      .drop("_dt", "_dist")
  }

  /** Signal grading steps 1–4 (BZ-S:103–165). */
  def gradeSignal(df: DataFrame, cfg: Config = Config()): DataFrame = {
    val key = clusterKey(cfg)
    val keyCols = key.map(col)

    // step 1: argmax-speed ping per (cluster, vehicle, pattern) → 0.5
    val wSpeed = Window.partitionBy((key ++ Seq("id", "patternID")).map(col): _*)
      .orderBy(col("speed").desc, col("t"))
    val s1 = df
      .withColumn("_rn", row_number().over(wSpeed))
      .withColumn("signal", when(col("_rn") === 1, 0.5))
      .drop("_rn")

    // step 2: ∀ vehicle ∃ (0.5 ∧ speed > threshold) per cluster → 0.75
    val c1 = s1.groupBy((key :+ "id").map(col): _*)
      .agg(Quantifiers.existsFlag(
        col("signal") === 0.5 && col("speed") > cfg.upgradeSpeedMps).as("_has"))
      .groupBy(keyCols: _*).agg(min(col("_has")).as("_all_valid"))
    val s2 = s1.join(broadcast(c1), key, "left")
      .withColumn("signal",
        when(col("signal") === 0.5 && col("_all_valid") === 1, 0.75)
          .otherwise(col("signal")))
      .drop("_all_valid")

    // step 3: ∀ (vehicle, pattern) ∃ 0.75 per cluster → 1.0
    val c2 = s2.groupBy((key ++ Seq("id", "patternID")).map(col): _*)
      .agg(Quantifiers.existsFlag(col("signal") === 0.75).as("_has"))
      .groupBy(keyCols: _*).agg(min(col("_has")).as("_all_075"))
    val s3 = s2.join(broadcast(c2), key, "left")
      .withColumn("signal",
        when(col("signal") === 0.75 && col("_all_075") === 1, 1.0)
          .otherwise(col("signal")))
      .drop("_all_075")

    // step 4: one-step propagation (see class doc)
    val wTime = Window.partitionBy((key ++ Seq("id", "patternID")).map(col): _*)
      .orderBy("t")
    s3.withColumn("_prev", lag(col("signal"), 1).over(wTime))
      .withColumn("signal",
        when(col("signal").isNull && col("_prev").isNotNull, col("_prev"))
          .otherwise(col("signal")))
      .drop("_prev")
  }

  /** Full stage 3. */
  def run(clustered: DataFrame, cfg: Config = Config()): DataFrame =
    gradeSignal(qualifyAndSpeed(clustered, cfg), cfg)
}
