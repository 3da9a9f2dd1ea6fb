package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Stage 2 — per-line trajectory clustering, re-expressed Spark-first.
  *
  * The reference runs this as PySpark: trajectories assembled with an
  * order-dependent `collect_list` (`Parallel/Trajectory
  * Clustering.py:143–145`), pairwise distances through a Python row UDF,
  * and per-line sklearn DBSCAN inside a pandas grouped-map UDF
  * (`Standalone/Trajectory Clustering.py:143–191`) — every row crossing
  * JVM↔Python. Here the whole stage is native:
  *
  *  - assembly sorts the collected points by time (`array_sort` on a
  *    (t,lng,lat) struct) — the reference silently depends on read order,
  *    a latent nondeterminism fixed, not copied (SURVEY.md §7.4);
  *  - per-line grouping is `groupByKey(...).flatMapGroups` with the
  *    distance matrix + [[Dbscan]] computed in-JVM;
  *  - per-line (eps, minSamples) parameters ride a broadcast map instead
  *    of a driver dict captured in Python closures.
  *
  * Scale: the O(T²) matrix is per line (T = trajectories of ONE bus line
  * on one day — hundreds, not millions). Lines differ wildly in T, so at
  * cluster scale pair this with [[Balance.costBalancedRepartition]] keyed
  * on T² so one executor doesn't serialize all heavy lines.
  */
object TrajectoryClustering {

  /** Per-line DBSCAN parameters (reference `lines95_parameter.csv`). */
  final case class Params(eps: Double, minSamples: Int)

  /** Assemble time-ordered trajectories:
    * (linenumber, id, patternID) → array<struct<lng,lat>>. */
  def assemble(patterns: DataFrame): DataFrame =
    patterns
      .groupBy(col("linenumber"), col("id"), col("patternID").cast("string").as("patternID"))
      .agg(array_sort(collect_list(struct(col("t"), col("lng"), col("lat")))).as("_tpts"))
      .withColumn("points",
        transform(col("_tpts"), p => struct(
          p.getField("lng").cast("double").as("lng"),
          p.getField("lat").cast("double").as("lat"))))
      .drop("_tpts")

  /** Cluster each line's trajectories; returns
    * `(linenumber, id, patternID, cluster)` with −1 = noise.
    *
    * Reference behaviors preserved: lines with no parameters are skipped
    * (their rows get null cluster after [[attach]], TC-S:153–155); a
    * line whose clustering throws falls back to all-zeros
    * (TC-P:309–312); non-finite pair distances are clamped to 2× the max
    * finite distance (TC-P:298–303). */
  def cluster(patterns: DataFrame, params: Map[String, Params]): DataFrame = {
    val assembled = assemble(patterns)
    val spark = assembled.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(params)

    val grouped: Dataset[(String, String, String, Seq[(Double, Double)])] =
      assembled.select(
        col("linenumber").cast("string"), col("id").cast("string"),
        col("patternID"),
        transform(col("points"), p => p.getField("lng")).as("lngs"),
        transform(col("points"), p => p.getField("lat")).as("lats"))
        .as[(String, String, String, Seq[Double], Seq[Double])]
        .map { case (ln, id, pid, lngs, lats) => (ln, id, pid, lngs.zip(lats)) }

    grouped
      .groupByKey(_._1)
      .flatMapGroups { (line, it) =>
        bc.value.get(line) match {
          case None => Iterator.empty // no params → skip line (TC-S:153)
          case Some(p) =>
            // deterministic trajectory order (reference relies on pandas
            // groupby order) → stable DBSCAN labels
            val trajs = it.toArray.sortBy(r => (r._2, r._3))
            val pts = trajs.map(_._4.map { case (lng, lat) =>
              TrajectoryDistance.P(lng, lat) }.toIndexedSeq)
            val n = pts.length
            // polyline lengths once per trajectory, not once per pair —
            // the O(T²) loop then does O(1) work per pair
            val lens = pts.map(TrajectoryDistance.lengthKm)
            val dist = Array.ofDim[Double](n, n)
            var maxFinite = 0.0
            var i = 0
            while (i < n) {
              var j = i + 1
              while (j < n) {
                val d = TrajectoryDistance.totalWithLengths(
                  pts(i), pts(j), lens(i), lens(j))
                val v = if (java.lang.Double.isFinite(d)) d else Double.NaN
                dist(i)(j) = v; dist(j)(i) = v
                if (!v.isNaN && v > maxFinite) maxFinite = v
                j += 1
              }
              i += 1
            }
            // clamp non-finite to 2×max finite (TC-P:298–303)
            i = 0
            while (i < n) {
              var j = 0
              while (j < n) {
                if (dist(i)(j).isNaN) dist(i)(j) = 2 * maxFinite
                j += 1
              }
              i += 1
            }
            val labels =
              try Dbscan.fit(dist, p.eps, p.minSamples)
              catch { case _: Exception => Array.fill(n)(0) } // TC-P:309–312
            trajs.indices.iterator.map { k =>
              (line, trajs(k)._2, trajs(k)._3, labels(k))
            }
        }
      }
      .toDF("linenumber", "id", "patternID", "cluster")
  }

  /** Join cluster labels back onto the point-level frame (TC-S:201); rows
    * of skipped lines keep a null cluster. */
  def attach(patterns: DataFrame, clustered: DataFrame): DataFrame =
    patterns
      .withColumn("patternID", col("patternID").cast("string"))
      .join(clustered, Seq("linenumber", "id", "patternID"), "left")

  /** Full stage 2. */
  def run(patterns: DataFrame, params: Map[String, Params]): DataFrame =
    attach(patterns, cluster(patterns, params))
}
