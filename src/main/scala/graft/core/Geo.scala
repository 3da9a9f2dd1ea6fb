package graft.core

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Geospatial scalar math.
  *
  * The reference ships three divergent haversine copies
  * (`Parallel/Pattern Extraction.scala:56`, `Standalone/Blind Zone
  * Detection.scala:33`, `Standalone/Trajectory Clustering.py:58`) — all as
  * UDFs, which are opaque to Catalyst codegen. Here the primary form is a
  * *Column composition* of built-in functions, so it inlines into
  * whole-stage codegen with zero serialization cost; a plain-Scala overload
  * serves the row-at-a-time clustering path, and a registered SQL UDF keeps
  * `expr("haversine_m(...)")` strings working (reference parity for
  * `Parallel/Pattern Extraction.scala:103`).
  */
object Geo {

  /** Mean Earth radius in meters (reference uses 6371000 / 6371e3). */
  val EarthRadiusM: Double = 6371000.0

  /** Great-circle distance in meters, as a codegen-friendly Column. */
  def haversineMeters(lat1: Column, lng1: Column, lat2: Column, lng2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLng = radians(lng2 - lng1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLng / 2), 2)
    // clamp: fp rounding can push a slightly above 1
    lit(2 * EarthRadiusM) * asin(least(lit(1.0), sqrt(a)))
  }

  /** Scalar twin of [[haversineMeters]] for per-row Scala code paths
    * (trajectory distance, DBSCAN neighborhoods). */
  def haversineM(lat1: Double, lng1: Double, lat2: Double, lng2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLng = math.toRadians(lng2 - lng1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLng / 2), 2)
    2 * EarthRadiusM * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /** Register `haversine_m` for use inside SQL/`expr` strings. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("haversine_m", haversineM _)

  /** Equirectangular approximation in meters — cheap prefilter for
    * neighborhood queries at city scale (exact enough under ~50 km). */
  def equirectM(lat1: Double, lng1: Double, lat2: Double, lng2: Double): Double = {
    val x = math.toRadians(lng2 - lng1) * math.cos(math.toRadians((lat1 + lat2) / 2))
    val y = math.toRadians(lat2 - lat1)
    EarthRadiusM * math.sqrt(x * x + y * y)
  }
}
