package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Timestamp normalization and arithmetic.
  *
  * The reference's GPS feed mixes two formats in one file —
  * `yy-MM-dd HH:mm:ss` and `yyyy-MM-dd HH:mm:ss` (see
  * `Sample Data/gps.csv`; parse sites `Standalone/Pattern
  * Extraction.scala:74`, `Standalone/Blind Zone Detection.scala:72`) — and
  * does all time arithmetic in epoch seconds (`unix_timestamp`). Spark 4's
  * ANSI parser rejects a 2-digit year under `yyyy-`, so normalization must
  * be a `coalesce` of per-format `try_to_timestamp` attempts, first match
  * wins. Arithmetic here standardizes on exact integer microseconds
  * (`unix_micros`) instead of lossy seconds.
  */
object TimeOps {

  /** Formats seen in the reference GPS data, most common first. */
  val GpsFormats: Seq[String] = Seq("yy-MM-dd HH:mm:ss", "yyyy-MM-dd HH:mm:ss")

  /** Parse a string column trying several formats; null if none match. */
  def parseMulti(c: Column, formats: Seq[String] = GpsFormats): Column =
    coalesce(formats.map(f => try_to_timestamp(c, lit(f))): _*)

  /** The format string that [[parseMulti]] would match (first match wins),
    * null when none parse — aggregate it per feed batch to watch format
    * drift (a new upstream format shows up as a growing null/unknown
    * bucket long before it corrupts downstream time arithmetic). */
  def matchedFormat(c: Column, formats: Seq[String] = GpsFormats): Column =
    coalesce(formats.map(f =>
      when(try_to_timestamp(c, lit(f)).isNotNull, lit(f))): _*)

  /** Exact whole microseconds since epoch. */
  def micros(c: Column): Column = unix_micros(c)

  /** Seconds (with fractional part) between two timestamps, exact to 1µs. */
  def secondsBetween(later: Column, earlier: Column): Column =
    (unix_micros(later) - unix_micros(earlier)).cast("double") / 1e6
}
