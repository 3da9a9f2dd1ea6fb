package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands kit — the heart of the reference's stage 1.
  *
  * The reference builds signal-loss "patterns" with a hand-rolled chain of
  * lag/when/running-sum/fill windows (`Standalone/Pattern
  * Extraction.scala:67–172`). Those idioms generalize to four reusable
  * transforms; each is a single `Window.partitionBy(keys).orderBy(order)`
  * pass, so N transforms over the same keys collapse into one shuffle
  * (Catalyst reuses the exchange).
  *
  * Time is expressed as an exact integer-microseconds Column (caller
  * supplies `unix_micros($"t")` for timestamps, or any monotone numeric),
  * avoiding lossy second-granularity arithmetic and float drift.
  *
  * Scale note: a per-key window shuffles once on the key hash. Keys are
  * (vehicle, day)-grained in the reference — millions of small groups at
  * 100 TB, the partitioning-friendly case. The anti-scale shape to avoid
  * is a single giant group; callers should compose the partition key so no
  * group exceeds executor memory.
  */
object Sessionize {

  private def win(partitionCols: Seq[String], orderCols: Seq[Column]) =
    Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols: _*)

  /** Assign increasing session ids per key: a new session starts when the
    * time gap to the previous row exceeds `gapMicros` (a key's first row
    * always starts session 1). Mirrors the reference's lag-state logic
    * (`Standalone/Pattern Extraction.scala:73–102`) minus its
    * distance-guard, which callers add via `extraBreak`.
    *
    * @param timeUs     exact event time in integer microseconds
    * @param tieBreak   extra ordering columns for deterministic results
    *                   when `timeUs` can tie (e.g. a unique id)
    * @param extraBreak additional condition forcing a session break (e.g.
    *                   the reference's 11.11×(threshold−1) m distance guard)
    */
  def withSessionId(
      df: DataFrame,
      partitionCols: Seq[String],
      timeUs: Column,
      gapMicros: Long,
      out: String = "session_id",
      tieBreak: Seq[Column] = Nil,
      extraBreak: Column = lit(false)): DataFrame = {
    val w = win(partitionCols, timeUs +: tieBreak)
    val prev = lag(timeUs, 1).over(w)
    val isBreak = prev.isNull || (timeUs - prev) > gapMicros || extraBreak
    df.withColumn("_brk", when(isBreak, 1L).otherwise(0L))
      .withColumn(out, sum(col("_brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_brk")
  }

  /** Change-point numbering: new segment whenever `flag` transitions
    * 0 → 1 relative to the previous row (reference: `Standalone/Pattern
    * Extraction.scala:170–172`). */
  def withChangePointId(
      df: DataFrame,
      partitionCols: Seq[String],
      orderCols: Seq[Column],
      flag: Column,
      out: String): DataFrame = {
    val w = win(partitionCols, orderCols)
    val rising = (coalesce(lag(flag, 1).over(w), lit(0)) === 0) && (flag === 1)
    df.withColumn("_cp", when(rising, 1L).otherwise(0L))
      .withColumn(out, sum(col("_cp"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_cp")
  }

  /** Forward-fill nulls with the last non-null value in order (reference:
    * `Parallel/Pattern Extraction.scala:117–122`). */
  def forwardFill(
      df: DataFrame,
      partitionCols: Seq[String],
      orderCols: Seq[Column],
      value: Column,
      out: String): DataFrame = {
    val w = win(partitionCols, orderCols)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(out, last(value, ignoreNulls = true).over(w))
  }

  /** Backward-fill nulls with the next non-null value in order (reference's
    * forward-looking frame, `Standalone/Pattern Extraction.scala:140–147`). */
  def backwardFill(
      df: DataFrame,
      partitionCols: Seq[String],
      orderCols: Seq[Column],
      value: Column,
      out: String): DataFrame = {
    val w = win(partitionCols, orderCols)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    df.withColumn(out, first(value, ignoreNulls = true).over(w))
  }
}
