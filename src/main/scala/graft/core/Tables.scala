package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet test tables (TESTDATA.md). */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Exact integer-microsecond view of an event-time column, adaptive to
    * how the source stored it — the corpus generations differ:
    *  - TIMESTAMP_NTZ / TIMESTAMP(µs) parquet (current testdata):
    *    `unix_micros` after an NTZ→TS cast, exact because the session
    *    timezone is pinned to UTC ([[Sessions.local]]), matching DuckDB's
    *    `epoch_us(ts)` on the same naive value;
    *  - raw nanosecond BIGINT (TIMESTAMP(NANOS) sources Spark surfaces as
    *    LongType, and the [[graft.ScaleUp]] probe corpora): `div 1000`
    *    truncates ns→µs exactly as DuckDB's `epoch_us` does.
    * Every µs is representable in both paths, so the two generations hash
    * identically through the oracle gate. */
  def tsMicros(df: DataFrame, c: String): Column = df.schema(c).dataType match {
    case LongType          => expr(s"$c div 1000")
    case TimestampNTZType  => unix_micros(col(c).cast(TimestampType))
    case TimestampType     => unix_micros(col(c))
    case other => throw new IllegalArgumentException(
      s"unsupported event-time type for column $c: $other")
  }

  /** `events` with `ts_us` = exact integer microseconds (see [[tsMicros]]). */
  def eventsTsUs(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = load(spark, sfDir, "events")
    raw.withColumn("ts_us", tsMicros(raw, "ts"))
  }
}
