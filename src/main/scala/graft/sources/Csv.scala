package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source surface (reference inventory S1–S9).
  *
  * The reference reads everything as header-only CSV with lazy string
  * types (`Parallel/Pattern Extraction.scala:38–45`) — at 100 TB that
  * means no scan pruning, no predicate pushdown, and a cast per use. The
  * rebuild's rule: explicit `StructType` at read time (never
  * `inferSchema`, which double-scans), Parquet for every intermediate.
  */
object Csv {

  /** S1/S3: header CSV with an explicit schema (no inference pass). */
  def read(spark: SparkSession, path: String, schema: StructType,
           delimiter: String = ",",
           timestampFormat: Option[String] = None): DataFrame = {
    val r = spark.read
      .option("header", "true")
      .option("sep", delimiter) // S2: custom delimiter (reference used ";")
      .schema(schema)
    timestampFormat.fold(r)(f => r.option("timestampFormat", f)) // S9
      .csv(path) // S4: path may be a glob or directory
  }

  /** S1 fallback: header CSV, all columns as string (the reference's lazy
    * mode) — for truly unknown inputs only. */
  def readDynamic(spark: SparkSession, path: String, delimiter: String = ","): DataFrame =
    spark.read.option("header", "true").option("sep", delimiter).csv(path)

  /** S1 for DIRTY feeds: PERMISSIVE read with a corrupt-record column.
    * The reference's CSV feeds carry broken rows alongside the mixed
    * timestamp formats; its lazy all-string read never surfaces them, so
    * breakage flows silently into downstream casts. Here a malformed row
    * (wrong field count, unparseable value) lands with its RAW LINE in
    * `corruptCol` and the typed fields best-effort parsed — the caller
    * can tally, quarantine, or repair instead of crashing (FAILFAST) or
    * silently dropping (DROPMALFORMED) a 100 TB feed for one bad row.
    *
    * Spark populates the corrupt column only when it is part of the read
    * schema (appended here), and two scan-level caveats mean consumers
    * should LAND this parse as a table before auditing it (the pattern
    * `csv_dirty_read` follows; `CsvSpec` pins both): a raw scan pruned to
    * the corrupt column alone is refused outright
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and under column pruning a row
    * missing its LATER fields is silently not flagged, because the parser
    * extracts only the required indices and never sees the short token
    * count. */
  def readPermissive(spark: SparkSession, path: String, schema: StructType,
                     delimiter: String = ",", header: Boolean = true,
                     corruptCol: String = "_corrupt"): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .schema(schema.add(corruptCol, org.apache.spark.sql.types.StringType))
      .csv(path)

  /** S5–S8: header CSV sink. `partitionCols` replaces the reference's
    * driver-side per-line loop (`Standalone/Pattern Extraction.scala:45`)
    * with one partitioned write; `singleFile` uses `coalesce(1)` (no
    * shuffle) instead of the reference's `repartition(1)`. */
  def write(df: DataFrame, path: String,
            partitionCols: Seq[String] = Nil,
            singleFile: Boolean = false,
            overwrite: Boolean = true,
            delimiter: String = ","): Unit = {
    val d = if (singleFile) df.coalesce(1) else df
    val w0 = d.write.option("header", "true").option("sep", delimiter)
    val w1 = if (overwrite) w0.mode("overwrite") else w0
    val w2 = if (partitionCols.nonEmpty) w1.partitionBy(partitionCols: _*) else w1
    w2.csv(path)
  }
}
