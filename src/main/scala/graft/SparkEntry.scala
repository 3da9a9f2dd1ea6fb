package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Ext, ExtOracle, Learn, LearnOracle, Pipeline, PipelineOracle, Rel, RelOracle, Warehouse, WarehouseOracle}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one named entry per implemented operator from
  * SURVEY.md §2; `oracleSql` holds the DuckDB-equivalent ANSI SQL for every
  * SQL-expressible query (same column names, same ORDER BY — the driver
  * hash-compares values after sorting columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Rel.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Rel.all ++ Ext.all ++ Pipeline.all ++ Warehouse.all ++ Learn.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    RelOracle.all ++ ExtOracle.all ++ WarehouseOracle.all ++
      PipelineOracle.all ++ LearnOracle.all
}
