package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Ext

/** The JSONL export/ingest surface (`jsonl_roundtrip`,
  * `jsonl_dirty_read`) and the merged-schema parquet read
  * (`src_schema_evolution`) — each checked against a direct computation
  * from the source parquet that never touches the format under test, the
  * same independence the DuckDB oracles have. */
class JsonlSpec extends SparkSpec {

  test("jsonl_roundtrip digest equals the straight-from-parquet digest") {
    val got = Ext.all("jsonl_roundtrip")(spark, sf0001)
      .collect().map(_.toString).toSeq
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("toks", graft.ext.Text.tokens(col("text")))
    val want = docs.select(
        col("doc_id"), col("text"), col("source"),
        transform(col("toks"), t => length(t)).as("tok_lens"),
        when(col("doc_id") % 7 === 0, lit(null).cast("string"))
          .otherwise(col("lang")).as("alt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("doc_id")).as("sum_id"),
        sum(coalesce(aggregate(col("tok_lens"), lit(0), (a, x) => a + x),
          lit(0))).cast("long").as("sum_tok_len"),
        sum(when(col("alt").isNull, 1L).otherwise(0L)).as("n_null_alt"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("doc_id"), md5(col("text")).as("m")))),
          x => x.getField("m")), "")).as("content_md5"))
      .orderBy(col("source"))
      .collect().map(_.toString).toSeq
    assert(got.nonEmpty && got == want, s"roundtrip=$got direct=$want")
  }

  test("jsonl_dirty_read classifies every damage class and recovers all ids") {
    val rows = Ext.all("jsonl_dirty_read")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val total = docs.count()
    val sumAll = docs.agg(sum(col("doc_id"))).head().getLong(0)
    assert(rows.map(_._1) == List("badtype", "clean", "truncated"),
      s"expected all three damage classes, got $rows")
    // every row lands in exactly one class, and no broken row lost its id:
    // summed recovered ids equal the source-table id sum exactly
    assert(rows.map(_._2).sum == total)
    assert(rows.map(_._3).sum == sumAll, s"id recovery incomplete: $rows")
  }

  test("src_schema_evolution null-fills pre-evolution rows under the sentinel") {
    val rows = Ext.all("src_schema_evolution")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val even = docs.filter(col("doc_id") % 2 === 0).count()
    val pre = rows.filter(_._1 == "_pre_evolution").map(_._2).sum
    assert(pre == even, s"gen1 rows must all bucket under the sentinel: $rows")
    assert(rows.map(_._2).sum == docs.count())
  }
}
