package graft

import org.apache.spark.sql.functions._

/** Local scaling-probe corpus generator:
  * `runMain graft.ScaleUp <srcSfDir> <outDir> [factor]` — writes a
  * `factor`× replica of `documents` and `events` (the tables the dedup
  * ladder and the streaming sinks read) for throughput scaling runs.
  *
  * Replicas are DISJOINT by construction — doc/user/event ids offset per
  * replica, and every document token suffixed with a replica tag so no
  * shingle is shared across replicas. That keeps each replica's internal
  * near-dup structure identical to the source while making the corpus-
  * wide pair population scale LINEARLY in `factor`, the shape real "10×
  * more data" has. Naive row duplication would instead make every doc an
  * exact dup of its copies and blow the pair count up quadratically —
  * measuring that measures the wrong workload.
  *
  * Probe data only: no oracle runs against it and nothing under
  * /root/testdata is touched.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(src, out) = args.take(2)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docIdSpan = 10000000L
    val reps = spark.range(factor).select(col("id").cast("int").as("rep"))
    docs.crossJoin(broadcast(reps))
      .select(
        (col("doc_id") + col("rep") * docIdSpan).as("doc_id"),
        // rep 0 keeps the source text byte-for-byte; later reps suffix
        // every token, so shingle vocabularies are replica-disjoint
        when(col("rep") === 0, col("text"))
          .otherwise(array_join(
            transform(split(col("text"), " "),
              t => concat(t, lit("_"), col("rep"))), " "))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(col("doc_id"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val events = spark.read.parquet(s"$src/events.parquet")
    val userSpan = 10000000L
    events.crossJoin(broadcast(reps))
      .select(
        (col("event_id") + col("rep") * docIdSpan).as("event_id"),
        col("ts"),
        (col("user_id") + col("rep") * userSpan).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(col("user_id"))
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    println(s"[scaleup] wrote ${factor}x documents+events from $src to $out")
    spark.stop()
  }
}
