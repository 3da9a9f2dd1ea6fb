package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Local scaling-probe corpus generator:
  * `runMain graft.ScaleUp <srcSfDir> <outDir> [factor]` — writes a
  * `factor`× FK-consistent replica of the full table set, so BOTH the
  * scaling sweeps (RunOne) and the complete DuckDB oracle gate
  * (Verify + tools/check.py) can run at factor× the bench scale.
  *
  * Growth shape = "more facts, same dims": `region nation customer
  * supplier part` are copied verbatim and the fact tables are
  * replicated with per-replica key offsets — orders/lineitem keep their
  * customer/part/supplier FKs pointing into the ORIGINAL dims (10× the
  * orders over the same customer base), events get disjoint user/event
  * ids (10× the users at the same per-user event density, so
  * sessionization state scales in keys not in per-key size), documents
  * get replica-suffixed tokens (each replica keeps the source's internal
  * near-dup structure; the corpus-wide pair population scales LINEARLY —
  * naive duplication would make every doc an exact dup of its copies and
  * measure a quadratic workload), and embeddings get replica-offset ids
  * AND labels (blocked pair mining stays replica-local, again linear)
  * plus per-replica deterministic noise so no two replicas' vectors tie
  * exactly in top-k rankings.
  *
  * `events.ts` is passed through as the raw nanosecond longs the source
  * stores (the engine contract); `tools/check.py` re-exposes it to
  * DuckDB as a timestamp when it sees the BIGINT probe shape.
  *
  * NODE-GROWING mode (4th arg `grow-parts`, round-7 verdict stretch #8):
  * the default "more facts, same dims" shape DENSIFIES the co-purchase
  * graph — same part nodes, factor× the orders, so per-node degree
  * grows factor× and triangle wedge work grows factor² BY CONSTRUCTION
  * (an artifact of the probe, not the operator; r7 excluded
  * `graph_triangles` from sf1 runs for exactly this). With `grow-parts`,
  * the `part` dim is replicated with per-replica key offsets and
  * lineitem's `l_partkey` follows — factor× the NODES at constant
  * per-node degree, the way a real larger catalog grows — so the graph
  * family scales linearly and re-enters large-probe runs. FK
  * consistency is preserved (every l_partkey still resolves in `part`);
  * part-dim queries simply see the honestly-bigger catalog.
  *
  * The GPS-fleet LINE keyspace scales the same way (r11 verdict missing
  * #1): `Pipeline.syntheticFleet` derives the bus line from the user-id
  * replica block (`user_id div 100M`, the offset applied to events
  * here), so a factor× corpus has factor× the lines at constant
  * per-line fleet density — the per-line DBSCAN pair grid stays
  * schedule-bounded instead of growing factor² under a fixed-8-line
  * keyspace.
  *
  * Probe data only: nothing under /root/testdata is touched, and the
  * driver's own gates never read this output.
  */
object ScaleUp {
  private val KeySpan = 100000000L // > any source key at the probe SFs

  def main(args: Array[String]): Unit = {
    val Array(src, out) = args.take(2)
    val factor = if (args.length > 2) args(2).toInt else 10
    val growParts = args.length > 3 && args(3) == "grow-parts"
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val reps = spark.range(factor).select(col("id").cast("int").as("rep"))
    def reped(t: DataFrame): DataFrame = t.crossJoin(broadcast(reps))
    def copy(name: String): Unit =
      spark.read.parquet(s"$src/$name.parquet")
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    def write(df: DataFrame, name: String, partCol: String): Unit =
      df.repartition(col(partCol))
        .write.mode("overwrite").parquet(s"$out/$name.parquet")

    Seq("region", "nation", "customer", "supplier").foreach(copy)

    val off = col("rep") * KeySpan
    if (growParts)
      write(reped(spark.read.parquet(s"$src/part.parquet"))
        .withColumn("p_partkey", col("p_partkey") + off)
        .drop("rep"), "part", "p_partkey")
    else copy("part")

    write(reped(spark.read.parquet(s"$src/orders.parquet"))
      .withColumn("o_orderkey", col("o_orderkey") + off)
      .drop("rep"), "orders", "o_orderkey")

    write(reped(spark.read.parquet(s"$src/lineitem.parquet"))
      .withColumn("l_orderkey", col("l_orderkey") + off)
      .withColumn("l_partkey",
        if (growParts) col("l_partkey") + off else col("l_partkey"))
      .drop("rep"), "lineitem", "l_orderkey")

    write(reped(spark.read.parquet(s"$src/events.parquet"))
      .withColumn("event_id", col("event_id") + off)
      .withColumn("user_id", col("user_id") + off)
      .drop("rep"), "events", "user_id")

    write(reped(spark.read.parquet(s"$src/documents.parquet"))
      .withColumn("doc_id", col("doc_id") + off)
      // rep 0 keeps the source text byte-for-byte; later reps suffix
      // every token, so shingle vocabularies are replica-disjoint
      .withColumn("text",
        when(col("rep") === 0, col("text"))
          .otherwise(array_join(
            transform(split(col("text"), " "),
              t => concat(t, lit("_"), col("rep"))), " ")))
      .drop("rep"), "documents", "doc_id")

    write(reped(spark.read.parquet(s"$src/embeddings.parquet"))
      .withColumn("vec_id", col("vec_id") + off)
      .withColumn("label",
        (col("label") + col("rep") * lit(1000000)).cast("int"))
      // deterministic per-(vector, component) noise, zero on rep 0:
      // breaks exact top-k ties between a vector and its replicas
      .withColumn("embedding",
        when(col("rep") === 0, col("embedding"))
          .otherwise(transform(col("embedding"),
            (x, i) => (x.cast("double") +
              ((col("vec_id") * 31 + i * 7) % 1000 - 500) * lit(1e-5))
              .cast("float"))))
      .drop("rep"), "embeddings", "vec_id")

    println(s"[scaleup] wrote ${factor}x corpus from $src to $out" +
      (if (growParts) " (grow-parts: replicated part dim, offset l_partkey)" else ""))
    spark.stop()
  }
}
