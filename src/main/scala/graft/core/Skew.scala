package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting — the partitioning tool AQE cannot supply
  * when the skew is inside a single aggregation/join key.
  *
  * Aggregation: one hot key funnels to one reducer. Salting splits each
  * key into `salts` subkeys, aggregates partially per subkey (parallel),
  * then merges — correct for any algebraic aggregate (sum/count/min/max).
  *
  * Join: a hot fact key lands on one task in a shuffle join. Replicating
  * each build-side row to all `salts` subkeys and giving every probe row
  * one deterministic subkey keeps the match exact while spreading the hot
  * key over `salts` tasks.
  */
object Skew {

  /** Deterministic row salt in [0, salts): hashes the given columns
    * (pick high-cardinality ones — a row id, or all value columns). */
  def saltOf(salts: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(salts.toLong)).cast("int")

  /** Salted count+sum per key — identical results to the direct
    * `groupBy(keys).agg(count, sum)`, shuffle spread over `salts` subkeys
    * per key before the (tiny) merge shuffle. */
  def saltedCountSum(
      df: DataFrame,
      keys: Seq[Column],
      value: Column,
      salt: Column): DataFrame =
    df.withColumn("_salt", salt)
      .groupBy(keys :+ col("_salt"): _*)
      .agg(count(lit(1)).as("_n"), sum(value).as("_s"))
      .groupBy(keys: _*)
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("s"))

  /** Salted equi-join of a skewed probe side against a build side: build
    * rows are replicated `salts`× (explode), each probe row carries one
    * salt — every probe row meets each matching build row exactly once.
    *
    * Only probe-preserving join types are allowed: under right/full outer
    * an unmatched build row exists `salts` times and would emit `salts`
    * duplicate null-extended rows — salt the other side instead. */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      salts: Int,
      probeSalt: Column,
      joinType: String = "inner"): DataFrame = {
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti")
      .contains(normalized),
      s"saltedJoin supports probe-preserving join types only, got '$joinType' " +
        "(right/full outer would duplicate unmatched build rows salts times)")
    val salted = build
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("_salt", col("_salt").cast("int"))
    probe.withColumn("_salt", probeSalt)
      .join(salted, keys :+ "_salt", joinType)
      .drop("_salt")
  }
}
