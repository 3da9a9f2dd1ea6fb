package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

import graft.SparkSpec

class BloomSpec extends SparkSpec {
  import sqlImplicits._

  private def might(c: Column,
      bc: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter]) =
    Bridge.column(BloomMightContainLong(Bridge.expression(c), bc))

  test("stat.bloomFilter put and expression probe agree: zero false negatives") {
    // the build side inserts raw longs (putLong); the probe must use the
    // SAME key — this pins the dispatch consistency the decontamination
    // query depends on (both sides key on xxhash64 of the string)
    val keys = (1L to 2000L).map(_ * 7919L)
    val df = keys.toDF("h")
    val bf = df.stat.bloomFilter("h", keys.length.toLong, 1e-4)
    val bc = spark.sparkContext.broadcast(bf)
    val misses = df.filter(!might(col("h"), bc)).count()
    assert(misses == 0)
  }

  test("false-positive rate on unseen keys stays near the configured fpp") {
    val keys = (1L to 2000L).map(_ * 7919L)
    val bf = keys.toDF("h").stat.bloomFilter("h", keys.length.toLong, 1e-4)
    val bc = spark.sparkContext.broadcast(bf)
    // disjoint probe set (odd offsets can't be multiples of 7919)
    val probes = (1L to 10000L).map(_ * 7919L + 1L).toDF("h")
    val fps = probes.filter(might(col("h"), bc)).count()
    assert(fps <= 20, s"fp=$fps of 10000 at fpp=1e-4") // 1e-4 ⇒ E[fp]=1
  }

  test("null input yields null, not a probe") {
    val bf = Seq(1L).toDF("h").stat.bloomFilter("h", 1L, 0.01)
    val bc = spark.sparkContext.broadcast(bf)
    val r = Seq[java.lang.Long](null).toDF("h")
      .select(might(col("h"), bc)).head()
    assert(r.isNullAt(0))
  }

  test("text_decontaminate_bloom gate: pinned booleans TRUE, exact_hit matches exact path") {
    val rows = graft.queries.Ext.all("text_decontaminate_bloom")(spark, sf0001)
      .select(col("doc_id"), col("exact_hit"), col("superset_ok"), col("fp_ok"))
      .as[(Long, Boolean, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._3 && r._4), "superset_ok/fp_ok must pin TRUE")
    // exact_hit recomputed independently: the audit's exact flags must be
    // the contamination query's doc set
    val contaminated = graft.queries.Ext.all("text_contamination")(spark, sf0001)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(rows.filter(_._2).map(_._1).toSet == contaminated)
    assert(contaminated.nonEmpty) // the corpus must exercise the hit path
  }
}
