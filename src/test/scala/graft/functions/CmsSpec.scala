package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

import graft.SparkSpec

class CmsSpec extends SparkSpec {
  import sqlImplicits._

  private def est(c: Column,
      bc: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.CountMinSketch]) =
    Bridge.column(CmsEstimateLong(Bridge.expression(c), bc))

  test("estimates never undercount and respect the epsilon bound on known frequencies") {
    // key k repeated k times, k = 1..100: N = 5050, exact counts known
    val rows = (1L to 100L).flatMap(k => Seq.fill(k.toInt)(k))
    val df = rows.toDF("h")
    val cms = df.stat.countMinSketch("h", eps = 0.001, confidence = 0.99, seed = 42)
    assert(cms.totalCount() == 5050L)
    val bc = spark.sparkContext.broadcast(cms)
    val got = (1L to 100L).toDF("h")
      .select(col("h"), est(col("h"), bc).as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val slack = (0.001 * 5050).toLong + 1
    got.foreach { case (k, e) =>
      assert(e >= k, s"undercount at $k: $e")
      assert(e <= k + slack, s"over bound at $k: $e")
    }
  }

  test("sketch is deterministic across builds (commutative merges)") {
    val df = (1L to 5000L).map(_ % 37L).toDF("h")
    val a = df.stat.countMinSketch("h", 0.001, 0.99, 42)
    val b = df.repartition(13).stat.countMinSketch("h", 0.001, 0.99, 42)
    val bcA = spark.sparkContext.broadcast(a)
    val bcB = spark.sparkContext.broadcast(b)
    val probes = (0L until 37L).toDF("h")
    val diff = probes.select(est(col("h"), bcA).as("ea"), est(col("h"), bcB).as("eb"))
      .filter(col("ea") =!= col("eb")).count()
    assert(diff == 0, "partitioning changed the estimates")
  }

  test("null input yields null") {
    val cms = Seq(1L).toDF("h").stat.countMinSketch("h", 0.01, 0.9, 1)
    val bc = spark.sparkContext.broadcast(cms)
    assert(Seq[java.lang.Long](null).toDF("h")
      .select(est(col("h"), bc)).head().isNullAt(0))
  }

  test("text_top_tokens_cms gate: pins TRUE and the token head matches the exact query") {
    val got = graft.queries.Ext.all("text_top_tokens_cms")(spark, sf0001)
      .select(col("token"), col("n"), col("est_ge_ok"), col("est_within_ok"))
      .as[(String, Long, Boolean, Boolean)].collect()
    assert(got.length == 20)
    assert(got.forall(r => r._3 && r._4), got.mkString(","))
    val exact = graft.queries.Ext.all("text_top_tokens")(spark, sf0001)
      .select(col("token"), col("n")).as[(String, Long)].collect()
    assert(got.map(r => (r._1, r._2)).toSeq == exact.toSeq)
  }
}
