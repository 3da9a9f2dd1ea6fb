package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.Geo

class GraftExtensionsSpec extends AnyFunSuite {

  /** A separate session over the shared SparkContext, with extensions. */
  private lazy val extSpark: SparkSession = {
    SparkTestSession.spark // ensure the context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    SparkSession.setDefaultSession(SparkTestSession.spark)
    SparkSession.setActiveSession(SparkTestSession.spark)
    s
  }

  private def pairs = {
    import extSpark.implicits._
    Seq((22.50, 114.00, 22.60, 114.10), (0.0, 0.0, 0.0, 1.0))
      .toDF("lat1", "lng1", "lat2", "lng2")
  }

  test("haversine_native SQL function matches scalar and Column forms") {
    val rows = pairs
      .withColumn("native", expr("haversine_native(lat1, lng1, lat2, lng2)"))
      .withColumn("column", Geo.haversineMeters(
        col("lat1"), col("lng1"), col("lat2"), col("lng2")))
      .collect()
    rows.foreach { r =>
      val scalar = Geo.haversineM(
        r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(r.getDouble(4) == scalar, "native == scalar")
      assert(math.abs(r.getDouble(5) - scalar) < 1e-6, "column ≈ scalar")
    }
  }

  test("optimizer rule promotes the haversine_m UDF to the native expression") {
    Geo.register(extSpark)
    // parquet-backed source: a local Seq would be constant-folded into a
    // LocalRelation before the promoted expression is observable
    val df = extSpark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(
        (col("c_custkey") % 120 * 0.5 - 30).as("lat1"),
        (col("c_custkey") % 300 * 0.6 - 90).as("lng1"),
        lit(22.5).as("lat2"), lit(114.0).as("lng2"))
      .withColumn("d", expr("haversine_m(lat1, lng1, lat2, lng2)"))
    val optimized = df.queryExecution.optimizedPlan
    val promoted = optimized.expressions.exists(_.exists {
      case _: graft.functions.Haversine => true
      case _ => false
    })
    assert(promoted, s"expected Haversine in:\n$optimized")
    // and the rewritten plan still computes the right values
    val rows = df.select(col("lat1"), col("lng1"), col("d")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) ==
        Geo.haversineM(r.getDouble(0), r.getDouble(1), 22.5, 114.0))
    }
  }

  test("null inputs yield null, not an exception") {
    import extSpark.implicits._
    val r = Seq((Some(1.0), None: Option[Double]))
      .toDF("a", "b")
      .selectExpr("haversine_native(a, b, a, b) AS d")
      .collect()
    assert(r(0).isNullAt(0))
  }

  test("seq_dot is SQL-callable via the extension") {
    import extSpark.implicits._
    val r = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f)))
      .toDF("a", "b")
      .selectExpr("seq_dot(a, b) AS d")
      .head()
    assert(r.getDouble(0) == 11.0)
  }

  test("seq_dot_long and word_shingles are SQL-callable via the extension") {
    import extSpark.implicits._
    val r = Seq((Array(2, 3), Array(10, -1)))
      .toDF("a", "b")
      .selectExpr("seq_dot_long(a, b) AS d")
      .head()
    assert(r.getLong(0) == 17L)
    val l2 = Seq((Array(1L, 2L), Array(4L, 6L)))
      .toDF("a", "b")
      .selectExpr("seq_l2_long(a, b) AS d")
      .head()
    assert(l2.getLong(0) == 25L)
    val sh = Seq(Tuple1(Seq("x", "y", "x", "y")))
      .toDF("toks")
      .selectExpr("word_shingles(toks, 2) AS s")
      .head().getSeq[String](0)
    assert(sh == Seq("x y", "y x"))
    // non-literal k is rejected with a clear message
    val err = intercept[Exception] {
      Seq(Tuple1(Seq("x"))).toDF("toks")
        .selectExpr("word_shingles(toks, length('ab'))").head()
    }
    assert(err.getMessage.contains("literal"), err.getMessage)
  }
}
