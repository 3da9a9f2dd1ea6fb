package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SeqDotSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("bit-identical to the interpreted HOF fold on float arrays") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
        graft.ext.Similarity.dot(col("a"), col("b")).as("nat"),
        hofDot(col("a"), col("b")).as("hof"))
      .collect()
    got.foreach { r =>
      // exact bit equality, not tolerance — the oracle hash demands it
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"row ${r.getLong(0)}")
    }
  }

  test("null on length mismatch, null element, or null array") {
    val df = Seq(
      (1L, Some(Array(1.0f, 2.0f)), Some(Array(3.0f))),
      (2L, Some(Array(1.0f)), None)
    ).toDF("id", "a", "b")
    val out = df.select(graft.ext.Similarity.dot(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("double arrays supported") {
    val df = Seq((Array(1.5, 2.0), Array(2.0, -1.0))).toDF("a", "b")
    val v = df.select(graft.ext.Similarity.dot(col("a"), col("b"))).head.getDouble(0)
    assert(v == 1.0)
  }
}
