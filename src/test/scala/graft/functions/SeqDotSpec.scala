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

  test("integral arrays accepted (the HOF contract): widened to double, bit-identical") {
    // regression for the round-2 narrowing: dot() used to fail analysis on
    // array<int>, which the aggregate(zip_with) form it replaced accepted
    val rnd = new scala.util.Random(11)
    val rows = (1 to 100).map { i =>
      (i.toLong, Array.fill(32)(rnd.nextInt(2001) - 1000),
        Array.fill(32)(rnd.nextLong() % 100000))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
        graft.ext.Similarity.dot(col("a"), col("b")).as("nat"),
        hofDot(col("a"), col("b")).as("hof"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"row ${r.getLong(0)}")
    }
    // mixed int × float also analyzes and matches
    val mixed = Seq((Array(1, 2, 3), Array(0.5f, -1.5f, 2.0f))).toDF("a", "b")
    val v = mixed.select(graft.ext.Similarity.dot(col("a"), col("b")),
      hofDot(col("a"), col("b"))).head
    assert(java.lang.Double.doubleToLongBits(v.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(v.getDouble(1)))
  }

  test("seq_dot_long: exact integer fold, equals the integer HOF") {
    val hofIntDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => (x * y).cast("long")),
        lit(0L), (acc, x) => acc + x)
    val rnd = new scala.util.Random(13)
    val rows = (1 to 100).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextInt(255) - 127),
        Array.fill(64)(rnd.nextInt(255) - 127))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
        graft.ext.Similarity.intDot(col("a"), col("b")).as("nat"),
        hofIntDot(col("a"), col("b")).as("hof"))
      .collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(2), s"row ${r.getLong(0)}"))
  }

  test("seq_dot_long: null propagation and length mismatch") {
    val df = Seq(
      (1L, Some(Array(1, 2)), Some(Array(3))),
      (2L, Some(Array(1)), None)
    ).toDF("id", "a", "b")
    val out = df.select(graft.ext.Similarity.intDot(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("seq_l2_long: exact integer squared L2, equals the integer HOF") {
    val hofL2 = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b,
          (x, y) => ((x - y) * (x - y)).cast("long")),
        lit(0L), (acc, x) => acc + x)
    val rnd = new scala.util.Random(17)
    val rows = (1 to 100).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextInt(401).toLong - 200),
        Array.fill(64)(rnd.nextInt(401).toLong - 200))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
        graft.ext.Similarity.intL2(col("a"), col("b")).as("nat"),
        hofL2(col("a"), col("b")).as("hof"))
      .collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(2), s"row ${r.getLong(0)}"))
    // identity and symmetry
    val d = df.select(graft.ext.Similarity.intL2(col("a"), col("a"))).collect()
    assert(d.forall(_.getLong(0) == 0L))
  }

  test("seq_l2_long: null propagation and length mismatch") {
    val df = Seq(
      (1L, Some(Array(1L, 2L)), Some(Array(3L))),
      (2L, Some(Array(1L)), None)
    ).toDF("id", "a", "b")
    val out = df.select(graft.ext.Similarity.intL2(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }
}
