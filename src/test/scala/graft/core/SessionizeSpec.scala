package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import sqlImplicits._

  private def mk(rows: Seq[(String, Long)]) =
    rows.toDF("id", "t_us")

  test("gap splits sessions; first row starts session 1") {
    val df = mk(Seq(("a", 0L), ("a", 10L), ("a", 100L), ("a", 105L), ("b", 0L)))
    val out = Sessionize.withSessionId(df, Seq("id"), col("t_us"), gapMicros = 50)
      .orderBy($"id", $"t_us")
      .select($"id", $"t_us", $"session_id").as[(String, Long, Long)].collect()
    assert(out.toSeq == Seq(
      ("a", 0L, 1L), ("a", 10L, 1L), ("a", 100L, 2L), ("a", 105L, 2L),
      ("b", 0L, 1L)))
  }

  test("gap exactly equal to threshold does NOT split") {
    val df = mk(Seq(("a", 0L), ("a", 50L)))
    val out = Sessionize.withSessionId(df, Seq("id"), col("t_us"), gapMicros = 50)
      .select($"session_id").as[Long].collect()
    assert(out.toSet == Set(1L))
  }

  test("extraBreak forces a split") {
    val df = mk(Seq(("a", 0L), ("a", 1L), ("a", 2L)))
      .withColumn("force", $"t_us" === 2L)
    val out = Sessionize.withSessionId(df, Seq("id"), col("t_us"),
        gapMicros = 1000, extraBreak = col("force"))
      .orderBy($"t_us").select($"session_id").as[Long].collect()
    assert(out.toSeq == Seq(1L, 1L, 2L))
  }

  test("change points: rising edges numbered, runs share an id") {
    val df = Seq(("a", 1L, 0), ("a", 2L, 1), ("a", 3L, 1), ("a", 4L, 0),
      ("a", 5L, 1)).toDF("id", "t", "flag")
    val out = Sessionize.withChangePointId(df, Seq("id"), Seq(col("t")),
        col("flag"), "seg")
      .orderBy($"t").select($"seg").as[Long].collect()
    assert(out.toSeq == Seq(0L, 1L, 1L, 1L, 2L))
  }

  test("forward and backward fill") {
    val df = Seq(("a", 1L, Some(10.0)), ("a", 2L, None), ("a", 3L, None),
      ("a", 4L, Some(40.0)), ("a", 5L, None)).toDF("id", "t", "v")
    val out = Sessionize.backwardFill(
        Sessionize.forwardFill(df, Seq("id"), Seq(col("t")), col("v"), "ff"),
        Seq("id"), Seq(col("t")), col("v"), "bf")
      .orderBy($"t").select($"ff", $"bf").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1))))
    assert(out.toSeq == Seq(
      (Some(10.0), Some(10.0)), (Some(10.0), Some(40.0)), (Some(10.0), Some(40.0)),
      (Some(40.0), Some(40.0)), (Some(40.0), None)))
  }
}
