package graft.functions

import graft.SparkSpec
import graft.functions.TopKAggregator.{Entry, TopK}

class TopKAggregatorSpec extends SparkSpec {
  import sqlImplicits._

  test("bounded top-k: correct order, cap, and tie-breaks") {
    val data = Seq(
      ("a", Entry(5.0, 1, 1)), ("a", Entry(9.0, 2, 1)), ("a", Entry(7.0, 3, 1)),
      ("a", Entry(9.0, 1, 9)), // tie on score → lower tie1 first
      ("b", Entry(1.0, 4, 1))).toDS()
    val out = data.groupByKey(_._1).mapValues(_._2)
      .agg(new TopK(3).toColumn.name("top"))
      .collect().toMap
    assert(out("a") == Seq(Entry(9.0, 1, 9), Entry(9.0, 2, 1), Entry(7.0, 3, 1)))
    assert(out("b") == Seq(Entry(1.0, 4, 1)))
  }

  test("merge keeps only k across partial buffers") {
    val agg = new TopK(2)
    val merged = agg.merge(
      Seq(Entry(9.0, 1, 1), Entry(5.0, 2, 2)),
      Seq(Entry(8.0, 3, 3), Entry(7.0, 4, 4)))
    assert(merged == Seq(Entry(9.0, 1, 1), Entry(8.0, 3, 3)))
  }

  test("reduce below-threshold element is a no-op on a full buffer") {
    val agg = new TopK(2)
    val buf = Seq(Entry(9.0, 1, 1), Entry(8.0, 2, 2))
    assert(agg.reduce(buf, Entry(1.0, 9, 9)) == buf)
    assert(agg.reduce(buf, Entry(8.5, 9, 9)) ==
      Seq(Entry(9.0, 1, 1), Entry(8.5, 9, 9)))
  }
}
