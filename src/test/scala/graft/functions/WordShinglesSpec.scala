package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class WordShinglesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** The interpreted HOF formulation the native expression replaced —
    * kept here as the parity reference. */
  private def hofShingles(toks: org.apache.spark.sql.Column, k: Int) = {
    val n = size(toks)
    when(n >= k,
      array_distinct(transform(sequence(lit(1), n - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k))))))
      .otherwise(array().cast("array<string>"))
  }

  test("identical to the HOF formulation, including order, on random corpora") {
    val rnd = new scala.util.Random(5)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "ff")
    val rows = (1 to 300).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))))
    }
    val df = rows.toDF("id", "toks")
    for (k <- Seq(2, 3, 4)) {
      val got = df.select(col("id"),
          graft.ext.Dedup.wordShingles(col("toks"), k).as("nat"),
          hofShingles(col("toks"), k).as("hof"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"id=${r.getLong(0)} k=$k")
      }
    }
  }

  test("null tokens: last-null windows dropped, inner nulls skipped (windowed semantics)") {
    // pins the documented null-token contract (wordShingles scaladoc):
    // the native expression follows the relational windowed build, NOT
    // the old HOF (which kept last-null windows as shortened shingles)
    val df = Seq((1L, Seq(Some("a"), Some("b"), None, Some("c"))))
      .toDF("id", "toks")
    val out = df.select(graft.ext.Dedup.wordShingles(col("toks"), 2))
      .head.getSeq[String](0)
    // windows: (a,b)->"a b"; (b,null)->dropped; (null,c)->"c"
    assert(out == Seq("a b", "c"), s"got $out")
  }

  test("short docs yield empty; repeats dedup to first occurrence") {
    val df = Seq(
      (1L, Seq("a", "b")),
      (2L, Seq("x", "y", "x", "y", "x"))
    ).toDF("id", "toks")
    val out = df.select(col("id"), graft.ext.Dedup.wordShingles(col("toks"), 3))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L).isEmpty)
    assert(out(2L) == Seq("x y x", "y x y"))
  }

  test("shingleRows: distinct (id, s) by construction, equal to windowed build") {
    val df = Seq(
      (1L, Seq("a", "b", "a", "b", "a")),
      (2L, Seq("a", "b", "c", "d")),
      (3L, Seq.empty[String])
    ).toDF("id", "toks")
    val rows = graft.ext.Dedup.shingleRows(df, 2)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.length == rows.distinct.length)
    assert(rows.toSet == Set(
      (1L, "a b"), (1L, "b a"),
      (2L, "a b"), (2L, "b c"), (2L, "c d")))
  }
}
