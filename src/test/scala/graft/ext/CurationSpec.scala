package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Ext

/** `text_quality_filter` and `mix_quality_budget` — invariants beyond
  * the DuckDB hash gate: decisions recomputed independently, prefix
  * structure of the budget selection, and budget accounting. */
class CurationSpec extends SparkSpec {

  test("text_quality_filter decisions match an independent recomputation") {
    val got = Ext.all("text_quality_filter")(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5))).toMap
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n"),
        size(array_distinct(col("toks"))).cast("long").as("u"),
        Text.hitCount(col("toks"), Text.stopwords("en")).cast("long").as("st"),
        aggregate(col("toks"), lit(0L), (a, x) => a + length(x)).as("sl"))
      .collect()
    assert(docs.nonEmpty && docs.length == got.size)
    docs.foreach { r =>
      val (id, n, u, st, sl) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val rules = (n >= 5 && n <= 512, st * 20 >= n, u * 2 > n, sl <= n * 12)
      val keep = rules._1 && rules._2 && rules._3 && rules._4
      assert(got(id) == (rules._1, rules._2, rules._3, rules._4, keep),
        s"doc $id")
    }
  }

  test("mix_quality_budget selects exactly the best-first prefix that fits") {
    val got = Ext.all("mix_quality_budget")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toList
    assert(got.nonEmpty)
    // independent single-stream recomputation at test scale
    val st = spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        Text.qualityScore(col("toks")).as("q"))
    val budget = st.agg(sum(col("n_tokens"))).head().getLong(0) * 2 / 5
    val w = Window.orderBy(col("q").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = st
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("cum_before") + col("n_tokens") <= budget)
      .select(col("doc_id"), col("n_tokens"), col("cum_before"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(got == want)
    // budget accounting: total kept tokens fits, and the selection is a
    // strict subset (the 40% budget can never hold the whole corpus)
    assert(got.map(_._2).sum <= budget)
    assert(got.size < st.count())
  }

  test("mix_temperature flattens the mixture: α=0.5 targets, conservation, flattening direction") {
    val rows = Ext.all("mix_temperature")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // independent threshold recomputation from the per-source totals
    val tokens = rows.map(r => r._1 -> r._3).sortBy(_._1)
    val total = tokens.map(_._2).sum
    val budget = total / 2
    val sumSqrt = tokens.foldLeft(0.0)((a, t) => a + math.sqrt(t._2.toDouble))
    rows.foreach { case (src, _, tok, threshold, nKept, keptTok) =>
      val want = math.floor(math.min(1.0,
        math.sqrt(tok.toDouble) * budget.toDouble /
          (sumSqrt * tok.toDouble)) * 1000000).toLong
      assert(threshold == want, s"source $src")
      assert(nKept >= 0 && keptTok <= tok)
    }
    // flattening: the sampled share of every source sits BETWEEN its
    // natural share and the uniform share (the point of temperature
    // sampling) — checked on target rates, monotone in tokens
    val rates = rows.map(r => r._3 -> r._4).sortBy(_._1)
    assert(rates.sliding(2).forall(p => p.head._2 >= p.last._2),
      "keep rate must fall as source size grows (flattening direction)")
  }
}
