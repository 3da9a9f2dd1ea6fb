package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Ext

/** `text_lm_bigram` — invariants the DuckDB hash gate can't express as
  * clearly: probability-range bounds, bigram-count bookkeeping, and a
  * hand-computed model on a known miniature corpus. */
class LmScoreSpec extends SparkSpec {
  import sqlImplicits._

  test("scores are probabilities; n_bigrams books against token counts") {
    val out = Ext.all("text_lm_bigram")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.nonEmpty)
    out.foreach { case (id, n, p) =>
      assert(n >= 1, s"doc $id")
      assert(p > 0.0 && p < 1.0, s"doc $id: mean_bigram_p=$p")
    }
    // every scored doc has exactly (tokens - 1) bigrams, and every doc
    // with >= 2 tokens is scored
    val want = spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("n", size(Text.tokens(col("text"))))
      .filter($"n" >= 2)
      .select($"doc_id", ($"n" - 1).cast("long").as("nb"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.map(_._1).toSet == want.keySet)
    out.foreach { case (id, n, _) => assert(n == want(id), s"doc $id") }
  }

  test("hand-computed model on a miniature corpus") {
    // corpus: "a b a b" and "a b"; bigrams: (a,b)x3, (b,a)x1
    // c1(a)=3, c1(b)=1; c12(a,b)=3, c12(b,a)=1; V=2
    // doc1 ps = [(3+1)/(3+2), (1+1)/(1+2), (3+1)/(3+2)] = [0.8, 2/3, 0.8]
    //   mean = (2/3 + 0.8 + 0.8) / 3   (sorted fold order)
    // doc2 ps = [0.8] → mean 0.8
    val dir = java.nio.file.Files.createTempDirectory("lmspec").toString
    Seq((1L, "a b a b", "en", "s", 7L), (2L, "a b", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Ext.all("text_lm_bigram")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    val d1 = ((2.0 / 3.0) + 0.8 + 0.8) / 3
    assert(out == List((1L, 3L, d1), (2L, 1L, 0.8)), s"got $out")
  }
}
