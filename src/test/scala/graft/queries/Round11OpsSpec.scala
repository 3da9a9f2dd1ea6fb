package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Value gates for the round-11 operators that the sf0.01 DuckDB gate
  * alone can't cover at a second scale: the trained-table BPE apply
  * (its literal oracle is pinned to the gate corpus, so the second SF
  * is twin territory, exactly like text_bpe_train itself).
  */
class Round11OpsSpec extends SparkSpec {
  import sqlImplicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  test("text_bpe_apply_trained matches an independent train+encode at sf0.001") {
    // independent lifecycle: BpeRef trains the ladder (vector-walk
    // trainer) and BpeRef.encode applies it (vector-walk encoder) —
    // neither shares mechanics with the engine's delimiter-wrapped
    // string replace
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().toSeq
    val units = BpeRef.unitsFromTexts(texts.map(_._2),
      Ext.BpeChunkTokens, Ext.BpeSampleCap)
    val ladder = BpeRef.refBpe(units,
      Ext.BpeTargetMerges, Ext.BpeBatchK, Ext.BpeCandPool)
      .map { case (_, a, b, _) => (a, b) }
    val expected = texts.map { case (id, text) =>
      val chunks = text.split(" ").filter(_.nonEmpty)
        .grouped(Ext.BpeChunkTokens).map(_.mkString("▁")).toArray
      val subw = chunks.map(u => BpeRef.encode(u, ladder).mkString(" "))
      (id, chunks.length.toLong,
        subw.iterator.map(w => w.count(_ == ' ') + 1L).sum,
        md5hex(subw.mkString(" / ")))
    }.sortBy(_._1)
    val got = Ext.textBpeApplyTrained(spark, sf0001)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got.size == expected.size)
    val firstDiff = got.zip(expected).indexWhere(p => p._1 != p._2)
    assert(got == expected,
      s"trained-apply diverges at index $firstDiff: " +
        s"got=${got.lift(firstDiff)} expected=${expected.lift(firstDiff)}")
  }

  test("trained-apply conservation: merges only ever reduce the subword count") {
    // n_subwords per doc is bounded above by the doc's character count
    // per unit and below by the unit count; total subwords across the
    // corpus must be positive whenever any doc has tokens
    val r = Ext.textBpeApplyTrained(spark, sf0001)
      .agg(sum(col("n_subwords")).cast("long"),
        sum(col("n_units")).cast("long"))
      .as[(Long, Long)].head()
    assert(r._1 >= r._2, "fewer subwords than units is impossible")
    assert(r._1 > 0)
  }
}
