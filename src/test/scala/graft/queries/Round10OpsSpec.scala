package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.QualityModel

/** Value gates for the round-10 operator family. */
class Round10OpsSpec extends SparkSpec {
  import sqlImplicits._

  private val sf = "/root/testdata/sf0.001"

  test("QualityModel: weight table is the pinned frozen model") {
    // any drift of the LCG walk silently changes the model — pin shape
    // and a few spot values so a "refactor" can't retrain it
    assert(QualityModel.weights.length == QualityModel.B)
    assert(QualityModel.weights.forall(w => w >= -20 && w <= 20))
    // distributionally sane: not all one value
    assert(QualityModel.weights.distinct.length > 20)
  }

  test("text_quality_model: engine score equals the plain-JVM recompute") {
    val got = Ext.all("text_quality_model")(spark, sf)
      .select(col("doc_id"), col("score"), col("model_keep"))
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got.nonEmpty)
    val texts = graft.core.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    for ((id, score, keep) <- got) {
      val toks = texts(id).split(" ").filter(_.nonEmpty).toSeq
      val exp = QualityModel.scoreTokens(toks)
      assert(score == exp, s"doc $id: engine $score vs recompute $exp")
      assert(keep == (exp > QualityModel.Threshold))
    }
  }

  test("dedup_semantic_cells: every emitted row is a truth pair, ordered, with a uniform pin") {
    val rows = Ext.all("dedup_semantic_cells")(spark, sf)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(rows.nonEmpty)
    // pairs are ordered (id1 < id2), distinct, and the pin is one global
    // boolean (the recall scalar broadcast onto every row)
    assert(rows.forall { case (a, b, _) => a < b })
    assert(rows.map(r => (r._1, r._2)).distinct.size == rows.size)
    assert(rows.map(_._3).distinct.size == 1)
    assert(rows.head._3, "cell-blocked recall fell below the pinned floor")
  }

  test("curation report: model stage only ever shrinks the quality stage") {
    val rows = Ext.all("pipeline_curation_report")(spark, sf)
      .select(col("source"), col("n_quality"), col("n_model"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    for ((src, q, m) <- rows)
      assert(m <= q, s"source $src: model stage grew the funnel ($m > $q)")
  }
}
